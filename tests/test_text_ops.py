"""Unit + plan tests for the round-3 text/corpus operators: repetition
signals, the char-unigram LM scorer, and the domain-mixture planner.

Value-level parity with DuckDB is covered by tests/test_queries_oracle.py;
these pin edge-case semantics (single-token docs, OOV chars, pinned
sampling rates) and the physical-plan properties the oracles can't see.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators import corpus_prep as P
from cig_etl_s3_to_sql_data_ingestor_spark.operators import text as TX

from .test_plans import explain


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# -- repetition signals -----------------------------------------------------


def test_repetition_all_same_tokens(spark):
    d = _docs(spark, [(1, "s", "a a a a")])
    r = TX.repetition_stats(d).collect()[0]
    assert r.n_tokens == 4
    assert r.dup_token_frac == 0.75  # 4 tokens, 1 distinct
    assert r.top_token_frac == 1.0
    assert r.dup_bigram_frac == 2 / 3  # 3 bigrams "a a", 1 distinct
    assert r.top_bigram_frac == 1.0


def test_repetition_all_distinct_tokens(spark):
    d = _docs(spark, [(1, "s", "a b c d")])
    r = TX.repetition_stats(d).collect()[0]
    assert r.dup_token_frac == 0.0
    assert r.top_token_frac == 0.25
    assert r.dup_bigram_frac == 0.0


def test_repetition_single_token_has_null_bigram_fracs(spark):
    d = _docs(spark, [(1, "s", "solo")])
    r = TX.repetition_stats(d).collect()[0]
    assert r.n_tokens == 1
    assert r.dup_token_frac == 0.0
    assert r.dup_bigram_frac is None and r.top_bigram_frac is None


# -- char-unigram LM --------------------------------------------------------


def test_char_lm_model_quantized_logprobs(spark):
    d = _docs(spark, [(1, "s", "aab")])
    m = {r.ch: r for r in TX.char_lm_model(d).collect()}
    assert m["a"].n_occ == 2 and m["b"].n_occ == 1
    assert m["a"].qlogp == math.floor(math.log(2 / 3) * TX.LM_QUANT)
    assert m["b"].qlogp == math.floor(math.log(1 / 3) * TX.LM_QUANT)


def test_char_lm_score_exact_integer_sum(spark):
    d = _docs(spark, [(1, "s", "aab")])
    model = TX.char_lm_model(d)
    r = TX.char_lm_score(d, model).collect()[0]
    qa = math.floor(math.log(2 / 3) * TX.LM_QUANT)
    qb = math.floor(math.log(1 / 3) * TX.LM_QUANT)
    assert r.n_chars_scored == 3
    assert r.surprisal_q == -(2 * qa + qb)
    assert r.mean_surprisal == r.surprisal_q / 3


def test_char_lm_oov_chars_cost_one_extra_nat(spark):
    train = _docs(spark, [(1, "s", "aab")])
    model = TX.char_lm_model(train)
    score = _docs(spark, [(2, "s", "zz")])
    r = TX.char_lm_score(score, model).collect()[0]
    oov = math.floor(math.log(1 / 3) * TX.LM_QUANT) - TX.LM_QUANT
    assert r.surprisal_q == -2 * oov


def test_char_lm_scoring_shuffles_counts_not_text(spark, sf_dir):
    import re

    plan = explain(spark, sf_dir, "char_lm_surprisal")
    # The model joins broadcast (it is |alphabet| rows) — never sort-merge.
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # Per-(doc, char) counts must partial-aggregate BEFORE their exchange,
    # so the shuffle carries at most |alphabet| rows per document.
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4, plan


# -- mixture planning -------------------------------------------------------


def test_mixture_plan_rates_and_expected_tokens(spark):
    d = _docs(
        spark,
        [(i, "big", "t " * 10) for i in range(8)]  # 80 tokens
        + [(100 + i, "small", "t " * 10) for i in range(2)],  # 20 tokens
    )
    rows = {
        r.source: r
        for r in P.mixture_plan(
            d, {"big": 1.0, "small": 1.0}, token_budget=40
        ).collect()
    }
    big, small = rows["big"], rows["small"]
    assert big.n_tokens == 80 and small.n_tokens == 20
    assert big.current_share == 0.8 and small.current_share == 0.2
    assert big.target_share == small.target_share == 0.5
    # big: 0.5*40/80 = 0.25 of its tokens; small wants 20 but only has 20.
    assert big.sampling_rate == 0.25 and big.expected_tokens == 20
    assert small.sampling_rate == 1.0 and small.expected_tokens == 20


def test_mixture_plan_drops_unweighted_sources(spark):
    d = _docs(spark, [(1, "a", "x y"), (2, "b", "x y")])
    out = P.mixture_plan(d, {"a": 1.0}, token_budget=10)
    assert [r.source for r in out.collect()] == ["a"]


# -- property tests vs bit-exact Python models ------------------------------


import math as _math  # noqa: E402

import pytest  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["a", "b", "ab", "ba", "x1", "zz"])
_doc_texts = st.lists(_token, min_size=1, max_size=12).map(" ".join)
_corpora = st.lists(_doc_texts, min_size=1, max_size=8)


def _py_repetition(text):
    toks = text.lower().strip().split()
    n = len(toks)
    bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    nb = len(bg)

    def top(xs):
        return max(xs.count(u) for u in set(xs)) if xs else None

    return {
        "n_tokens": n,
        "dup_token_frac": (n - len(set(toks))) / n,
        "top_token_frac": top(toks) / n,
        "dup_bigram_frac": (nb - len(set(bg))) / nb if nb else None,
        "top_bigram_frac": top(bg) / nb if nb else None,
    }


@pytest.mark.slow
@_SETTINGS
@given(_corpora)
def test_repetition_matches_python_model(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    rows = {r.doc_id: r for r in TX.repetition_stats(df).collect()}
    for i, text in enumerate(corpus):
        want = _py_repetition(text)
        got = rows[i]
        for k, v in want.items():
            assert getattr(got, k) == v, (k, text)


def _py_char_lm(corpus):
    chars = [c for t in corpus for c in t.lower()]
    total = len(chars)
    counts = {}
    for c in chars:
        counts[c] = counts.get(c, 0) + 1
    q = {
        c: _math.floor(_math.log(n / total) * TX.LM_QUANT)
        for c, n in counts.items()
    }
    out = []
    for i, t in enumerate(corpus):
        s = -sum(q[c] for c in t.lower())
        out.append((i, len(t), s))
    return out


@pytest.mark.slow
@_SETTINGS
@given(_corpora)
def test_char_lm_matches_python_model(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    model = TX.char_lm_model(df)
    rows = {r.doc_id: r for r in TX.char_lm_score(df, model).collect()}
    for i, n, s in _py_char_lm(corpus):
        assert rows[i].n_chars_scored == n
        assert rows[i].surprisal_q == s


def test_repetition_stats_is_projection_only(spark, sf_dir):
    import re

    plan = explain(spark, sf_dir, "repetition_stats")
    # Map-only signal extraction: no join, no aggregate; the only
    # exchange is the final presentation sort.
    assert not re.search(r"\(\d+\) \w*Join", plan), plan
    assert not re.search(r"\(\d+\) \w*HashAggregate", plan), plan
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1, plan


def test_rrf_fuse_matches_python_model(spark):
    """rrf_fuse vs a direct Python transcription on handcrafted lists
    covering all three branches (both-lists, a-only, b-only), the
    symmetric-rank tie (equal fused scores break on cand_id), and the
    top-k cut."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import rrf_fuse

    a_rows = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)]
    b_rows = [(0, 11, 1), (0, 13, 2), (1, 21, 1), (1, 20, 2)]
    a = spark.createDataFrame(a_rows, "query_id long, cand_id long, rank long")
    b = spark.createDataFrame(b_rows, "query_id long, cand_id long, rank long")
    got = [
        (r.query_id, r.cand_id, r.rank_a, r.rank_b, r.rrf_score, r.rank)
        for r in rrf_fuse(a, b, k=3, k0=60).orderBy("query_id", "rank").collect()
    ]

    da = {(q, c): r for q, c, r in a_rows}
    db = {(q, c): r for q, c, r in b_rows}
    expect = []
    for q in (0, 1):
        cands = {c for qq, c, _ in a_rows + b_rows if qq == q}
        scored = []
        for c in cands:
            ra, rb = da.get((q, c)), db.get((q, c))
            s = (1.0 / (60 + ra) if ra else 0.0) + (1.0 / (60 + rb) if rb else 0.0)
            scored.append((c, ra, rb, s))
        scored.sort(key=lambda t: (-t[3], t[0]))
        for rank, (c, ra, rb, s) in enumerate(scored[:3], start=1):
            expect.append((q, c, ra, rb, s, rank))
    assert got == expect
    # Branch coverage in the fixture itself: (0,11) fused from both,
    # (0,10) a-only, (0,13) b-only; (1,20) fuses both ranks so it beats
    # (1,21)'s single b-rank-1 strictly.
    by_pair = {(q, c): (ra, rb) for q, c, ra, rb, _, _ in got}
    assert by_pair[(0, 11)] == (2, 1)
    assert by_pair[(0, 10)] == (1, None)
    assert by_pair[(0, 13)] == (None, 2)
    r1 = [t for t in got if t[0] == 1]
    assert (r1[0][1], r1[1][1]) == (20, 21) and r1[0][4] > r1[1][4]
    # Symmetric-rank tie: an a-only rank-1 and a b-only rank-1 fuse to
    # the identical double; the smaller cand_id must win the window.
    ta = spark.createDataFrame([(0, 7, 1)], "query_id long, cand_id long, rank long")
    tb = spark.createDataFrame([(0, 5, 1)], "query_id long, cand_id long, rank long")
    tied = [
        (r.cand_id, r.rrf_score, r.rank)
        for r in rrf_fuse(ta, tb, k=2, k0=60).orderBy("rank").collect()
    ]
    assert tied[0][0] == 5 and tied[1][0] == 7
    assert tied[0][1] == tied[1][1] == 1.0 / 61

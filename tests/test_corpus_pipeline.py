"""End-to-end corpus-preparation pipeline tests (plans.corpus_pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import unpersist_all
from cig_etl_s3_to_sql_data_ingestor_spark.plans.corpus_pipeline import (
    CorpusPrepConfig,
    prepare_corpus,
)


def test_pipeline_on_synthetic_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "s"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "s"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and once", "s"),  # near dup of 1
        (4, "!!! ??? ###", "s"),  # junk -> quality floor
        (5, "completely different content about databases and the engines the", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    try:
        chunks, stats = prepare_corpus(docs, with_stats=True)
        surviving = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
        assert stats["input"] == 5
        assert stats["after_exact_dedup"] == 4  # doc 2 dropped
        assert stats["after_near_dedup"] == 3  # doc 3 dropped
        assert stats["after_quality"] == 2  # doc 4 dropped
        assert surviving == {1, 5}
        assert stats["chunks"] >= 2
    finally:
        unpersist_all()


def test_pipeline_decontamination_drops_benchmark_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta the of and", "s"),
            (2, "nothing in common with the benchmark at all here folks okay", "s"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta eta theta the of and", "b")],
        "doc_id long, text string, source string",
    )
    cfg = CorpusPrepConfig(contamination_max=0.5, quality_floor=0.0)
    try:
        chunks, stats = prepare_corpus(docs, benchmark=bench, cfg=cfg, with_stats=True)
        surviving = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
        assert surviving == {2}
        assert stats["after_decontamination"] == 1
    finally:
        unpersist_all()


def test_pipeline_runs_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    try:
        chunks, stats = prepare_corpus(docs, benchmark=bench, with_stats=True)
        assert stats["input"] > 0
        # monotone survivor counts
        order = [
            "input",
            "after_exact_dedup",
            "after_near_dedup",
            "after_quality",
            "after_decontamination",
        ]
        vals = [stats[k] for k in order]
        assert vals == sorted(vals, reverse=True)
        assert chunks.columns == [
            "doc_id",
            "chunk_idx",
            "chunk_start",
            "n_chunk_tokens",
            "chunk_hash",
        ]
        assert stats["chunks"] >= stats["after_decontamination"]
    finally:
        unpersist_all()


def test_pipeline_canonical_by_quality_keeps_best_member(spark):
    """With canonical_by_quality the near-dup survivor is the best-scored
    doc, not the smallest id: doc 2 repeats a near-identical text but has
    heavy punctuation noise, so quality favors its higher-id twin."""
    core = "the quick brown fox jumps over the lazy dog near the old river bank"
    docs = spark.createDataFrame(
        [
            # Jaccard(1,2)=0.857 (verified pair); the pure-punctuation
            # tail tanks doc 1's punct factor: scores 0.41 vs 0.61.
            (1, core + " !!!!!!!!!!!!"),
            (2, core + " peacefully"),
            (3, "a completely separate document about sequence packing budgets"),
        ],
        ["doc_id", "text"],
    )
    base = CorpusPrepConfig(quality_floor=0.0, chunk_size=8, chunk_overlap=2)
    chunks_min, _ = prepare_corpus(docs, cfg=base)
    survivors_min = {r.doc_id for r in chunks_min.select("doc_id").distinct().collect()}
    unpersist_all()
    by_q = CorpusPrepConfig(
        quality_floor=0.0, chunk_size=8, chunk_overlap=2, canonical_by_quality=True
    )
    chunks_q, _ = prepare_corpus(docs, cfg=by_q)
    survivors_q = {r.doc_id for r in chunks_q.select("doc_id").distinct().collect()}
    unpersist_all()
    assert survivors_min == {1, 3}  # min-id keeps the noisy doc
    assert survivors_q == {2, 3}  # quality rule keeps the clean twin


def test_pipeline_token_budget_caps_survivors(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    uncapped, _ = prepare_corpus(docs, cfg=CorpusPrepConfig(quality_floor=0.0))
    n_uncapped = uncapped.select("doc_id").distinct().count()
    unpersist_all()
    capped, stats = prepare_corpus(
        docs,
        cfg=CorpusPrepConfig(quality_floor=0.0, token_budget=3000),
        with_stats=True,
    )
    n_capped = capped.select("doc_id").distinct().count()
    unpersist_all()
    assert 0 < n_capped < n_uncapped
    assert stats["after_budget"] == n_capped

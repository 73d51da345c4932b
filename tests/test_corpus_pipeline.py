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

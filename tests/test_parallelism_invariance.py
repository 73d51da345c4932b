"""Parallelism invariance — the correctness face of the scale contract.

A 1000-executor cluster shuffles into a different number of partitions
than local[32]; any operator whose VALUES depend on partitioning (float
fold order, undeterministic tie-breaks, per-partition ids leaking out)
would pass the oracle gate here and still produce different answers at
scale. These tests run representative queries under two very different
``spark.sql.shuffle.partitions`` settings and assert cell-identical
results — exercising the engine-parity rules (decimal-exact sums,
total-order tie-breaks, integer quantile index picks) end to end.
"""

from __future__ import annotations

import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

# One query per parity mechanism:
CASES = [
    "pricing_summary",            # decimal-exact sums over doubles
    "market_share_by_year",       # conditional decimal ratio
    "source_quality_funnel",      # decimal mean of a derived double
    "fulfillment_lag_quantiles",  # windowed integer quantile picks
    "cheapest_supplier_per_part", # ROW_NUMBER tie-break winner
    "vocab_stats",                # TakeOrdered + bounded window shares
    "dedup_minhash",              # md5 minhash signatures + banded join
    "deterministic_split",        # hash-bucket assignment
    "source_token_divergence",    # floor-quantized log contributions
    "ann_pq_topk",                # integer-quantized ADC partial sums
    "incremental_agg_merge",      # mergeable decimal aggregate states
    "price_quantity_stats",       # exact integer moments, one double per stat
    "image_ahash_groups",         # r5: multi-channel decode -> signature groupBy
    "audio_fingerprint_groups",   # r5: interleaved-PCM energies -> signature join
    "bm25_search",                # r6: quantized-idf integer score sums + top-k
    "semdedup_keep",              # r6: double-exact eviction rank tie-breaks
    "ann_mmr_topk",               # r6: per-round (mmr DESC, id) winners
]


def _rows(spark, sf_dir, name, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    # Queries that persist intermediates (e.g. dedup_minhash's signature
    # frame) would otherwise have the SECOND run's plan silently rewritten
    # to reuse the FIRST partitioning's InMemoryRelation — the stage under
    # test would never re-execute. Clear before each run and after, so no
    # cached fragment leaks into this comparison or into later tests.
    spark.catalog.clearCache()
    try:
        df = QUERIES[name](spark, sf_dir)
        return sorted(map(repr, (tuple(r) for r in df.collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", CASES)
def test_results_identical_across_shuffle_partitionings(spark, sf_dir, name):
    assert _rows(spark, sf_dir, name, 2) == _rows(spark, sf_dir, name, 37), (
        f"{name}: values depend on the shuffle partitioning"
    )

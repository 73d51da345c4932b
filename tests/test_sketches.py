"""Approximate-distinct sketch: no cross-engine oracle exists (HLL++ is
engine-specific), so correctness is bounded-error against the exact
count — the standard contract for a sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES


def test_approx_distinct_within_error_bound(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["approx_distinct_stats"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        rel = abs(approx[k] - ex) / max(ex, 1)
        assert rel <= 0.05, f"{k}: approx {approx[k]} vs exact {ex} ({rel:.1%})"

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


def test_profile_columns_approx_mode(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.profile import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_returnflag"]
    exact = {r.col_name: r for r in profile_columns(li, cols).collect()}
    approx = {r.col_name: r for r in profile_columns(li, cols, approx=True).collect()}
    for c in cols:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_value == exact[c].min_value
        assert approx[c].max_value == exact[c].max_value
        # HLL default rsd is 5%.
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            3, 0.1 * exact[c].n_distinct
        )

"""Unit tests for the skew diagnostic (operators.profile.skew_report):
known skewed input -> exact shares, ranks, and skew factor."""

from __future__ import annotations

from cig_etl_s3_to_sql_data_ingestor_spark.operators.profile import skew_report


def test_skew_report_exact_values(spark):
    # 100 rows: key "hot" 60x, "warm" 30x, ten cold keys 1x each.
    rows = (
        [("hot",)] * 60 + [("warm",)] * 30 + [(f"c{i}",) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(7)
    out = skew_report(df, "k", top_k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert [r.key for r in out] == ["hot", "warm", "c0"]
    assert [r.key_rows for r in out] == [60, 30, 1]
    assert out[0].share_pct == 60.0
    assert out[1].cum_share_pct == 90.0
    assert out[0].total_rows == 100 and out[0].n_keys == 12
    # max/mean factor: 60 / (100/12) = 7.2 on every row
    assert all(abs(r.skew_factor - 7.2) < 1e-12 for r in out)


def test_skew_report_uniform_keys_factor_one(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(50)], "k int")
    out = skew_report(df, "k", top_k=5).collect()
    assert len(out) == 5
    assert all(r.key_rows == 10 for r in out)
    assert all(r.skew_factor == 1.0 for r in out)
    # deterministic tie-break: equal counts order by key ascending
    assert [r.key for r in out] == [0, 1, 2, 3, 4]

"""Approximate-distinct sketch: no cross-engine oracle exists (HLL++ is
engine-specific), so correctness is bounded-error against the exact
count — the standard contract for a sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """The query itself now carries the sketch-accuracy verdict: exact
    distinct counts (oracle-anchored) plus the in-envelope boolean. The
    boolean must hold, and the exact column must equal countDistinct."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_stats"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, ex in exact.items():
        assert rows[k]["n_users_exact"] == ex
        assert rows[k]["hll_within_rel_error"], (
            f"{k}: HLL estimate left the 5% envelope (exact {ex})"
        )


def test_profile_columns_default_hll_within_envelope(spark, sf_dir):
    """The DEFAULT profile mode is HLL: every non-distinct stat must be
    exact, and the sketched distinct counts must sit within the 5%
    envelope of the exact opt-in mode."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.profile import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_returnflag", "l_shipdate"]
    exact = {r.col_name: r for r in profile_columns(li, cols, approx=False).collect()}
    approx = {r.col_name: r for r in profile_columns(li, cols).collect()}
    for c in cols:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_value == exact[c].min_value
        assert approx[c].max_value == exact[c].max_value
        rel = abs(approx[c].n_distinct - exact[c].n_distinct) / max(
            exact[c].n_distinct, 1
        )
        assert rel <= 0.05, f"{c}: HLL {approx[c].n_distinct} vs {exact[c].n_distinct}"
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_value == exact[c].min_value
        assert approx[c].max_value == exact[c].max_value
        # HLL default rsd is 5%.
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            3, 0.1 * exact[c].n_distinct
        )


def test_cms_never_underestimates_and_is_partition_invariant(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"k{i % 7}",) for i in range(200)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, "key string")
    exact = {r.key: r.n for r in df.groupBy("key").count().withColumnRenamed("count", "n").collect()}
    keys = df.select("key").distinct()
    for parts in (2, 37):
        d = df.repartition(parts)
        sk = cms_build(d, "key", depth=3, width=4)
        est = {
            r.key: r.cms_estimate
            for r in cms_estimate(sk, keys, "key", depth=3, width=4).collect()
        }
        # One-sided error: estimates never undercount.
        for k, n in exact.items():
            assert est[k] >= n, (k, est[k], n)
        # Total sketch mass per row equals the corpus size (merge = sum).
        per_row = {
            r.row_idx: r.s
            for r in sk.groupBy("row_idx").agg(F.sum("cnt").alias("s")).collect()
        }
        assert set(per_row.values()) == {500}
    # Deterministic: both partitionings give identical estimates.
    sk2 = cms_build(df.repartition(5), "key", depth=3, width=4)
    est2 = {
        r.key: r.cms_estimate
        for r in cms_estimate(sk2, keys, "key", depth=3, width=4).collect()
    }
    assert est2 == est


def test_bloom_no_false_negatives_and_union_merge(spark):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    a = spark.createDataFrame([(f"m{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"n{i}",) for i in range(50)], "key string")
    outside = spark.createDataFrame(
        [(f"x{i}",) for i in range(200)], "key string"
    )
    bits_a = bloom_build(a, "key", n_bits=128, n_hashes=2)
    bits_b = bloom_build(b, "key", n_bits=128, n_hashes=2)
    merged = bits_a.unionByName(bits_b).distinct()
    # Every member of either set MUST hit the merged filter.
    members = a.unionByName(b)
    hits = bloom_probe(merged, members, "key", n_bits=128, n_hashes=2)
    assert all(r.bloom_hit for r in hits.collect())
    # Undersized filter: outsiders may false-positive but the probe is
    # deterministic across partitionings.
    h1 = {
        r.key: r.bloom_hit
        for r in bloom_probe(
            bits_a, outside.repartition(2), "key", n_bits=128, n_hashes=2
        ).collect()
    }
    h2 = {
        r.key: r.bloom_hit
        for r in bloom_probe(
            bits_a, outside.repartition(37), "key", n_bits=128, n_hashes=2
        ).collect()
    }
    assert h1 == h2

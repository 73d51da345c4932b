"""Single-pass column profiling: per-column null count, distinct count,
and min/max — the pre/post-ingest validation report the reference keeps
in ad-hoc verification queries (ref: main.py verification pass,
cig_tables.json column contracts), generalized to any frame.

One ``agg`` computes every statistic in a single scan; the long-form
result is produced by exploding an in-row struct array (a projection),
not by re-scanning per column. The DEFAULT distinct counts use
HyperLogLog (`approx_count_distinct`, rsd 0.02) — the 100 TB path,
since exact multi-column COUNT(DISTINCT) expands the input once per
counted column (Spark's Expand operator: one shuffle pass carrying
``n_cols`` copies of the scan). Exact mode is opt-in
(``approx=False``) for bounded frames and oracle parity; the default
plan is asserted Expand-free in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out


HLL_RSD = 0.02


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = True
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max rendered as strings so heterogeneous column
    types share one schema.

    fan_out first: exact mode Expands the input once per counted column
    before the partial aggregate, so an under-partitioned scan (one small
    parquet file) would otherwise serialize the whole multiplied load on
    a single task."""
    cols = cols or df.columns
    df = fan_out(df.select(*cols))
    if approx:
        distinct = lambda c: F.approx_count_distinct(c, HLL_RSD)  # noqa: E731
    else:
        distinct = F.count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            (F.col("__total") - F.col(f"{c}__nn")).alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return (
        row.select(
            F.col("__total").alias("n_rows"),
            F.explode(F.array(*entries)).alias("p"),
        )
        .select(
            "p.col_name", "n_rows", "p.n_nulls", "p.n_distinct",
            "p.min_value", "p.max_value",
        )
    )


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/partition-skew diagnostic for a key column: the top-``top_k``
    heaviest keys with their share and cumulative share of all rows, plus
    the corpus-wide context (row count, key count, mean rows/key, and the
    max/mean skew factor) repeated on every row.

    This is the measurement that decides whether a 100 TB join on
    ``key_col`` needs salting (`partitioning.salted_join`) or AQE skew
    splitting: a skew_factor near 1 means uniform keys; a heavy head in
    ``cum_share_pct`` means the top keys dominate and the shuffle will
    straggle without mitigation.

    Cost shape: ONE shuffle (the per-key partial aggregate); the top-k is
    a distributed TakeOrdered (sort + limit, never a global sort), the
    context stats are a 1-row aggregate OF the per-key aggregate, and the
    rank/cumulative window runs only over the ``top_k`` surviving rows.
    """
    from pyspark.sql import Window as W

    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("key_rows"))
    ctx = per_key.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("key_rows").alias("max_key_rows"),
    )
    top = per_key.orderBy(F.col("key_rows").desc(), F.col(key_col)).limit(top_k)
    w = W.orderBy(F.col("key_rows").desc(), F.col(key_col))
    return (
        top.crossJoin(F.broadcast(ctx))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_rows",
            F.sum("key_rows").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select(
            "rank",
            F.col(key_col).alias("key"),
            "key_rows",
            (F.col("key_rows") * 100.0 / F.col("total_rows")).alias("share_pct"),
            (F.col("cum_rows") * 100.0 / F.col("total_rows")).alias(
                "cum_share_pct"
            ),
            "total_rows",
            "n_keys",
            (
                F.col("max_key_rows") * F.col("n_keys") / F.col("total_rows")
            ).alias("skew_factor"),
        )
        .orderBy("rank")
    )

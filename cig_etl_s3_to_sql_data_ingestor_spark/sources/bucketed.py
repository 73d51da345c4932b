"""Bucketed-table helpers — shuffle-free co-located joins.

At 100 TB the dominant recurring cost is the fact⨝fact shuffle (e.g.
lineitem⨝orders on orderkey, every day, for every downstream query).
Bucketing pays that shuffle once at write time: both tables are written
pre-hashed into the same number of buckets on the join key, and every
subsequent equi-join on that key is planned as a SortMergeJoin with NO
Exchange on either side — the buckets line up one-to-one.

Uses Spark-native bucketing (works with the in-memory session catalog;
on a cluster, any Hive-compatible metastore). ``sortBy`` on the same key
additionally removes the per-task Sort from the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    Catalyst detects the matching output partitioning and omits both
    exchanges (asserted in tests/test_bucketing.py) — the join runs as
    a zip of bucket pairs.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)

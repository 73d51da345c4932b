"""Hive-partitioned parquet sink with dynamic partition overwrite —
the idempotent re-ingest primitive for a date/env-partitioned lake.

The reference re-ingests a backup date by deleting and re-inserting SQL
rows under marker control; the lake-side analog at 100 TB is INSERT
OVERWRITE of exactly the partitions present in the incoming frame:
replaying one day replaces that day's directories and touches nothing
else, so a retry can never duplicate and never clobbers other days
(static overwrite mode would wipe the whole root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write ``df`` partitioned by ``partition_cols``, replacing only the
    partition directories ``df`` actually contains."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )

"""Partitioning helpers — keep CPU-heavy stages parallel at any scale.

A well-partitioned 100 TB scan arrives with thousands of splits, but two
common plan shapes collapse parallelism to a handful of tasks:

- a small parquet file (or one below ``spark.sql.files.openCostInBytes``)
  reads as a single split, so every downstream map runs on one core;
- a broadcast join's output inherits the probe side's partitioning — if
  the probe side is one split, the entire scored/joined stage is too.

``fan_out`` restores parallelism with a round-robin repartition, but ONLY
when the plan is under-partitioned — on a properly split large input it is
a no-op, so operators can call it unconditionally without adding a shuffle
at scale. Round-robin repartition in Spark sorts within partitions first
(``spark.sql.execution.sortBeforeRepartition``), so it is deterministic
under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff it currently has fewer — a no-op on well-split inputs."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

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
from pyspark.sql import functions as F


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff it currently has fewer — a no-op on well-split inputs."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the other.

    For the case AQE's skew handling can't fix: a join key where a few
    hot values dominate the big side AND the other side is too large to
    broadcast outright. The big side gets a deterministic per-row salt
    (hash of all columns, so retried tasks re-derive the same salt); the
    medium side is exploded ``n_salts``-fold so every (key, salt) bucket
    finds its match. A hot key's rows now spread over ``n_salts`` tasks
    instead of one straggler.

    Cost model: medium side is scanned/shuffled ``n_salts`` times over —
    worth it only when the hot key's single-task time dominates the
    stage. Result equals ``big.join(medium, on, how)`` exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    m = medium.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(m, [on, "_salt"], how).drop("_salt")

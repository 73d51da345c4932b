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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assert_scan_rooted(df: DataFrame) -> None:
    """Test-only tripwire (enabled by SPARK_GRAFT_ASSERT_FANOUT=1, which
    tests/conftest.py sets for the whole suite): refuse ``fan_out`` on an
    exchange-bearing plan. The r9 regression happened because the
    "scan-rooted frames only" rule lived in code review, not code — a new
    call site that probes a join/agg output silently pays one hidden
    extra execution of the upstream stages per call (see fan_out's
    docstring). The probe below is driver-only (plan analysis, zero
    jobs); it is OFF outside tests so production calls add no analysis
    pass, and any private-API failure degrades to "no check"."""
    if os.environ.get("SPARK_GRAFT_ASSERT_FANOUT") != "1":
        return
    try:
        plan = str(df._jdf.queryExecution().optimizedPlan())
    except Exception:  # noqa: BLE001 — a check, never a failure mode
        return
    markers = ("Join", "Aggregate", "Window")
    hit = [
        m
        for m in markers
        if any(ln.lstrip(" +-:").startswith(m) for ln in plan.splitlines())
    ]
    if hit:
        raise AssertionError(
            f"fan_out called on an exchange-bearing plan ({'/'.join(hit)} "
            "node present): the .rdd partition probe would materialize "
            "the upstream stages as real unreused jobs under AQE — use "
            "fan_out_by_stats(df, scan_rooted_reference) instead"
        )


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff it currently has fewer — a no-op on well-split inputs.

    ONLY for exchange-free plans (scans, scans + narrow projections):
    there ``df.rdd.getNumPartitions()`` is computed from file splits
    without running a job. On a plan containing exchanges (join, agg,
    window) the probe MATERIALIZES the upstream query stages as real
    Spark jobs under AQE — and that work is NOT reused by the
    downstream action, which compiles a fresh physical plan — so every
    such probe pays one hidden extra execution of the upstream
    scan+shuffle (measured round 10: the r9 pair-frame probes cost
    0.7-0.9 s per IVF query at sf0.1, and the cost grows with data).
    Use :func:`fan_out_by_stats` for join/agg outputs instead (the
    test suite enforces this mechanically — see _assert_scan_rooted)."""
    _assert_scan_rooted(df)
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def fan_out_by_stats(
    df: DataFrame,
    reference: DataFrame,
    target: int | None = None,
    bytes_per_core: int = 64 << 20,
) -> DataFrame:
    """Repartition ``df`` (a join/agg output whose partition count
    cannot be probed without executing it) to ``target`` partitions iff
    ``reference`` — the scan-rooted input that sizes the plan, e.g. the
    corpus frame feeding a pair join — is optimizer-estimated below
    ``target * bytes_per_core``.

    The decision reads ``optimizedPlan().stats().sizeInBytes`` — a
    driver-only logical-plan statistic derived from file sizes, so it
    costs zero Spark jobs (unlike ``df.rdd.getNumPartitions()``, which
    under AQE materializes upstream stages that the real query then
    recomputes — see :func:`fan_out`). Small-to-medium inputs (where
    AQE coalesces the upstream shuffle below cluster parallelism and a
    CPU-heavy per-pair fold would run on a handful of cores) get the
    round-robin repartition; at large scale the estimate clears the
    bound and the call is a true no-op — no probe job, no shuffle.
    Round-10 A/B (min-of-3, interleaved): vs the probe this is
    ann_ivf_topk 4.63→4.14 s, ann_ivf_sq8_topk 6.95→5.60 s,
    knn_label_eval_ann 8.89→7.32 s at sf0.1.

    The stats probe reaches through ``_jdf`` — a private JVM handle that
    Spark Connect does not expose and minor versions may move. Any
    failure there degrades to "repartition unconditionally": correct
    either way (round-robin repartition preserves rows), at worst one
    extra shuffle of an input the estimate would have cleared — a slow
    plan, never a crash."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        est = int(
            reference._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — private-API probe; see docstring
        return df.repartition(target)
    if est >= target * bytes_per_core:
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

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


_EXCHANGE_NODES = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Deduplicate",
    "Intersect",
    "Except",
)


def _exchange_shaped(df: DataFrame) -> bool:
    """Driver-only lineage check: does the (already-eagerly-computed)
    analyzed logical plan contain a node whose physical form shuffles?
    Costs one plan-tree toString — no analysis pass (DataFrames are
    analyzed at creation), no Spark jobs. Unknown (e.g. no ``_jdf``
    under Spark Connect) counts as exchange-shaped: the stats path it
    routes to degrades safely (see fan_out_by_stats)."""
    try:
        plan = str(df._jdf.queryExecution().analyzed())
    except Exception:  # noqa: BLE001 — a probe, never a failure mode
        return True
    return any(
        ln.lstrip(" +-:").startswith(_EXCHANGE_NODES)
        for ln in plan.splitlines()
    )


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: cluster parallelism)
    partitions iff it is under-partitioned — a no-op on well-split
    inputs, safe on ANY lineage.

    Two dispatch paths, chosen by a driver-only plan-shape check:

    - exchange-free plans (scans, scans + narrow projections):
      ``df.rdd.getNumPartitions()`` is computed from file splits
      without running a job — the exact probe, for free;
    - exchange-bearing plans (join/agg/window/sort/distinct lineage):
      the probe MATERIALIZES the upstream query stages as real Spark
      jobs under AQE — and that work is NOT reused by the downstream
      action, which compiles a fresh physical plan — so every such
      probe pays one hidden extra execution of the upstream
      scan+shuffle (measured round 10: 0.7-0.9 s per IVF query at
      sf0.1, growing with data; the r11 suite tripwire then caught the
      same hazard on the corpus-pipeline mid-stage frames). These
      route to the :func:`fan_out_by_stats` decision on the frame's
      OWN optimizer estimate — join-inflated estimates err UPWARD,
      i.e. toward "large, leave alone": at scale the call is a no-op
      (no probe job, no shuffle), at test/interactive scale small
      frames still spread onto all cores.

    The stats decision sizes the plan by the SUM OF ITS LEAF SCANS
    (file-size statistics), not the frame's own join-inflated estimate
    — a two-sided join of a 200 KB table estimates in the tens of GB,
    which would freeze the spread decision at "leave alone" exactly
    where small inputs need it. Leaf sums are the automatic form of
    the scan-rooted reference the IVF pair sites pass to
    :func:`fan_out_by_stats` by hand."""
    if _exchange_shaped(df):
        return fan_out_by_stats(df, None, target)
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def fan_out_by_stats(
    df: DataFrame,
    reference: DataFrame | None,
    target: int | None = None,
    bytes_per_core: int = 64 << 20,
) -> DataFrame:
    """Repartition ``df`` (a join/agg output whose partition count
    cannot be probed without executing it) to ``target`` partitions iff
    ``reference`` — the scan-rooted input that sizes the plan, e.g. the
    corpus frame feeding a pair join — is optimizer-estimated below
    ``target * bytes_per_core``. ``reference=None`` sizes ``df`` by the
    SUM OF ITS OWN LEAF SCANS instead (each leaf's stats are file-size
    facts, immune to the multiplicative join inflation of the frame's
    whole-plan estimate) — the automatic spelling :func:`fan_out` uses
    when no hand-picked reference exists.

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
    Spark Connect does not expose and minor versions may move. Failure
    handling differs by mode, and the asymmetry is deliberate:

    - ``reference`` GIVEN (a hand-picked scan-rooted frame the caller
      asserts sizes the plan): degrade to "repartition unconditionally"
      — the caller's intent was a size-gated spread of something it
      knows is pair-join shaped, and rows are preserved either way; at
      worst one extra shuffle of an input the estimate would have
      cleared.
    - ``reference=None`` (the automatic :func:`fan_out` dispatch, which
      wraps EVERY exchange-shaped frame engine-wide): degrade to a
      NO-OP. With no size information, an unconditional round-robin
      repartition here would re-shuffle every join/agg output in the
      engine — at 100 TB under Spark Connect that is a scale hazard,
      not a degradation. An under-split small input merely stays slow.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        if reference is not None:
            est = int(
                reference._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        else:
            leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
            est = sum(
                int(leaves.apply(i).stats().sizeInBytes())
                for i in range(leaves.size())
            )
    except Exception:  # noqa: BLE001 — private-API probe; see docstring
        return df.repartition(target) if reference is not None else df
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

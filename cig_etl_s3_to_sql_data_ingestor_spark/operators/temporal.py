"""Temporal operators Spark's DataFrame API lacks as built-ins.

``as_of_join`` — for each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (a backward as-of join, the
time-series "last known value" join).

The naive formulation is a range join (``l.key = r.key AND r.ts <= l.ts``
+ a per-row argmax), which Catalyst executes as a join + re-aggregation —
quadratic per key in the worst case. The scalable formulation used here is
the classic union trick:

1. tag both sides and UNION them into one frame,
2. one shuffle+sort by (key, ts, side-tag) — right rows sort BEFORE left
   rows at equal timestamps so exact matches are visible,
3. ``last(right_payload, ignorenulls=True)`` over the running window
   carries the latest right payload forward onto every left row.

One shuffle, one sort, no join at all — the cost is that of a window
function over ``|L| + |R|`` rows, and skewed keys are handled the same way
any window op is (salting the key if a single entity exceeds a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import epoch_seconds


def range_join_by_buckets(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join without an equi-key, made shuffle-friendly.

    Catalyst plans a pure inequality join (``ts >= start AND ts < end``)
    as BroadcastNestedLoopJoin — O(|events| x |intervals|) comparisons,
    unusable at scale. The bucket trick turns it into an equi-join:

    - each event keys by its time bucket ``floor(epoch/W)``;
    - each interval explodes into the buckets it overlaps (cheap when
      interval length ~ bucket width);
    - equi-join on bucket, then the exact range predicate filters.

    Each (event, interval) pair meets in exactly one bucket (the event's
    own), so no dedup is needed. The shuffle is keyed by time bucket —
    pick ``bucket_seconds`` ~ median interval length so intervals explode
    into O(1) buckets each. End is exclusive.
    """
    b = F.floor(epoch_seconds(events, ts_col) / bucket_seconds)
    ev = events.withColumn("_bucket", b.cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(intervals, start_col) / bucket_seconds).cast(
                    "long"
                ),
                F.floor(
                    (epoch_seconds(intervals, end_col) - 1) / bucket_seconds
                ).cast("long"),
            )
        ),
    )
    return (
        ev.join(iv, "_bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = (),
    suffix: str = "_matched",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join (exact matches allowed).

    Returns every ``left`` row with ``<payload>_matched`` columns holding
    the payload of the latest ``right`` row at-or-before its timestamp
    (NULL when no prior right row exists), plus ``ts_matched`` with that
    row's timestamp. When several right rows share a timestamp, the one
    with the greatest ``tiebreak`` (a right/payload column) wins —
    without it the winner among equal timestamps is nondeterministic.
    """
    lcols = left.columns
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in payload_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # Right rows (side=0) sort before left rows (side=1) at equal ts, so a
    # right row with ts == left.ts is matched (allow_exact_matches).
    order = [F.col(ts_col), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    carried = r.unionByName(l).select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("ts_matched"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        "ts_matched",
        *[F.col(f"{c}{suffix}") for c in payload_cols],
    )

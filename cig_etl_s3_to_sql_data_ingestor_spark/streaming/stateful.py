"""Custom stateful streaming operators (SURVEY §2.8 extensions).

``sessionize_stream`` — event-time sessionization with a gap timeout,
built on ``applyInPandasWithState``: per-key (user) state carries the
open session (start, last-seen, count); events extend or close it, and
the event-time timeout flushes sessions whose gap elapsed against the
watermark. This is the canonical operator Spark's declarative API cannot
express (session windows with emission on timeout + custom payloads) —
state lives in the checkpoint, so a crashed/restarted query resumes
exactly-once.

``dedup_stream`` — ``dropDuplicatesWithinWatermark`` keyed on the
event id: the streaming analog of the marker protocol for row-level
(not file-level) dedup, with state bounded by the watermark horizon
instead of growing forever.

Scale notes: state is partitioned by the grouping key across executors
(HDFS/RocksDB-backed state store at cluster scale); each micro-batch
shuffles only that batch's rows by key. The pandas function sees one
key's batch slice at a time — memory is bounded by per-key batch volume,
not stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),  # epoch micros
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit closed sessions (gap > ``gap_minutes`` or event-time timeout).

    Input needs (user_id, ts, event_id); must be a streaming DataFrame.
    Sessions still open at the end of a batch stay in state and flush
    when the watermark passes their gap deadline — including across
    separate ``availableNow`` runs, via the checkpoint.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        # Self-contained closure: Python workers may not have this
        # package importable (driver may run from any cwd).
        import datetime as _dt

        import pandas as _pd

        (user,) = key

        def _to_us(ts) -> int:
            if isinstance(ts, _pd.Timestamp):
                return ts.value // 1000
            return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

        def _to_ts(us: int):
            return _pd.Timestamp(us * 1000)

        closed = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((user, _to_ts(start), _to_ts(last), n))
            state.remove()
        else:
            rows = _pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
            cur = state.get if state.exists else None
            for ts in rows["ts"]:
                us = _to_us(ts)
                if cur is None:
                    cur = (us, us, 1)
                elif us - cur[1] > gap_us:
                    closed.append((user, _to_ts(cur[0]), _to_ts(cur[1]), cur[2]))
                    cur = (us, us, 1)
                else:
                    cur = (cur[0], us, cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # Flush via event-time timeout once the watermark passes
                # last-seen + gap.
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        yield _pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Row-level streaming dedup on event_id, state bounded by watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribute_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream attribution join: each purchase matched to the same
    user's clicks in the preceding ``attribution_window``.

    Both sides carry watermarks and the join condition bounds the time
    range, so Spark can size the join state and evict expired rows —
    the requirements for a watermarked stream-stream inner join. State
    is keyed by user_id; each side buffers only rows younger than
    watermark + window.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )

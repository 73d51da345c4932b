"""Slowly-changing-dimension (Type 2) history build.

The reference ingests daily full snapshots and overwrites the target
(`ParquetFileInsertion.py` truncate-and-insert per marker run) — history
is lost. This operator derives the warehouse-standard alternative: from a
change/snapshot stream, emit one row per (key, attribute-state) interval
with ``valid_from`` / ``valid_to`` / ``is_current``, collapsing
consecutive rows whose tracked attributes did not change.

Scale shape: both windows (the change-detection lag and the interval
lead) partition by the same key, so Catalyst plans ONE shuffle and sorts
once — the second window reuses the child's partitioning/ordering. No
self-join, no driver state; output size is bounded by the number of
actual changes, not the number of snapshots.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change stream into SCD2 validity intervals.

    A row opens a new interval when any of ``attr_cols`` differs from the
    previous row of the same key (ordered by ``ts_col`` then ``tiebreak``,
    which must make the ordering total for deterministic output). The
    interval closes at the next change's timestamp (``valid_to`` NULL on
    the open, current interval).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        # NULL-safe inequality so NULL→value and value→NULL count as changes.
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()
    changes = df.withColumn("__open", first | changed).filter(F.col("__open"))
    valid_to = F.lead(F.col(ts_col)).over(w)
    return (
        changes.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
            *tiebreak,
        )
    )


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog: last writer per key wins, a trailing
    delete tombstones the key out of the snapshot.

    One keyed window (ROW_NUMBER over the key, descending by the total
    order) picks the final operation per key — the shuffle is keyed by
    the CDC key, so snapshot application scales with the changelog, and
    a hot key costs only its own sort. ``order_cols`` must be a TOTAL
    order (e.g. ts + a unique sequence id); ties would otherwise make
    winner selection engine-dependent. Generalizes the reference's
    truncate-and-reload refresh (CigEolHostingIngestionLogic.py:168-188)
    into merge semantics; the JDBC MERGE upsert (sources/jdbc.py) is
    the sink-side twin of this source-side operator.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )

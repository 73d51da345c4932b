"""Freshness monitor (reference `check_bucket_latest_folders.py`, C6):
latest backup date per (environment, entity), staleness predicate, and
the tiered exception anti-filter.

The listing source is any file-discovery DataFrame (sources.parquet_tree
or an S3 prefix listing); from there everything is one partial-aggregated
groupBy plus a broadcast anti-join — no driver loops over entities.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_entity(files: DataFrame) -> DataFrame:
    """A2: max backup date per (environment, entity)."""
    return files.groupBy("environment", "entity_name").agg(
        F.max("backup_date").alias("latest_date"),
        F.count("*").alias("n_files"),
    )


def stale_entities(
    latest: DataFrame,
    reference_date: dt.date,
    exceptions: DataFrame | None = None,
) -> DataFrame:
    """P7 + P8: entities whose latest backup predates ``reference_date``,
    minus entities inside their per-tier grace window.

    ``exceptions``: (entity_name, environment, tier_days) — static
    exceptions use a very large tier. Broadcast anti-join; the latest
    frame is already one row per entity so this is metadata-scale."""
    ref = F.lit(reference_date)
    stale = latest.filter(F.col("latest_date") < ref)
    if exceptions is None:
        return stale
    within_grace = (
        stale.join(
            F.broadcast(exceptions),
            ["entity_name", "environment"],
            "inner",
        )
        .filter(F.col("latest_date") >= F.date_sub(ref, F.col("tier_days")))
        .select("entity_name", "environment")
    )
    return stale.join(
        F.broadcast(within_grace), ["entity_name", "environment"], "left_anti"
    )


def freshness_report(
    files: DataFrame,
    reference_date: dt.date,
    exceptions: DataFrame | None = None,
) -> DataFrame:
    """environment, entity_name, latest_date for every stale entity —
    the records the reference posts to Slack (`:65-89`)."""
    return (
        stale_entities(latest_per_entity(files), reference_date, exceptions)
        .select("environment", "entity_name", "latest_date")
        .orderBy("environment", "entity_name")
    )

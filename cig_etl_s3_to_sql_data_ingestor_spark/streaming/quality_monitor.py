"""Streaming corpus-quality monitor (SURVEY §2.8 extension, round 3).

A crawl/ingest stream's quality drifts — a broken extractor, a spammy
domain, an encoding regression — and batch audits find out a day late.
This operator scores documents AS THEY ARRIVE with the same pure-column
quality heuristics the batch pipeline uses (`operators.text.quality_scores`)
and aggregates per (event-time window, source): document counts, mean
quality, and the below-floor fraction that pages an operator.

Shape: the scoring is a stateless projection fused into the micro-batch
scan (no Python, no state); the only stateful piece is the windowed
aggregate, whose state is bounded by the watermark horizon and keyed by
(window, source) — a few rows per source per window, nothing that grows
with stream history. Works identically on a batch frame (for backfills)
because nothing here is streaming-specific until ``withWatermark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import quality_scores


def quality_monitor_stream(
    docs: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    quality_floor: float = 0.5,
    ts_col: str = "ingest_ts",
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (window, source) quality report over a document stream.

    Input needs (id, text, source, event-time ts). Output:
    window_start/end, source, n_docs, n_below_floor, below_floor_frac,
    mean_quality — the feed a threshold alert or dashboard consumes.
    """
    scored = quality_scores(
        docs, id_col=id_col, text_col=text_col, keep=(ts_col, source_col)
    )
    below = F.when(F.col("quality_score") < quality_floor, 1).otherwise(0)
    return (
        scored.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(source_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(below).alias("n_below_floor"),
            F.avg("quality_score").alias("mean_quality"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(source_col),
            "n_docs",
            "n_below_floor",
            (F.col("n_below_floor").cast("double") / F.col("n_docs")).alias(
                "below_floor_frac"
            ),
            "mean_quality",
        )
    )

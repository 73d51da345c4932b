"""Streaming frequency monitor: maintain a count-min sketch of a key
column across micro-batches and surface heavy hitters per epoch — the
frequency member of the streaming-monitor family (quality_monitor
watches score distributions; this watches key mass).

Why a sketch and not a running per-key count table: at 100 TB of
events the key cardinality is unbounded, but the CMS is ``depth x
width`` integer counters FOREVER — the store on disk is a few thousand
rows no matter how many keys stream through, and sketch cells ADD, so
merging epochs is a plain aggregate. Estimates only overestimate
(collision mass), never under — an alert can false-positive under
heavy collision but never miss a true heavy hitter above threshold.

Each micro-batch:

1. builds the batch's sketch delta (``cms_build`` — one bounded
   partial aggregate) and writes it to the store's ``epoch=N`` dir;
2. probes BOTH the prior store and the merged store (prior + this
   epoch's delta) with the batch's distinct keys, and writes only the
   keys that CROSSED ``threshold`` this epoch (prior estimate below,
   merged estimate at-or-above) to the alerts ``epoch=N`` dir — a key
   alerts exactly once, on its crossing epoch, instead of re-firing on
   every later appearance.

Epoch idempotency: both writes are epoch-addressed overwrites and the
merge EXCLUDES the current epoch before adding this attempt's freshly
computed delta, so a crash-replay recomputes identical dirs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.sketches import cms_build, cms_estimate

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def read_sketch_store(
    spark: SparkSession, path: str, exclude_epoch: int | None = None
) -> DataFrame:
    from ._store import read_epoch_store

    return read_epoch_store(spark, path, SKETCH_SCHEMA, exclude_epoch)


@dataclass
class FrequencyMonitor:
    """availableNow-drained CMS maintenance + heavy-hitter alerts."""

    spark: SparkSession
    store_path: str
    alerts_path: str
    checkpoint_path: str
    key_col: str = "event_type"
    depth: int = 3
    width: int = 1024
    threshold: int = 100

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = cms_build(
            batch_df, self.key_col, depth=self.depth, width=self.width
        )
        delta.select(
            F.col("row_idx").cast("int"),
            F.col("bucket").cast("long"),
            F.col("cnt").cast("long"),
        ).write.mode("overwrite").parquet(f"{self.store_path}/epoch={epoch_id}")
        # Merge = cells add. The delta is READ BACK from the epoch dir
        # just written (the write is synchronous) instead of re-running
        # the aggregation lineage — building the sketch is the batch's
        # expensive stage and must run once. Prior epochs exclude the
        # current id so a half-written replay cannot double-count.
        # The store holds one row per (epoch, cell); estimates must run
        # over the CELL-SUMMED sketch — probing the raw multi-epoch rows
        # would take the min over per-epoch counts instead of their sum
        # and understate every cumulative estimate.
        prior = (
            read_sketch_store(
                self.spark, self.store_path, exclude_epoch=epoch_id
            )
            .groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        this_epoch = self.spark.read.schema(SKETCH_SCHEMA).parquet(
            f"{self.store_path}/epoch={epoch_id}"
        )
        merged = (
            prior.unionByName(this_epoch)
            .groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        keys = batch_df.select(self.key_col).distinct()
        est_now = cms_estimate(
            merged, keys, self.key_col, depth=self.depth, width=self.width
        )
        est_prior = cms_estimate(
            prior, keys, self.key_col, depth=self.depth, width=self.width
        ).select(
            F.col(self.key_col),
            F.col("cms_estimate").alias("_prior_estimate"),
        )
        # A key alerts ONCE — on the epoch its cumulative mass crosses.
        hitters = (
            est_now.join(est_prior, self.key_col)
            .filter(
                (F.col("cms_estimate") >= self.threshold)
                & (F.col("_prior_estimate") < self.threshold)
            )
            .drop("_prior_estimate")
        )
        hitters.write.mode("overwrite").parquet(
            f"{self.alerts_path}/epoch={epoch_id}"
        )

    def start(self, source_glob: str, schema: T.StructType):
        stream = (
            self.spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(source_glob)
        )
        return (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )

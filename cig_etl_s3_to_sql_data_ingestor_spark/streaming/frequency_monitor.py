"""Streaming frequency monitor: maintain a count-min sketch of a key
column across micro-batches and surface heavy hitters per epoch — the
frequency member of the streaming-monitor family (quality_monitor
watches score distributions; this watches key mass).

Why a sketch and not a running per-key count table: at 100 TB of
events the key cardinality is unbounded, but the CMS is ``depth x
width`` integer counters PER EPOCH — key cardinality never grows it,
and sketch cells ADD, so merging epochs is a plain aggregate. The
store does grow O(n_epochs) in epoch-dir count (each batch appends up
to ``depth*width`` rows), and every batch's prior-merge re-reads all
prior epoch dirs; ``compact_sketch_store`` folds committed history
into a single summed base sketch (cells add, so compaction IS the
merge aggregate) and ``compact_alerts_store`` does the same for the
alerts dirs the ever-alerted gate scans (disjoint union) to keep both the disk footprint and the per-batch
scan bounded. Estimates only overestimate (collision mass), never
under — an alert can false-positive under heavy collision but never
miss a true heavy hitter above threshold.

Each micro-batch:

1. builds the batch's sketch delta (``cms_build`` — one bounded
   partial aggregate) and writes it to the store's ``epoch=N`` dir;
2. probes the merged store (prior + this epoch's delta) with the
   batch's distinct keys and writes the keys at-or-above ``threshold``
   that have NEVER alerted before (anti-join against the accumulated
   alerts store) to the alerts ``epoch=N`` dir — a key alerts exactly
   once, on the first batch that sees it over threshold. Gating on the
   alerts store rather than on "prior estimate < threshold" matters:
   collision mass from other keys can push a key's estimate past the
   threshold during an epoch where the key is absent, and a
   prior-vs-now crossing test would then never hold for it — silently
   suppressing a true heavy hitter, contradicting the never-miss
   guarantee above.

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


def _store_fs(spark: SparkSession, path: str):
    from ..fsutil import hadoop_fs

    return hadoop_fs(spark, path)


def _finish_compaction(fs, jvm, store_path: str, upto: int) -> None:
    """Promote (or discard) a ``.compact_tmp_upto=K`` dir. The tmp dir
    is only promotable once its ``_SUCCESS`` marker exists — a tmp
    without the marker is a write that died mid-flight, and the source
    epoch dirs are still intact, so it is simply dropped. Deleting the
    folded epoch dirs before the rename is safe to re-run: the tmp dir
    holds the complete sum, so a crash anywhere in this function is
    finished by the recovery scan at the top of the next compact call."""
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(f"{store_path}/.compact_tmp_upto={upto}")
    if not fs.exists(tmp):
        return
    if not fs.exists(Path(f"{store_path}/.compact_tmp_upto={upto}/_SUCCESS")):
        fs.delete(tmp, True)
        return
    for st in fs.listStatus(Path(store_path)):
        name = st.getPath().getName()
        if name.startswith("epoch=") and int(name.split("=", 1)[1]) <= upto:
            fs.delete(st.getPath(), True)
    # Hadoop FS rename reports failure via its boolean, not an
    # exception. At this point the folded epoch dirs are GONE — a
    # silently failed rename would leave the store missing all
    # compacted history, and batches reading the understated sketch
    # could suppress a true heavy-hitter alert. Raise so the caller
    # (or the next recovery scan) retries the promotion instead.
    if not fs.rename(tmp, Path(f"{store_path}/epoch={upto}")):
        raise IOError(
            f"compaction rename failed: {store_path}/.compact_tmp_upto="
            f"{upto} -> epoch={upto}; folded dirs are already deleted — "
            "the tmp dir holds the complete sum, re-run recovery"
        )


def recover_pending_compactions(spark: SparkSession, store_path: str) -> None:
    """Finish (or discard) any ``.compact_tmp_upto=K`` left by a crash
    in the delete→rename window. Called from the READ side of each
    batch, not only from the next compact call: a monitor batch that
    runs between a crashed compaction and the next compact would
    otherwise read a store missing all compacted history and could
    suppress a true heavy-hitter alert."""
    fs, jvm = _store_fs(spark, store_path)
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(store_path)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(".compact_tmp_upto="):
            _finish_compaction(fs, jvm, store_path, int(name.split("=", 1)[1]))


def _has_part_files(fs, Path, path: str) -> bool:
    """True if ``path`` holds any ``.parquet`` part file, descending
    through partition subdirs (``bucket=B`` layouts) but not through
    ``_temporary``/dot dirs — the flat ``endswith('.parquet')`` check
    would misread a partitioned-but-populated epoch dir as a crashed
    writer's empty mkdir and delete it."""
    for st in fs.listStatus(Path(path)):
        name = st.getPath().getName()
        if st.isDirectory():
            if not name.startswith(("_", ".")) and _has_part_files(
                fs, Path, str(st.getPath())
            ):
                return True
        elif name.endswith(".parquet"):
            return True
    return False


def _compact_epoch_store(
    spark: SparkSession,
    store_path: str,
    upto_epoch: int,
    fold,
    partition_by: list[str] | None = None,
    schema=None,
) -> int:
    """Shared epoch-dir compaction: fold every ``epoch=N`` dir with
    ``N <= upto_epoch`` into ONE dir ``epoch=<upto_epoch>`` whose
    content is ``fold(rows of the folded range)``; returns how many
    dirs were folded (0 if nothing to do).

    The NEWEST epoch dir is never folded (``upto_epoch`` must be
    strictly below it): the newest epoch may be the replay target of a
    batch whose checkpoint commit did not land, and replay relies on
    ``exclude_epoch`` dropping exactly that dir. Crash-safe via the
    ``.compact_tmp`` + ``_SUCCESS`` + delete + rename sequence; an
    interrupted compaction is finished (or discarded, if the tmp write
    never completed) by the next call."""
    fs, jvm = _store_fs(spark, store_path)
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(store_path)
    if not fs.exists(root):
        return 0
    recover_pending_compactions(spark, store_path)
    epochs = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("epoch=")
    )
    if not epochs:
        return 0
    if upto_epoch >= epochs[-1]:
        raise ValueError(
            f"compact upto_epoch={upto_epoch} must be strictly below the "
            f"newest epoch {epochs[-1]} — the newest dir may be an "
            "uncommitted batch's replay target"
        )
    fold_epochs = [e for e in epochs if e <= upto_epoch]
    if len(fold_epochs) < 2:
        return 0
    # A dir with zero part files (a writer that died between mkdir and
    # its first file) would break schema inference; it holds no rows,
    # so folding it means deleting it.
    readable = [
        e
        for e in fold_epochs
        if _has_part_files(fs, Path, f"{store_path}/epoch={e}")
    ]
    if not readable:
        # Every foldable dir is a crashed writer's empty mkdir: there
        # are no rows to fold, but leaving the dirs would accumulate
        # them forever on a store that only ever crashes — delete them
        # outright (they hold nothing, so no tmp/rename dance needed).
        for e in fold_epochs:
            fs.delete(Path(f"{store_path}/epoch={e}"), True)
        return len(fold_epochs)
    if schema is not None:
        # Pinned-schema per-dir union (the shared mixed-layout reader,
        # _store.read_epoch_dirs_union): a store mixing flat (legacy
        # writer version) and partition-subdir epoch layouts defeats
        # the multi-path discovery read below with
        # CONFLICTING_PARTITION_COLUMN_NAMES; reading each dir
        # independently cannot conflict, and the pinned schema fills
        # layout columns a legacy dir lacks with NULL for the fold to
        # migrate (bm25's bucket recompute).
        from ._store import read_epoch_dirs_union

        src = read_epoch_dirs_union(
            spark, store_path, schema, epochs=set(readable)
        ).drop("epoch")
    else:
        src = spark.read.option("basePath", store_path).parquet(
            *[f"{store_path}/epoch={e}" for e in readable]
        )
    folded = fold(src)
    writer = folded.write.mode("overwrite")
    if partition_by:
        # Stores with a partition-local at-rest layout (bm25_ingest's
        # term buckets) keep it through compaction so the read side's
        # partition pruning survives the fold.
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{store_path}/.compact_tmp_upto={upto_epoch}")
    _finish_compaction(fs, jvm, store_path, upto_epoch)
    return len(fold_epochs)


def compact_sketch_store(
    spark: SparkSession, store_path: str, upto_epoch: int
) -> int:
    """Fold committed sketch epoch dirs into a single cell-summed dir.

    CMS cells add, so the compacted sketch is bit-identical to the
    multi-dir merge the monitor computes per batch — estimates and
    alerts are unchanged; only the dir count (and the per-batch
    prior-merge scan) shrinks."""

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .select(
                F.col("row_idx").cast("int"),
                F.col("bucket").cast("long"),
                F.col("cnt").cast("long"),
            )
        )

    return _compact_epoch_store(spark, store_path, upto_epoch, fold)


def compact_alerts_store(
    spark: SparkSession, alerts_path: str, upto_epoch: int
) -> int:
    """Fold committed alerts epoch dirs into one dir — each key alerts
    exactly once, so the epoch dirs are disjoint and the fold is plain
    concatenation (drop the partition column, keep the rows). Without
    this the per-batch "ever alerted" anti-join scan lists O(n_epochs)
    mostly-empty dirs forever — the same growth compact_sketch_store
    eliminates for the sketch side."""

    def fold(df: DataFrame) -> DataFrame:
        return df.drop("epoch")

    return _compact_epoch_store(spark, alerts_path, upto_epoch, fold)


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
        # A crash inside a compaction's delete→rename window leaves the
        # compacted history only in the tmp dir; promote it BEFORE this
        # batch reads the store, or the merged sketch understates and a
        # true heavy hitter can slip below threshold.
        recover_pending_compactions(self.spark, self.store_path)
        recover_pending_compactions(self.spark, self.alerts_path)
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
        # A key alerts ONCE — the first epoch a batch sees its estimate
        # at-or-above threshold. "Ever alerted" comes from the alerts
        # store itself (excluding the current epoch, so a crash-replay
        # recomputes the identical alert set): unlike a prior-vs-now
        # crossing test, a key whose estimate was pushed over threshold
        # by collision mass while it was absent from batches still
        # alerts on its next appearance. The alerts store is bounded by
        # the number of distinct heavy hitters, and the anti-join side
        # is the batch's distinct keys — both small.
        from ._store import read_epoch_store

        alerts_schema = T.StructType(
            [
                T.StructField(
                    self.key_col, batch_df.schema[self.key_col].dataType
                ),
                T.StructField("cms_estimate", T.LongType()),
            ]
        )
        already_alerted = read_epoch_store(
            self.spark, self.alerts_path, alerts_schema, exclude_epoch=epoch_id
        ).select(self.key_col)
        hitters = est_now.filter(
            F.col("cms_estimate") >= self.threshold
        ).join(already_alerted, self.key_col, "left_anti")
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

"""Streaming dedup-at-ingest: gate every arriving micro-batch of
documents against a persisted corpus signature store, admit only unique
docs, and grow the store with the survivors.

This is the crawl-ingest pattern at 100 TB: the accepted corpus is never
re-read or re-hashed — its durable artifact is text-free: minhash
signatures, per-doc content digests, and 12-hex shingle digests (no raw
text or raw shingles anywhere in the store; ~12 bytes per shingle, a
fraction of the documents themselves). Each batch:

1. reads the store (signatures + digests),
2. classifies the batch via ``incremental_dedup_status`` (exact digest
   semi-join, LSH band join vs the store, digest-set Jaccard verify,
   min-id dedup within batch),
3. appends only ``unique`` docs to the sink,
4. appends the survivors' signature rows to the store, so every later
   batch — in this run or the next — dedups against them too.

Idempotency mirrors ``ingest_stream``: sink and store writes are both
epoch-addressed directories with overwrite semantics, and classification
always reads the store WITH THE CURRENT EPOCH EXCLUDED — so a replayed
epoch (driver death between the store write and the checkpoint commit)
sees exactly the store state the first attempt saw and rewrites the same
``epoch=N`` dirs with identical content.

Lifecycle invariant (shared by every epoch-addressed scheme, including
``ingest_stream``'s sink): the checkpoint, the store, and the sink are
ONE unit. Deleting the checkpoint while keeping the store/sink restarts
epoch ids at 0, which both defeats the current-epoch exclusion and
overwrites historical ``epoch=N`` dirs — wipe or archive all three
together. Stores written by a pre-digest version of this module (raw
shingles) are incompatible with the digest comparison and must be
rebuilt.

Optional CDC chunk gate (``cdc_store_path``): content-defined chunk
digests (operators.dedup.cdc_chunks — LBFS/rsync hash-mod boundaries)
of every ADMITTED doc persist alongside the signatures, and a batch doc
sharing >= ``cdc_min_chunks`` distinct chunk hashes with the store is
rejected as ``chunk_dup`` even when the whole-document gates miss it.
This is the chunk-aligned verbatim-reuse modality: a re-delivered
document with a large prepended banner drops its shingle Jaccard below
the LSH threshold and changes its content digest, but CDC boundaries
are decided by content, so every chunk after the insertion point keeps
its hash — exactly the robustness the batch ``cdc_chunks`` operator is
test-pinned for, now enforced at ingest. The CDC store follows the same
epoch protocol (idempotent overwrite, current-epoch exclusion) and is
one unit with the others.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import dedup as D


def _store_schema(num_hashes: int, id_col: str = "doc_id") -> T.StructType:
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("shingles", T.ArrayType(T.StringType())),
    ] + [T.StructField(f"sig_{j}", T.StringType()) for j in range(num_hashes)]
    fields.append(T.StructField("content_hash", T.StringType()))
    return T.StructType(fields)


def read_signature_store(
    spark: SparkSession,
    path: str,
    num_hashes: int = 8,
    id_col: str = "doc_id",
    exclude_epoch: int | None = None,
) -> DataFrame:
    """The store, or an empty frame when it does not exist yet. Only the
    missing-path case maps to empty — any other read error must propagate
    (an empty-on-error fallback would silently re-admit duplicates).

    ``exclude_epoch`` drops one epoch's rows from the view. The gate MUST
    pass the epoch it is currently processing: if a prior attempt of the
    same epoch crashed after writing the store but before the checkpoint
    commit, the replay would otherwise see its own admitted docs in the
    store, classify them all as exact duplicates, and overwrite the sink
    and store epoch dirs with empty frames — silently losing the batch."""
    from pyspark.errors import AnalysisException

    schema = _store_schema(num_hashes, id_col)
    cols = [f.name for f in schema.fields]
    try:
        df = spark.read.schema(schema).parquet(path)
        # `epoch` is the virtual hive-partition column of the store
        # layout; pruning on it never scans the excluded epoch. It is
        # absent when the path exists but no epoch dir ever committed a
        # part file (crashed first write, pre-created dir) — nothing to
        # exclude then, and filtering would crash the recovery path.
        if exclude_epoch is not None and "epoch" in df.columns:
            df = df.filter(F.col("epoch") != exclude_epoch)
        # select() drops the partition column so the store frame's schema
        # is identical whether the store exists or not.
        return df.select(cols)
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            return spark.createDataFrame([], schema)
        raise


_CDC_SCHEMA = T.StructType([T.StructField("chunk_hash", T.StringType())])


def read_cdc_store(
    spark: SparkSession, path: str, exclude_epoch: int | None = None
) -> DataFrame:
    """The accumulated chunk-hash store (one ``chunk_hash`` column, 32
    hex chars per row — text-free like the signature store), or an empty
    frame when it does not exist yet; same missing-path-only fallback
    and current-epoch exclusion contract as :func:`read_signature_store`."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(_CDC_SCHEMA).parquet(path)
        if exclude_epoch is not None and "epoch" in df.columns:
            df = df.filter(F.col("epoch") != exclude_epoch)
        return df.select("chunk_hash")
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            return spark.createDataFrame([], _CDC_SCHEMA)
        raise


@dataclass
class DedupIngest:
    """availableNow-drained streaming ingest with an LSH dedup gate and
    an optional CDC chunk-reuse gate (``cdc_store_path``)."""

    spark: SparkSession
    store_path: str
    sink_path: str
    checkpoint_path: str
    id_col: str = "doc_id"
    text_col: str = "text"
    num_hashes: int = 8
    band_size: int = 2
    threshold: float = 0.4
    shingle_n: int = 3
    # CDC chunk gate: None disables (the pre-round-8 behavior). A doc
    # sharing >= cdc_min_chunks DISTINCT chunk hashes with the store is
    # chunk_dup. min_chunks=3 at the divisor-32 default means ~96+
    # verbatim chars chunk-aligned shared — deliberate reuse, not a
    # common phrase.
    cdc_store_path: str | None = None
    cdc_k: int = 8
    cdc_divisor: int = 32
    cdc_min_chunks: int = 3

    def _classify(
        self, batch_df: DataFrame, exclude_epoch: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """(status, survivors) for one batch against the current store."""
        store = read_signature_store(
            self.spark,
            self.store_path,
            self.num_hashes,
            self.id_col,
            exclude_epoch=exclude_epoch,
        )
        status = D.incremental_dedup_status(
            None,
            batch_df,
            id_col=self.id_col,
            text_col=self.text_col,
            num_hashes=self.num_hashes,
            band_size=self.band_size,
            threshold=self.threshold,
            shingle_n=self.shingle_n,
            corpus_sigs=store,
            corpus_hashes=store.select("content_hash"),
            corpus_shingles_hashed=True,
        )
        if self.cdc_store_path is not None:
            # Chunk gate, applied AFTER the whole-doc gates (precedence:
            # exact > near-corpus > near-batch > chunk_dup — a doc the
            # cheaper gates already killed keeps its verdict). Join
            # shape: the batch's chunk hashes against the store on
            # chunk_hash — the batch side is micro-batch-bounded, so the
            # matched rows (not the store) size the shuffle; at real
            # scale bucket the store by chunk_hash like the BM25 term
            # store.
            cdc_store = read_cdc_store(
                self.spark, self.cdc_store_path, exclude_epoch=exclude_epoch
            )
            hits = (
                self._batch_chunks(batch_df)
                .join(cdc_store, "chunk_hash")
                .groupBy(self.id_col)
                .agg(F.countDistinct("chunk_hash").alias("_n_shared"))
                .filter(F.col("_n_shared") >= self.cdc_min_chunks)
                .select(self.id_col)
                .withColumn("_chunk_dup", F.lit(True))
            )
            status = status.join(hits, self.id_col, "left").select(
                self.id_col,
                F.when(
                    (F.col("verdict") == "unique") & F.col("_chunk_dup"),
                    F.lit("chunk_dup"),
                )
                .otherwise(F.col("verdict"))
                .alias("verdict"),
            )
        survivors = batch_df.join(
            status.filter(F.col("verdict") == "unique").select(self.id_col),
            self.id_col,
            "left_semi",
        )
        return status, survivors

    def _batch_chunks(self, df: DataFrame) -> DataFrame:
        return D.cdc_chunks(
            df,
            id_col=self.id_col,
            text_col=self.text_col,
            k=self.cdc_k,
            divisor=self.cdc_divisor,
        ).select(self.id_col, "chunk_hash")

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """One epoch: classify → write sink epoch dir → grow the store.

        A method (not a closure) so recovery tests can wrap it with fault
        injection at the exact crash window the design targets — after
        both writes, before the checkpoint commit."""
        # Excluding the current epoch makes a crash-replay of this
        # epoch classify against exactly the store state the first
        # attempt saw — replay-identical, so the epoch-dir overwrites
        # are true no-ops instead of data loss.
        _, survivors = self._classify(batch_df, exclude_epoch=epoch_id)
        survivors.write.mode("overwrite").parquet(
            f"{self.sink_path}/epoch={epoch_id}"
        )
        # minhash_signatures projects down to (id, shingles, sig_*);
        # keep only shingle DIGESTS (the store holds no raw text) and
        # re-attach the content digest with a batch-sized join.
        new_sigs = (
            D.minhash_signatures(
                survivors, self.id_col, self.text_col, self.num_hashes, self.shingle_n
            )
            .withColumn("shingles", D.shingle_digests_col(F.col("shingles")))
            .join(
                survivors.select(
                    self.id_col, F.md5(F.col(self.text_col)).alias("content_hash")
                ),
                self.id_col,
            )
        )
        # Column order must match the store schema read.
        new_sigs.select(
            [f.name for f in _store_schema(self.num_hashes, self.id_col).fields]
        ).write.mode("overwrite").parquet(f"{self.store_path}/epoch={epoch_id}")
        if self.cdc_store_path is not None:
            # Distinct per epoch keeps the store minimal; a hash already
            # present from an earlier epoch just adds one row (the gate
            # only tests existence). Same epoch-addressed idempotent
            # overwrite as the other two writes.
            self._batch_chunks(survivors).select(
                "chunk_hash"
            ).distinct().write.mode("overwrite").parquet(
                f"{self.cdc_store_path}/epoch={epoch_id}"
            )
        D.unpersist_all()

    def start(
        self,
        source_glob: str,
        schema: T.StructType,
        max_files_per_trigger: int | None = None,
    ):
        """Drain available files through the gate. ``max_files_per_trigger``
        bounds each micro-batch (backpressure at scale: a 10k-file backlog
        becomes many bounded batches, and each batch's admissions are in
        the store before the next batch classifies — foreachBatch runs
        epochs sequentially)."""
        reader = self.spark.readStream.schema(schema).option(
            "pathGlobFilter", "*.parquet"
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(source_glob)
        return (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )

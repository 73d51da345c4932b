"""Streaming BM25 index maintenance: an availableNow-drained stream of
documents keeps a searchable inverted index current — the retrieval
twin of ``vector_ingest`` (which maintains the ANN index) built on the
batch merge proof of ``operators.text.bm25_merge_index``.

The 100 TB shape: each arriving micro-batch builds its OWN index parts
(``bm25_build_index`` — one batch-bounded shuffle, the batch never
joins the accumulated store) and appends them as the epoch's store
dirs. Because the merged index over disjoint document sets equals a
full rebuild bit-for-bit (postings are per-(doc, term) rows; df and
corpus stats are exactly-additive integer sums — pinned by
tests/test_retrieval_semdedup.py), the accumulated store needs no
read-modify-write: the global df derives from the stored postings at
search time (``groupBy(term).count`` — docs are disjoint across
epochs, so the count IS the sum of per-epoch dfs) and the corpus stats
are an integer SUM over the per-epoch stats sidecar (which also counts
zero-token documents that produce no postings rows).

Search is :func:`operators.text.bm25_search_indexed` over the
accumulated parts — the same shared scoring tail as the batch query
surface, so streamed-index results are bit-identical to a batch
rebuild over the same documents (pinned end-to-end by
tests/test_streaming.py).

Disjointness contract: batches must not re-deliver a doc_id — upstream
this is exactly what the file-source checkpoint (exactly-once file
tracking, see ``ingest_stream``) guarantees; content-level duplicates
are the dedup gates' job (``dedup_ingest``), run BEFORE indexing.
Idempotency (same unit rule as every gate here): the store write is an
epoch-addressed overwrite, so a crash between the store write and the
checkpoint commit replays to byte-identical epoch dirs — the
checkpoint and the store are one unit, wipe both or neither. Unlike
the gated stores, a replayed batch here has no read-dependence on the
store at all, so no ``exclude_epoch`` dance is needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.text import bm25_build_index, bm25_search_indexed


# bm25_build_index canonicalizes the id column to "doc_id" whatever the
# caller's id_col is, so the store schema is fixed.
_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
    ]
)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_len", T.LongType()),
    ]
)


@dataclass
class Bm25IndexIngest:
    """availableNow-drained streaming inverted-index builder."""

    spark: SparkSession
    store_path: str
    checkpoint_path: str
    id_col: str = "doc_id"
    text_col: str = "text"

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # Persist the batch for the duration of the two writes — the
        # postings and stats lineages would otherwise each re-read the
        # epoch's source files.
        batch_df = batch_df.persist()
        try:
            # Replay of an ALREADY-COMMITTED epoch (crash after both
            # writes but before the checkpoint commit): un-commit first
            # — delete the stats witness BEFORE the postings overwrite
            # tears the epoch dir down, or a concurrent/interrupted
            # search would see the witness and score missing postings.
            from ..fsutil import hadoop_fs

            witness = f"{self.store_path}/stats/epoch={epoch_id}"
            fs, jvm = hadoop_fs(self.spark, witness)
            wpath = jvm.org.apache.hadoop.fs.Path(witness)
            if fs.exists(wpath) and not fs.delete(wpath, True):
                raise IOError(f"could not un-commit epoch witness {witness}")
            postings, _dfreq, stats = bm25_build_index(
                batch_df, self.id_col, self.text_col
            )
            # df is NOT stored: it derives exactly from the accumulated
            # postings at read time (disjoint docs), so there is no
            # second store to keep transactionally in step with the
            # first. The stats sidecar IS stored — zero-token docs leave
            # no postings row but must still count toward N/total_len —
            # and it is written LAST as the epoch's COMMIT WITNESS:
            # readers only see epochs whose stats row exists, so a crash
            # between the two writes leaves a torn epoch INVISIBLE (not
            # silently half-scored) until the checkpoint replays it.
            # The id is cast long to honor the pinned store schema for
            # any numeric id_col (int32 ids would otherwise desync the
            # reader's LongType pin).
            postings.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                "term",
                "tf",
                "dl",
            ).write.mode("overwrite").parquet(
                f"{self.store_path}/postings/epoch={epoch_id}"
            )
            stats.write.mode("overwrite").parquet(
                f"{self.store_path}/stats/epoch={epoch_id}"
            )
        finally:
            batch_df.unpersist()

    def start(
        self,
        source_glob: str,
        schema: T.StructType,
        max_files_per_trigger: int | None = None,
    ):
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

    def _committed(self) -> tuple[DataFrame, DataFrame]:
        """Accumulated (postings, 1-row corpus stats) restricted to
        COMMITTED epochs — those whose stats sidecar (written last, the
        commit witness) exists. A torn epoch (crash between the two
        writes) is invisible until its replay completes both halves."""
        from ._store import read_epoch_store

        postings = read_epoch_store(
            self.spark,
            f"{self.store_path}/postings",
            _POSTINGS_SCHEMA,
            keep_epoch=True,
        )
        epoch_stats = read_epoch_store(
            self.spark, f"{self.store_path}/stats", _STATS_SCHEMA, keep_epoch=True
        )
        committed = epoch_stats.select("epoch").distinct()
        postings = postings.join(F.broadcast(committed), "epoch").drop("epoch")
        stats = epoch_stats.agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_len").cast("long").alias("total_len"),
        )
        return postings, stats

    def read_index(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        """The accumulated (postings, dfreq, stats) — the exact shape
        ``bm25_build_index`` returns for the union corpus. The
        full-vocabulary dfreq here is the INDEX shape; interactive
        searches should use :meth:`search`, which derives df from the
        query-restricted postings instead of shuffling the whole
        store's vocabulary."""
        postings, stats = self._committed()
        dfreq = postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        )
        return postings, dfreq, stats

    def search(self, terms: DataFrame, k: int = 10) -> DataFrame:
        """BM25 top-k over the accumulated index — bit-identical to a
        batch rebuild over the same documents. The broadcast query
        vocabulary restricts the postings BEFORE the df aggregate, so a
        search's shuffle is bounded by query-term hits, never the
        accumulated vocabulary (df restricted to the searched terms
        equals the full-vocabulary df for those terms — disjoint docs;
        same equivalence the batch paths pin)."""
        postings, stats = self._committed()
        tset = terms.select("term").distinct()
        matched = postings.join(F.broadcast(tset), "term")
        dfreq = matched.groupBy("term").agg(
            F.count("*").cast("long").alias("df")
        )
        return bm25_search_indexed(matched, dfreq, stats, terms, k=k)

"""Structured-Streaming ingest: availableNow drain, checkpointed
exactly-once file tracking, foreachBatch clean+sink+marker."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cig_etl_s3_to_sql_data_ingestor_spark.catalog import ColumnSpec, TableSpec
from cig_etl_s3_to_sql_data_ingestor_spark.operators.marker import ParquetMarkerLedger
from cig_etl_s3_to_sql_data_ingestor_spark.streaming.ingest_stream import (
    StreamingIngest,
    windowed_event_counts,
)

SPEC = TableSpec(
    target_name="HOST_CIG_Stream",
    source="Stream",
    columns=(
        ColumnSpec("ID", "str", True),
        ColumnSpec("Name", "str", False),
        ColumnSpec("Environment", "str", True),
        ColumnSpec("CIGCopyTime", "str", True),
        ColumnSpec("CIGProcessed", "str", True),
    ),
)

SCHEMA = T.StructType(
    [T.StructField("ID", T.StringType()), T.StructField("Name", T.StringType())]
)


def drop_file(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, name)
    )


def test_streaming_ingest_availablenow(spark, tmp_path):
    src = str(tmp_path / "src")
    ingest = StreamingIngest(
        spark=spark,
        table=SPEC,
        schema=SCHEMA,
        environment="NL_Hosting_Mailbox",
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt"),
        marker_path=str(tmp_path / "marker"),
        ingestion_date=dt.date(2024, 1, 5),
    )
    drop_file(spark, src, "f1.parquet", [("a", "x"), ("nan", "y")])
    q = ingest.start(src + "/*")
    q.awaitTermination(120)
    sunk = spark.read.parquet(str(tmp_path / "sink"))
    assert sunk.count() == 2
    row = sunk.filter(F.col("Name") == "x").first()
    assert row["Environment"] == "NL" and row["CIGCopyTime"] == "2024-01-05"

    # second drain with no new files: checkpoint prevents reprocessing
    q2 = ingest.start(src + "/*")
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 2

    # new file → only it is processed
    drop_file(spark, src, "f2.parquet", [("b", "z")])
    q3 = ingest.start(src + "/*")
    q3.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 3

    ledger = ParquetMarkerLedger(spark, str(tmp_path / "marker"))
    assert ledger.read().count() >= 2  # both source files recorded


def test_windowed_event_counts_streaming_memory_sink(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_events

    # Batch parity first: the same function works on a static frame.
    batch = load_events(spark, sf_dir)
    static = windowed_event_counts(batch)
    assert static.count() > 0

    # Then as a real stream: write the (µs-normalized) events out and
    # stream them back through the same aggregation into a memory sink.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        batch.write.parquet(d + "/ev")
        stream = spark.readStream.schema(batch.schema).parquet(d + "/ev")
        agg = windowed_event_counts(stream)
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("win_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n = spark.sql("SELECT count(*) FROM win_counts").first()[0]
        # append mode only emits windows closed by the watermark; the
        # final open window stays buffered — compare against that.
        closed = static.count()
        assert n >= closed - 24  # at most the last day's windows open


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10 + minute // 60, minute % 60)


def drop_events(spark, src_dir, name, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src_dir, name))


def test_stateful_sessionize_stream(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src + "/*")
        q = (
            sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return spark.read.parquet(str(tmp_path / "out")).collect()
        except Exception:
            return []

    # Batch 1: user 1 has two sessions separated by a >30min gap (first
    # closes in-batch); user 2 has one open session.
    drop_events(
        spark,
        src,
        "b1.parquet",
        [
            (1, 1, _ts(0)),
            (2, 1, _ts(10)),
            (3, 1, _ts(50)),  # 40min gap -> closes session 1
            (4, 2, _ts(5)),
        ],
    )
    rows = drain()
    closed = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 2) in closed, rows  # user 1's first session closed by gap
    # User 2's gap deadline (10:35) is already behind the batch-1
    # watermark (10:49), so the availableNow run's timeout batch flushes
    # it; user 1's second session (deadline 11:20) must stay open.
    assert (2, 1) in closed, rows
    assert (1, 1) not in closed, rows

    # Batch 2: much later events advance the watermark past the
    # remaining open session's deadline -> state flushes via event-time
    # timeout, across runs through the checkpoint.
    drop_events(spark, src, "b2.parquet", [(5, 3, _ts(600))])
    rows = drain()
    closed = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 1) in closed, rows  # user 1's second session timed out


def test_dedup_stream_within_watermark(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "src")
    drop_events(
        spark,
        src,
        "d1.parquet",
        [(1, 1, _ts(0)), (1, 1, _ts(0)), (2, 1, _ts(1)), (2, 1, _ts(2)), (3, 2, _ts(3))],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src + "/*")
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r[0] for r in spark.sql("SELECT event_id FROM dedup_out").collect()]
    assert sorted(ids) == [1, 2, 3]


def test_stream_stream_attribution_join(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.stateful import (
        attribute_stream,
    )

    EVENT_VAL_SCHEMA = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    spark.createDataFrame(
        [
            (1, 1, _ts(0), 0.0),     # click 10:00 — inside window
            (2, 1, _ts(50), 0.0),    # click 10:50 — inside window
            (3, 1, _ts(200), 0.0),   # click 13:20 — after purchase
            (4, 2, _ts(0), 0.0),     # other user
        ],
        EVENT_VAL_SCHEMA,
    ).coalesce(1).write.parquet(os.path.join(csrc, "c1.parquet"))
    spark.createDataFrame(
        [(10, 1, _ts(60), 9.99)],    # purchase 11:00, window [10:00, 11:00]
        EVENT_VAL_SCHEMA,
    ).coalesce(1).write.parquet(os.path.join(psrc, "p1.parquet"))

    clicks = spark.readStream.schema(EVENT_VAL_SCHEMA).parquet(csrc + "/*")
    purchases = spark.readStream.schema(EVENT_VAL_SCHEMA).parquet(psrc + "/*")
    q = (
        attribute_stream(clicks, purchases)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT purchase_id, click_id FROM attrib").collect()
    got = sorted((r["purchase_id"], r["click_id"]) for r in rows)
    assert got == [(10, 1), (10, 2)], got


def test_dedup_ingest_gate_across_batches(spark, tmp_path):
    """Streaming LSH dedup gate: batch 2's exact and near duplicates of
    batch 1 docs are rejected via the persisted signature store; the
    checkpoint makes the second drain see only new files."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
        read_signature_store,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    batch1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            # in-batch near-dup of doc 2 -> rejected within the batch
            (3, "pack my box with five dozen liquor jugs tonight"),
        ],
        schema,
    )
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2]

    batch2 = spark.createDataFrame(
        [
            # exact duplicate of accepted doc 1 -> rejected via digest
            (10, "the quick brown fox jumps over the lazy dog"),
            # near-dup of accepted doc 2 -> rejected via the LSH store
            (11, "pack my box with five dozen liquor jugs yesterday"),
            (12, "a genuinely novel document about streaming ingest gates"),
        ],
        schema,
    )
    batch2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 12]
    # The store grew by exactly the admitted docs and dedups future runs.
    store = read_signature_store(spark, str(tmp_path / "store"))
    assert sorted(r.doc_id for r in store.select("doc_id").collect()) == [1, 2, 12]


def test_dedup_ingest_sequential_batches_within_one_drain(spark, tmp_path):
    """With maxFilesPerTrigger=1 a single drain runs multiple sequential
    epochs; a later batch must dedup against docs the EARLIER batch in
    the same drain just admitted to the store."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    # Two files present BEFORE the drain; file order follows path order.
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], schema
    ).coalesce(1).write.parquet(str(src / "a_first"))
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "an entirely different second document here"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "b_second"))

    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    ingest.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(120)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    got = sorted(r.doc_id for r in accepted.collect())
    # Doc 10 (exact dup of doc 1, admitted one epoch earlier) rejected.
    assert got == [1, 11]
    # Two epochs really ran.
    import glob

    assert len(glob.glob(f"{tmp_path}/accepted/epoch=*")) == 2


def test_dedup_ingest_replay_excludes_own_epoch(spark, tmp_path):
    """Crash-replay safety: when an epoch's store write survived a crash
    but the checkpoint commit did not, reclassifying that epoch must
    EXCLUDE its own store rows — otherwise its docs match their own
    digests and the replay overwrites the epoch dirs with empty frames."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], schema
    )
    # Simulate the crash window: materialize what epoch 0 wrote to the
    # store before the checkpoint commit was lost.
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D

    sigs = (
        D.minhash_signatures(batch)
        .withColumn("shingles", D.shingle_digests_col(F.col("shingles")))
        .join(batch.select("doc_id", F.md5(F.col("text")).alias("content_hash")), "doc_id")
    )
    sigs.write.mode("overwrite").parquet(str(tmp_path / "store" / "epoch=0"))
    D.unpersist_all()

    # Replay of epoch 0: its own rows must not count as corpus.
    status_replay, survivors_replay = ingest._classify(batch, exclude_epoch=0)
    assert [r.verdict for r in status_replay.collect()] == ["unique"]
    assert survivors_replay.count() == 1
    D.unpersist_all()
    # A LATER epoch classifying the same text must see it as exact_dup.
    status_next, _ = ingest._classify(batch, exclude_epoch=1)
    assert [r.verdict for r in status_next.collect()] == ["exact_dup"]
    D.unpersist_all()


def test_dedup_ingest_soak_with_midstream_crash_recovery(spark, tmp_path):
    """Soak + crash drill: six micro-batches through the gate, with a
    REAL driver-death simulation at epoch 3 — the exact failure the
    epoch-idempotence design targets (crash AFTER the sink and store
    writes, BEFORE the checkpoint commit). The restarted stream must
    replay epoch 3 identically and continue, with no lost or duplicate
    admissions, and the signature store must grow by exactly the
    admitted docs each epoch."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
        read_signature_store,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    # Six files -> six sequential epochs (maxFilesPerTrigger=1). Every
    # even batch introduces one novel doc + one dup of an earlier epoch's
    # doc; odd batches are all-novel.
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "pack my box with five dozen liquor jugs today",
        3: "sphinx of black quartz judge my vow tonight",
        4: "how vexingly quick daft zebras jump around",
        5: "bright vixens jump while dozy fowl quack loudly",
        6: "jackdaws love my big sphinx of quartz forever",
    }
    batches = [
        [(1, texts[1])],
        [(2, texts[2]), (10, texts[1])],  # 10 = exact dup of epoch-0's doc
        [(3, texts[3])],
        [(4, texts[4]), (11, texts[2])],  # 11 = dup of epoch 1's doc
        [(5, texts[5])],
        [(6, texts[6]), (12, texts[3])],  # 12 = dup of epoch 2's doc
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )

    class CrashAfterWrites(DedupIngest):
        """Injects the targeted fault once: epoch 3 completes both epoch-
        dir writes, then the 'driver' dies before the commit."""

        def _process_batch(self, batch_df, epoch_id):
            super()._process_batch(batch_df, epoch_id)
            if epoch_id == 3:
                raise RuntimeError("injected driver death before checkpoint commit")

    paths = dict(
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        # r8: the CDC chunk store rides the same crash/replay drill —
        # outcome-neutral here (the dups are EXACT dups, caught before
        # the chunk gate; the novel docs share < 3 chunks) but its
        # epoch writes and replay exclusion go through the same window.
        cdc_store_path=str(tmp_path / "cdc"),
    )
    crashing = CrashAfterWrites(spark, **paths)
    q = crashing.start(f"{src}/*", schema, max_files_per_trigger=1)
    died = None
    try:
        q.awaitTermination(240)
    except Exception as ex:  # StreamingQueryException wrapping the fault
        died = ex
    assert died is not None and "injected driver death" in str(died)

    # The crash window is real: epoch 3's writes landed, no commit after.
    assert (tmp_path / "accepted" / "epoch=3").exists()
    store_after_crash = read_signature_store(spark, paths["store_path"])
    # Epochs 0-2 committed one admission each (dup 10/11 rejected), and
    # epoch 3's UNCOMMITTED store write (doc 4) is also on disk.
    assert sorted(
        r.doc_id for r in store_after_crash.select("doc_id").collect()
    ) == [1, 2, 3, 4]

    # Restart with a fresh (non-crashing) instance on the same
    # checkpoint+store+sink unit: epoch 3 replays, 4 and 5 follow.
    recovered = DedupIngest(spark, **paths)
    recovered.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 3, 4, 5, 6]
    assert len(glob.glob(f"{tmp_path}/accepted/epoch=*")) == 6
    # Store grew by exactly the admissions, one epoch dir per batch,
    # and dedups the whole history (every dup doc 10/11/12 rejected).
    store = read_signature_store(spark, paths["store_path"])
    assert sorted(r.doc_id for r in store.select("doc_id").collect()) == [
        1, 2, 3, 4, 5, 6,
    ]
    per_epoch = {
        int(p.rsplit("=", 1)[1]): spark.read.parquet(p).count()
        for p in glob.glob(f"{tmp_path}/store/epoch=*")
    }
    assert per_epoch == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    # The CDC chunk store followed the same protocol through the crash:
    # one epoch dir per batch, each holding the admitted doc's chunk
    # hashes, and the epoch-3 replay overwrote (not duplicated) its dir.
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        read_cdc_store,
    )

    assert len(glob.glob(f"{tmp_path}/cdc/epoch=*")) == 6
    cdc = read_cdc_store(spark, paths["cdc_store_path"])
    assert cdc.count() == cdc.distinct().count() > 0


def test_signature_store_read_survives_partitionless_dir(spark, tmp_path):
    """A store path that exists but holds no committed epoch partitions
    (crashed first write, pre-created dir) must read as empty even with
    an exclude_epoch — not crash on the missing partition column."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        read_signature_store,
    )

    store = tmp_path / "store"
    store.mkdir()
    got = read_signature_store(spark, str(store), exclude_epoch=0)
    assert got.count() == 0


def test_quality_monitor_stream(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.quality_monitor import (
        quality_monitor_stream,
    )

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )
    good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    bad = "$$$ !!! ###"
    ts0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, good, "crawlA", ts0),
        (2, good, "crawlA", ts0 + dt.timedelta(minutes=1)),
        (3, bad, "crawlB", ts0 + dt.timedelta(minutes=2)),
        (4, good, "crawlB", ts0 + dt.timedelta(minutes=3)),
        # late window-closer: pushes the watermark past the first window.
        (5, good, "crawlA", ts0 + dt.timedelta(hours=2)),
    ]
    batch = spark.createDataFrame(rows, doc_schema)

    # Batch parity: same operator on a static frame.
    static = {
        (r.source, r.window_start.hour): r
        for r in quality_monitor_stream(batch).collect()
    }
    a = static[("crawlA", 10)]
    b = static[("crawlB", 10)]
    assert a.n_docs == 2 and a.n_below_floor == 0
    assert b.n_docs == 2 and b.n_below_floor == 1
    assert b.below_floor_frac == 0.5

    src = str(tmp_path / "docs")
    batch.write.parquet(src)
    stream = spark.readStream.schema(doc_schema).parquet(src)
    q = (
        quality_monitor_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("qmon")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (r.source, r.window_start.hour): r
        for r in spark.sql("SELECT * FROM qmon").collect()
    }
    # The two 10:00 windows are closed by the 12:00 watermark and emitted
    # with values identical to the batch run.
    for key in (("crawlA", 10), ("crawlB", 10)):
        assert out[key].n_docs == static[key].n_docs
        assert out[key].n_below_floor == static[key].n_below_floor
        assert out[key].mean_quality == static[key].mean_quality


def test_vector_ingest_index_growth_and_search(spark, tmp_path, sf_dir):
    """Streaming IVF-index maintenance: batches of embeddings assign to
    frozen centroids, near-dups (vs index and within batch) are gated,
    the store grows per epoch, and search over the accumulated index
    matches brute force restricted to admitted members."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # Bootstrap: train centroids once on the first 200 vectors.
    cents = S.kmeans_centroids(e.filter(F.col("vec_id") < 200), n_cells=8)
    cents_path = str(tmp_path / "centroids")
    cents.write.parquet(cents_path)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    src = tmp_path / "vecs"
    src.mkdir()
    ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    b1 = e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 260))
    b1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    store1 = read_index_store(spark, str(tmp_path / "index"))
    n1 = store1.count()
    assert n1 == 60  # fixture vectors are distinct — all admitted

    # Batch 2: 20 new vectors, one EXACT copy of an indexed vector
    # (id 9000 dup of 200) and two in-batch exact copies (9001/9002).
    dup_of_indexed = e.filter(F.col("vec_id") == 200).select(
        F.lit(9000).cast("long").alias("vec_id"), "embedding"
    )
    base = e.filter(F.col("vec_id") == 260).select("embedding")
    twin_a = base.select(F.lit(9001).cast("long").alias("vec_id"), "embedding")
    twin_b = base.select(F.lit(9002).cast("long").alias("vec_id"), "embedding")
    b2 = (
        e.filter((F.col("vec_id") >= 261) & (F.col("vec_id") < 280))
        .unionByName(dup_of_indexed)
        .unionByName(twin_a)
        .unionByName(twin_b)
    )
    b2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)

    store2 = read_index_store(spark, str(tmp_path / "index"))
    ids = {r.vec_id for r in store2.select("vec_id").collect()}
    assert 9000 not in ids  # exact dup of indexed vector rejected
    assert 9001 in ids and 9002 not in ids  # lowest-id twin wins
    assert store2.count() == n1 + 20  # 19 novel + the surviving twin

    # Search parity: top-3 over the index with all cells probed must
    # equal brute force restricted to the admitted members.
    queries = e.filter(F.col("vec_id") < 4)
    got = ingest.search(queries, k=3, n_probe=8).orderBy("query_id", "rank")
    corpus = store2.select("vec_id", "embedding")
    want = (
        S.brute_force_topk(corpus, queries, k=3)
        .orderBy("query_id", "rank")
    )
    assert [
        (r.query_id, r.cand_id, r.rank) for r in got.collect()
    ] == [(r.query_id, r.cand_id, r.rank) for r in want.collect()]

    # Idempotent re-drain: no new files -> no new epochs, same count.
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    assert read_index_store(spark, str(tmp_path / "index")).count() == n1 + 20


def test_vector_ingest_crash_replay_excludes_own_epoch(spark, tmp_path, sf_dir):
    """Crash window drill: epoch 0's store rows land but the checkpoint
    commit is lost. The replay (exclude_epoch=0) must NOT see its own
    admissions as index members — otherwise every vector would
    self-reject and the epoch dir would be overwritten empty — while a
    LATER epoch must reject exact re-arrivals of the same vectors."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        _index_schema,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = S.kmeans_centroids(e.filter(F.col("vec_id") < 100), n_cells=4)
    cents_path = str(tmp_path / "centroids")
    cents.write.parquet(cents_path)
    ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    batch = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    # Materialize what epoch 0 wrote before the lost checkpoint commit.
    ingest._admit(batch, exclude_epoch=0).select(
        [f.name for f in _index_schema().fields]
    ).write.mode("overwrite").parquet(str(tmp_path / "index" / "epoch=0"))

    replay = ingest._admit(batch, exclude_epoch=0)
    assert replay.count() == 10  # replay admits everything again
    later = ingest._admit(batch, exclude_epoch=1)
    assert later.count() == 0  # a later epoch sees them as duplicates


def test_vector_ingest_all_duplicate_batch_writes_empty_epoch(spark, tmp_path, sf_dir):
    """A batch consisting entirely of near-dups of indexed vectors must
    admit nothing — the epoch dir is written empty (not skipped, so the
    epoch remains replay-addressable) and the store count is unchanged."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = S.kmeans_centroids(e.filter(F.col("vec_id") < 100), n_cells=4)
    cents_path = str(tmp_path / "centroids")
    cents.write.parquet(cents_path)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    src = tmp_path / "vecs"
    src.mkdir()
    ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    b1 = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    b1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    n1 = read_index_store(spark, str(tmp_path / "index")).count()

    # Batch 2: the same ten vectors under new ids — all rejected.
    b2 = b1.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    b2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    assert read_index_store(spark, str(tmp_path / "index")).count() == n1


def test_asset_ingest_fingerprint_gate_across_batches(spark, tmp_path):
    """Streaming binary-asset dedup: PNG and WAV files fingerprint from
    real decoded content; a re-encoded pixel-identical PNG in a later
    batch is rejected via the persisted store, unknown containers are
    kept-but-classified, and a re-drain admits nothing new."""
    import numpy as np

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
        make_png_codec,
        make_wav_codec,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.asset_ingest import (
        AssetIngest,
        read_asset_store,
    )

    encode_png, _ = make_png_codec()
    encode_wav, _ = make_wav_codec()
    src = tmp_path / "incoming"
    src.mkdir()

    px = ((7 * np.arange(9)[None, :] + 13 * np.arange(6)[:, None]) % 256).astype(
        np.uint8
    )
    (src / "a.png").write_bytes(encode_png(px))
    samples = (np.arange(400) * 997 % 65536 - 32768).astype(np.int16)
    (src / "b.wav").write_bytes(encode_wav(samples))
    (src / "c.dat").write_bytes(b"opaque bytes")

    ingest = AssetIngest(
        spark,
        store_path=str(tmp_path / "store"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    ingest.start(str(src)).awaitTermination(120)
    store = read_asset_store(spark, str(tmp_path / "store"))
    rows = {r.asset_name: (r.kind, r.fingerprint) for r in store.collect()}
    assert rows["a.png"][0] == "png" and rows["a.png"][1].startswith("png:")
    assert rows["b.wav"][0] == "wav" and rows["b.wav"][1].startswith("wav:")
    assert rows["c.dat"][0] == "unknown"
    assert len(rows) == 3

    # Batch 2: the SAME pixels re-encoded with different row filters ->
    # different bytes, same perceptual fingerprint -> rejected. A new
    # image is admitted.
    (src / "a_copy.png").write_bytes(
        encode_png(px, filters=[2] * px.shape[0])
    )
    # NOTE: a uniform brightness shift (px + c without wraparound) keeps
    # the average-hash identical BY DESIGN — that is the perceptual
    # robustness the hash exists for. The genuinely-new image needs a
    # different structure, not a shifted copy.
    d_px = ((17 * np.arange(9)[None, :] + 3 * np.arange(6)[:, None]) % 256).astype(
        np.uint8
    )
    (src / "d.png").write_bytes(encode_png(d_px))
    ingest.start(str(src)).awaitTermination(120)
    store2 = read_asset_store(spark, str(tmp_path / "store"))
    names = {r.asset_name for r in store2.collect()}
    assert "a_copy.png" not in names  # re-encoded duplicate rejected
    assert "d.png" in names
    assert store2.count() == 4

    # Idempotent re-drain.
    ingest.start(str(src)).awaitTermination(120)
    assert read_asset_store(spark, str(tmp_path / "store")).count() == 4


def test_frequency_monitor_cms_across_batches(spark, tmp_path):
    """Streaming CMS maintenance: sketch cells accumulate across epochs
    (bounded store regardless of key cardinality), a key alerts on the
    epoch its CUMULATIVE estimated count crosses the threshold, and the
    overestimate-only property holds vs exact counts."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        FrequencyMonitor,
        read_sketch_store,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    mon = FrequencyMonitor(
        spark,
        store_path=str(tmp_path / "sketch"),
        alerts_path=str(tmp_path / "alerts"),
        checkpoint_path=str(tmp_path / "ckpt"),
        threshold=60,
    )
    # Batch 1: 40 'hot' + 10 'cold' -> below threshold, no alert.
    b1 = [(i, "hot") for i in range(40)] + [(100 + i, "cold") for i in range(10)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    import glob as _glob

    a1 = spark.read.parquet(str(tmp_path / "alerts" / "epoch=0"))
    assert a1.count() == 0

    # Batch 2: +30 'hot' -> cumulative 70 >= 60 -> alert fires now.
    b2 = [(200 + i, "hot") for i in range(30)] + [(300, "cold")]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    a2 = spark.read.parquet(str(tmp_path / "alerts" / "epoch=1"))
    rows = {r.event_type: r.cms_estimate for r in a2.collect()}
    assert set(rows) == {"hot"}
    assert rows["hot"] >= 70  # CMS never underestimates

    # The store stays sketch-sized (<= depth*width cells), not key-sized.
    store = read_sketch_store(spark, str(tmp_path / "sketch"))
    assert store.select("row_idx", "bucket").distinct().count() <= 3 * 1024

    # Batch 3: 'hot' appears again ABOVE threshold cumulatively — but
    # it already crossed in epoch 1, so it must NOT re-alert.
    b3 = [(400, "hot"), (401, "cold")]
    spark.createDataFrame(b3, schema).coalesce(1).write.parquet(str(src / "b3"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    a3 = spark.read.parquet(str(tmp_path / "alerts" / "epoch=2"))
    assert a3.count() == 0, "alert re-fired after its crossing epoch"

    # Idempotent re-drain: no new epochs.
    mon.start(f"{src}/*", schema).awaitTermination(120)
    assert not _glob.glob(str(tmp_path / "alerts" / "epoch=3"))


def test_frequency_monitor_alerts_survive_collision_inflated_prior(
    spark, tmp_path
):
    """The ADVICE-flagged suppression: with heavy collision (width=1,
    every key shares the single CMS cell), other keys' mass pushes a
    victim key's estimate past the threshold during an epoch where the
    victim is ABSENT. A prior-vs-now crossing gate then never fires for
    it; the ever-alerted anti-join gate must still alert on the
    victim's next appearance (never-miss guarantee)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        FrequencyMonitor,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    mon = FrequencyMonitor(
        spark,
        store_path=str(tmp_path / "sketch"),
        alerts_path=str(tmp_path / "alerts"),
        checkpoint_path=str(tmp_path / "ckpt"),
        width=1,  # force total collision: estimate == total event count
        threshold=50,
    )
    # Epoch 0: victim x10 -> estimate 10 < 50, no alert.
    b1 = [(i, "victim") for i in range(10)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "alerts" / "epoch=0")).count() == 0

    # Epoch 1: 60 'other' events, victim ABSENT. Collision mass lifts
    # victim's (unprobed) estimate to 70 >= 50. 'other' itself alerts.
    b2 = [(100 + i, "other") for i in range(60)]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    a1 = {r.event_type for r in spark.read.parquet(
        str(tmp_path / "alerts" / "epoch=1")).collect()}
    assert a1 == {"other"}

    # Epoch 2: victim reappears once. Its prior estimate (70) was
    # already over threshold, so a crossing gate would stay silent
    # forever; the ever-alerted gate must fire now.
    b3 = [(200, "victim")]
    spark.createDataFrame(b3, schema).coalesce(1).write.parquet(str(src / "b3"))
    mon.start(f"{src}/*", schema).awaitTermination(120)
    a2 = {r.event_type for r in spark.read.parquet(
        str(tmp_path / "alerts" / "epoch=2")).collect()}
    assert a2 == {"victim"}, "collision-inflated prior suppressed a true heavy hitter"


def test_frequency_monitor_store_compaction(spark, tmp_path):
    """compact_sketch_store folds committed epoch dirs into one summed
    base sketch: estimates are bit-identical (cells add), the dir count
    shrinks, the newest epoch is protected, and an interrupted tmp
    write (no _SUCCESS) is discarded without touching the store."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        FrequencyMonitor,
        compact_sketch_store,
        read_sketch_store,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.sketches import (
        cms_estimate,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "sketch")
    mon = FrequencyMonitor(
        spark,
        store_path=store,
        alerts_path=str(tmp_path / "alerts"),
        checkpoint_path=str(tmp_path / "ckpt"),
        threshold=1000,
    )
    for i, batch in enumerate(
        (
            [(j, "a") for j in range(7)] + [(50 + j, "b") for j in range(3)],
            [(100 + j, "a") for j in range(5)],
            [(200 + j, "c") for j in range(4)],
        )
    ):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        mon.start(f"{src}/*", schema).awaitTermination(120)

    import glob as _glob

    keys = spark.createDataFrame([("a",), ("b",), ("c",)], ["event_type"])

    def estimates():
        merged = (
            read_sketch_store(spark, store)
            .groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        return {
            r.event_type: r.cms_estimate
            for r in cms_estimate(merged, keys, "event_type").collect()
        }

    before = estimates()
    assert before == {"a": 12, "b": 3, "c": 4}

    # Newest epoch (2) is protected — it may be a replay target.
    with pytest.raises(ValueError, match="strictly below"):
        compact_sketch_store(spark, store, upto_epoch=2)

    # An interrupted tmp write (no _SUCCESS) is discarded, not promoted.
    dead = tmp_path / "sketch" / ".compact_tmp_upto=0"
    dead.mkdir()
    (dead / "part-00000.parquet").write_bytes(b"not parquet")

    assert compact_sketch_store(spark, store, upto_epoch=1) == 2
    assert not dead.exists(), "dead tmp dir must be discarded"
    dirs = sorted(
        p.rsplit("=", 1)[1] for p in _glob.glob(f"{store}/epoch=*")
    )
    assert dirs == ["1", "2"], dirs
    assert estimates() == before, "compaction changed estimates"

    # Idempotent: nothing left to fold below epoch 1.
    assert compact_sketch_store(spark, store, upto_epoch=1) == 0


def test_frequency_monitor_recovers_crashed_compaction_on_read(spark, tmp_path):
    """A crash in compaction's delete→rename window leaves the summed
    history only in ``.compact_tmp_upto=K``. The NEXT monitor batch must
    promote it before reading the store — otherwise the merged sketch
    understates and a true heavy hitter slips below threshold."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        FrequencyMonitor,
        read_sketch_store,
        recover_pending_compactions,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.sketches import (
        cms_estimate,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "sketch")
    mon = FrequencyMonitor(
        spark,
        store_path=store,
        alerts_path=str(tmp_path / "alerts"),
        checkpoint_path=str(tmp_path / "ckpt"),
        threshold=10,
    )
    for i, batch in enumerate(
        (
            [(j, "a") for j in range(7)],
            [(100 + j, "a") for j in range(2)],
            [(200 + j, "c") for j in range(1)],
        )
    ):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        mon.start(f"{src}/*", schema).awaitTermination(120)

    # Simulate the crash window: fold epochs 0..1 into the tmp dir
    # (complete, _SUCCESS present), delete the folded epoch dirs, and
    # DIE before the rename promotes the tmp to epoch=1.
    folded = (
        spark.read.option("basePath", store)
        .parquet(f"{store}/epoch=0", f"{store}/epoch=1")
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            F.col("row_idx").cast("int"),
            F.col("bucket").cast("long"),
            F.col("cnt").cast("long"),
        )
    )
    folded.write.mode("overwrite").parquet(f"{store}/.compact_tmp_upto=1")
    import shutil

    shutil.rmtree(tmp_path / "sketch" / "epoch=0")
    shutil.rmtree(tmp_path / "sketch" / "epoch=1")

    # The raw store now understates: 'a' mass (9) lives only in the tmp.
    keys = spark.createDataFrame([("a",)], ["event_type"])
    raw = (
        read_sketch_store(spark, store)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    understated = {
        r.event_type: r.cms_estimate
        for r in cms_estimate(raw, keys, "event_type").collect()
    }
    assert understated["a"] == 0

    # Next batch: one more 'a'. With recovery, merged a=10 >= 10 →
    # alert; without the read-path recovery the estimate would be 1.
    spark.createDataFrame([(300, "a")], schema).coalesce(1).write.parquet(
        str(src / "b3")
    )
    mon.start(f"{src}/*", schema).awaitTermination(120)
    alerts = {
        r.event_type
        for r in spark.read.parquet(
            str(tmp_path / "alerts" / "epoch=3")
        ).collect()
    }
    assert alerts == {"a"}, (
        "crashed compaction's history was not recovered on the read path"
    )
    assert not (tmp_path / "sketch" / ".compact_tmp_upto=1").exists()

    # Direct recovery entry point is idempotent on a clean store.
    recover_pending_compactions(spark, store)


def test_vector_ingest_in_batch_gate_is_local_minima(spark, tmp_path):
    """The within-batch near-dup policy, pinned: a vector is rejected
    iff a LOWER-ID same-cell near-duplicate exists in the batch —
    admitted or not. Chain a~b, b~c with a!~c: b and c both drop (c's
    witness b was itself rejected — the documented over-rejection vs
    greedy admission); an isolated vector d admits."""
    import math

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0])], ["cell_id", "cell_vec"]
    )
    cent.write.parquet(str(tmp_path / "centroids"))

    def ray(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # cos(5 deg)=0.9962 >= 0.995 (adjacent pairs are dups);
    # cos(10 deg)=0.9848 < 0.995 (a and c are NOT dups).
    batch = spark.createDataFrame(
        [(1, ray(0)), (2, ray(5)), (3, ray(10)), (4, ray(80))],
        ["vec_id", "embedding"],
    )
    ingest = VectorIngest(
        spark,
        centroids_path=str(tmp_path / "centroids"),
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    admitted = sorted(
        r.vec_id for r in ingest._admit(batch).select("vec_id").collect()
    )
    assert admitted == [1, 4], admitted


def test_asset_fingerprints_color_and_stereo(spark):
    """The asset fingerprinting path must hash COLOR images via the
    integer channel-sum luminance (re-encoded RGB copies collide;
    channel-permuted content generally does not) and window stereo WAV
    energies summed across channels (a re-interleaved identical clip
    collides)."""
    import numpy as np

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
        make_png_codec,
        make_wav_codec,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.asset_ingest import (
        fingerprint_assets,
    )

    encode_png, _ = make_png_codec()
    encode_wav, _ = make_wav_codec()
    rgb = (
        (7 * np.arange(16)[None, :, None] + 13 * np.arange(12)[:, None, None]
         + 19 * np.arange(3)[None, None, :]) % 256
    ).astype(np.uint8)
    stereo = (
        (np.arange(600, dtype=np.int64)[:, None] * 997 + 41 * np.arange(2)[None, :])
        % 65536 - 32768
    ).astype(np.int16)
    rows = [
        ("/x/rgb.png", encode_png(rgb)),
        ("/x/rgb_refiltered.png", encode_png(rgb, filters=[2] * 12)),
        ("/x/stereo.wav", encode_wav(stereo)),
        ("/x/stereo_again.wav", encode_wav(stereo.copy())),
    ]
    assets = spark.createDataFrame(
        [(p, len(b), bytearray(b)) for p, b in rows],
        "path string, length long, content binary",
    )
    got = {r.asset_name: (r.kind, r.fingerprint) for r in fingerprint_assets(assets).collect()}
    assert got["rgb.png"][0] == "png"
    assert got["rgb.png"][1] == got["rgb_refiltered.png"][1]  # byte-different, pixel-same
    assert got["stereo.wav"][0] == "wav"
    assert got["stereo.wav"][1] == got["stereo_again.wav"][1]


def test_frequency_monitor_alerts_store_compaction(spark, tmp_path):
    """compact_alerts_store folds committed alerts epoch dirs into one
    (disjoint union — each key alerts once), the alert set and the
    ever-alerted gate are unchanged (no re-alerts after compaction),
    and the newest epoch stays protected."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        FrequencyMonitor,
        compact_alerts_store,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    alerts = str(tmp_path / "alerts")
    mon = FrequencyMonitor(
        spark,
        store_path=str(tmp_path / "sketch"),
        alerts_path=alerts,
        checkpoint_path=str(tmp_path / "ckpt"),
        threshold=5,
    )
    # epoch 0: 'a' crosses (6); epoch 1: 'b' crosses (5 cumulative via 5);
    # epoch 2: both appear again but must NOT re-alert; 'c' stays cold.
    batches = (
        [(j, "a") for j in range(6)] + [(90, "c")],
        [(100 + j, "b") for j in range(5)],
        [(200, "a"), (201, "b"), (202, "c")],
    )
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        mon.start(f"{src}/*", schema).awaitTermination(120)

    import glob as _glob

    def alert_keys():
        return sorted(
            r.event_type
            for r in spark.read.parquet(alerts).select("event_type").collect()
        )

    assert alert_keys() == ["a", "b"]

    with pytest.raises(ValueError, match="strictly below"):
        compact_alerts_store(spark, alerts, upto_epoch=2)
    assert compact_alerts_store(spark, alerts, upto_epoch=1) == 2
    dirs = sorted(p.rsplit("=", 1)[1] for p in _glob.glob(f"{alerts}/epoch=*"))
    assert dirs == ["1", "2"], dirs
    assert alert_keys() == ["a", "b"], "compaction changed the alert set"
    assert compact_alerts_store(spark, alerts, upto_epoch=1) == 0

    # The gate still holds after compaction: another appearance of the
    # compacted keys must not re-alert.
    spark.createDataFrame([(300, "a"), (301, "b")], schema).coalesce(1).write.parquet(
        str(src / "b3")
    )
    mon.start(f"{src}/*", schema).awaitTermination(120)
    assert alert_keys() == ["a", "b"]


def test_compaction_tolerates_crashed_empty_epoch_dir(spark, tmp_path):
    """An epoch dir with zero part files (writer died between mkdir and
    first file) holds no rows: compaction must not choke on schema
    inference, and the dead dir is swept with the folded range."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        compact_alerts_store,
    )

    store = tmp_path / "alerts"
    for epoch, rows in ((0, [("a", 7)]), (2, [("b", 9)]), (3, [("c", 5)])):
        spark.createDataFrame(
            rows, "event_type string, cms_estimate long"
        ).coalesce(1).write.parquet(str(store / f"epoch={epoch}"))
    (store / "epoch=1").mkdir()  # crashed writer: dir, no files

    # 3 dirs swept: epochs 0 and 2 folded, the dead epoch=1 removed.
    assert compact_alerts_store(spark, str(store), upto_epoch=2) == 3
    import glob as _glob

    dirs = sorted(p.rsplit("=", 1)[1] for p in _glob.glob(f"{store}/epoch=*"))
    assert dirs == ["2", "3"], dirs
    got = sorted(
        (r.event_type, r.cms_estimate)
        for r in spark.read.parquet(str(store)).collect()
    )
    assert got == [("a", 7), ("b", 9), ("c", 5)]


def test_compaction_sweeps_all_empty_foldable_dirs(spark, tmp_path):
    """If every foldable dir is a crashed empty mkdir, compaction
    deletes them (nothing to fold, nothing to leave accumulating)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.frequency_monitor import (
        compact_alerts_store,
    )

    store = tmp_path / "alerts"
    (store / "epoch=0").mkdir(parents=True)
    (store / "epoch=1").mkdir()
    spark.createDataFrame(
        [("z", 9)], "event_type string, cms_estimate long"
    ).coalesce(1).write.parquet(str(store / "epoch=2"))

    assert compact_alerts_store(spark, str(store), upto_epoch=1) == 2
    import glob as _glob

    dirs = sorted(p.rsplit("=", 1)[1] for p in _glob.glob(f"{store}/epoch=*"))
    assert dirs == ["2"], dirs


def test_bm25_ingest_matches_batch_rebuild(spark, tmp_path, sf_dir):
    """Streaming BM25 index maintenance: two drained batches accumulate
    a postings/stats store whose search is BIT-IDENTICAL to the direct
    batch path over the union corpus — the merge-equals-recompute
    contract carried into the streaming store. Re-draining with no new
    files changes nothing (exactly-once file tracking)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import bm25_topk
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = tmp_path / "docs"
    src.mkdir()
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )

    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    got1 = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    want1 = sorted(map(tuple, bm25_topk(b1, terms, k=10).collect()))
    assert got1 == want1 and got1

    b2 = docs.filter(F.col("doc_id") % 3 == 0)
    b2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    got2 = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    want2 = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    assert got2 == want2

    # Idempotent re-drain: no new files -> index unchanged.
    ingest.start(f"{src}/*", schema).awaitTermination(180)
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == want2


def test_bm25_ingest_replayed_epoch_is_idempotent(spark, tmp_path, sf_dir):
    """A crash between store write and checkpoint commit replays the
    batch with the SAME epoch id; the epoch-addressed overwrite must
    leave the accumulated index exactly as after the first attempt."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    ingest._process_batch(batch, 0)
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    first = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    postings1 = sorted(map(tuple, ingest.read_index()[0].collect()))
    ingest._process_batch(batch, 0)  # replay, same epoch
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == first
    assert sorted(map(tuple, ingest.read_index()[0].collect())) == postings1


def test_bm25_ingest_torn_epoch_is_invisible_until_replayed(spark, tmp_path, sf_dir):
    """A crash BETWEEN the postings write and the stats write (the
    commit witness) must leave the torn epoch invisible to search —
    scoring postings without their stats would silently understate
    N/total_len — and the epoch's replay completes it."""
    import shutil

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import bm25_topk
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 != 0)
    ingest._process_batch(b1, 0)
    want_b1 = sorted(map(tuple, bm25_topk(b1, terms, k=10).collect()))
    # Simulate the crash: epoch 1 wrote postings but not its stats row.
    ingest._process_batch(b2, 1)
    shutil.rmtree(str(tmp_path / "bm25_index" / "stats" / "epoch=1"))
    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert got == want_b1  # torn epoch invisible, not half-scored
    # Replay completes the epoch; the union corpus scores correctly.
    ingest._process_batch(b2, 1)
    want_all = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == want_all


def test_bm25_ingest_replay_of_committed_epoch_uncommits_first(spark, tmp_path, sf_dir):
    """Replaying an epoch whose FIRST attempt fully committed (crash
    after both writes, before the checkpoint commit) must first delete
    the stats witness — otherwise a crash or concurrent search during
    the postings rewrite would see the witness and score an epoch whose
    postings dir is mid-rewrite. Simulate the dangerous window: after a
    committed epoch, un-commit + tear the postings dir down (what
    overwrite does first) and assert search ignores the epoch."""
    import shutil

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import bm25_topk
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 != 0)
    ingest._process_batch(b1, 0)
    ingest._process_batch(b2, 1)  # fully committed first attempt
    # Replay crashes right after the un-commit delete + postings
    # teardown: emulate by doing exactly those two steps by hand.
    shutil.rmtree(str(tmp_path / "bm25_index" / "stats" / "epoch=1"))
    shutil.rmtree(str(tmp_path / "bm25_index" / "postings" / "epoch=1"))
    want_b1 = sorted(map(tuple, bm25_topk(b1, terms, k=10).collect()))
    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert got == want_b1  # the torn replay is invisible
    # The replay completes: full-union scores return.
    ingest._process_batch(b2, 1)
    want_all = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == want_all


def test_bm25_ingest_rejects_non_integral_id(spark, tmp_path):
    """The store schema pins doc_id LongType; a string id_col would
    cast('long') to NULL and silently collapse every document into one
    garbage row per query at search time. Both entry points — start()'s
    declared schema and a direct _process_batch — must raise instead."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        id_col="doc_id",
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    with pytest.raises(TypeError, match="integral id_col"):
        ingest.start(f"{tmp_path}/nowhere/*", schema)
    batch = spark.createDataFrame(
        [("a", "hello world")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="integral id_col"):
        ingest._process_batch(batch, 0)
    # Nothing was written by the failed attempts.
    assert not (tmp_path / "bm25_index").exists()


def test_bm25_bucket_hash_spellings_agree(spark):
    """The at-rest layout's bucket hash has two spellings — Spark
    (write-side partition values) and Python (search-side pruning) —
    that MUST be bit-equal, or pruning silently drops true results.
    Pinned on adversarial terms: non-ASCII, combining marks, empty-ish,
    digits, and long tokens, across two moduli."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        term_bucket,
        term_bucket_col,
    )

    terms = [
        "hello", "héllo", "wörld", "日本語", "éclair", "ß", "½",
        "a", "0", "🚀rocket", "x" * 500, "mixedCASE", "under_score",
    ]
    for n in (16, 7):
        got = (
            spark.createDataFrame([(t,) for t in terms], "term string")
            .select("term", term_bucket_col(F.col("term"), n).alias("b"))
            .collect()
        )
        for r in got:
            assert r.b == term_bucket(r.term, n), (r.term, n, r.b)


def test_bm25_store_compaction_identical_and_fewer_files(spark, tmp_path, sf_dir):
    """Verdict r6 #2: N batches -> compact -> search is bit-identical to
    pre-compaction search AND the store's file/dir count drops; the
    bucket layout survives the fold (search still scan-prunes). Also
    pins the incremental path on top of a compacted base."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import bm25_topk
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    for e in range(4):
        ingest._process_batch(docs.filter(F.col("doc_id") % 4 == e), e)
    before = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    files_before = len(ingest._committed()[0].inputFiles())
    epoch_dirs_before = len(
        list((tmp_path / "bm25_index" / "postings").glob("epoch=*"))
    )
    assert epoch_dirs_before == 4

    assert ingest.compact(upto_epoch=2) == 3  # newest epoch never folded
    files_after = len(ingest._committed()[0].inputFiles())
    epoch_dirs_after = len(
        list((tmp_path / "bm25_index" / "postings").glob("epoch=*"))
    )
    assert epoch_dirs_after == 2  # compacted base + tail epoch
    assert files_after < files_before
    after = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert after == before and after
    # The compacted store still equals a from-scratch batch rebuild.
    want = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    assert after == want
    # Stats survived the fold exactly (one summed row + the tail row).
    stats = ingest._committed()[1].collect()[0]
    assert stats.n_docs == docs.count()

    # Incremental on top of the compacted base: one more batch, then
    # compact everything, still identical to the full rebuild.
    extra = docs.limit(0)  # disjointness: reuse no doc_id
    ingest._process_batch(
        docs.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.col("text"),
        ).limit(50),
        4,
    )
    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    full = docs.unionByName(
        docs.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
        ).limit(50)
    )
    assert got == sorted(map(tuple, bm25_topk(full, terms, k=10).collect()))
    assert extra.count() == 0  # (documents disjointness witness)


def test_bm25_search_scan_prunes_to_query_buckets(spark, tmp_path, sf_dir):
    """The term-bucketed layout must prune at the SCAN, not just bound
    the shuffle: physically remove every bucket dir OUTSIDE the query
    terms' bucket set and assert search still returns bit-identical
    results — those files are provably never read. Also asserts the
    partition filter appears in the executed plan."""
    import shutil

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
        term_bucket,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    ingest._process_batch(docs, 0)
    want = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert want

    keep = {term_bucket(t, ingest.n_buckets) for _, t in BM25_QUERY_TERMS}
    assert len(keep) < ingest.n_buckets, "query terms cover every bucket"
    removed = 0
    for p in (tmp_path / "bm25_index" / "postings" / "epoch=0").glob(
        "bucket=*"
    ):
        if int(p.name.split("=", 1)[1]) not in keep:
            shutil.rmtree(str(p))
            removed += 1
    assert removed > 0
    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert got == want

    plan = (
        ingest.search(terms, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_bm25_compaction_crash_window_recovered_on_read(spark, tmp_path, sf_dir):
    """Crash-between-delete-and-rename drill (verdict r6 #2): simulate a
    compaction that wrote the tmp fold (with _SUCCESS), deleted the
    folded postings epoch dirs, and died before the rename. A search
    that runs NEXT must promote the tmp and return bit-identical
    results — never an under-scored index."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    for e in range(3):
        ingest._process_batch(docs.filter(F.col("doc_id") % 3 == e), e)
    want = sorted(map(tuple, ingest.search(terms, k=10).collect()))

    # Hand-build the crash state for the postings store: fold epochs
    # 0..1 into tmp (with _SUCCESS via a real write), delete the source
    # dirs, do NOT rename.
    import shutil

    store = str(tmp_path / "bm25_index" / "postings")
    folded = (
        spark.read.option("basePath", store)
        .parquet(f"{store}/epoch=0", f"{store}/epoch=1")
        .select("doc_id", "term", "tf", "dl", "bucket")
        .repartition(F.col("bucket"))
    )
    folded.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{store}/.compact_tmp_upto=1"
    )
    shutil.rmtree(f"{store}/epoch=0")
    shutil.rmtree(f"{store}/epoch=1")

    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert got == want
    # The read path finished the promotion: tmp gone, epoch=1 present.
    assert not (tmp_path / "bm25_index" / "postings" / ".compact_tmp_upto=1").exists()
    assert (tmp_path / "bm25_index" / "postings" / "epoch=1").exists()


def test_bm25_compact_refuses_torn_epoch_and_wrong_modulus(spark, tmp_path, sf_dir):
    """Two loud-failure pins: (a) compacting a range containing a torn
    epoch (postings without stats witness) raises instead of surfacing
    witness-less documents; (b) opening a store with a different
    n_buckets raises instead of pruning the wrong buckets."""
    import shutil

    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    for e in range(3):
        ingest._process_batch(docs.filter(F.col("doc_id") % 3 == e), e)
    # Tear epoch 1 (keep postings, drop the witness) — compact over it
    # must refuse.
    shutil.rmtree(str(tmp_path / "bm25_index" / "stats" / "epoch=1"))
    with pytest.raises(ValueError, match="torn"):
        ingest.compact(upto_epoch=1)

    mismatched = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt2"),
        n_buckets=8,
    )
    terms = spark.createDataFrame([(0, "the")], "query_id long, term string")
    with pytest.raises(ValueError, match="n_buckets"):
        mismatched.search(terms, k=5)
    with pytest.raises(ValueError, match="n_buckets"):
        mismatched._process_batch(docs.limit(1), 9)


def test_bm25_search_scans_legacy_prebucket_epochs_and_compact_migrates(
    spark, tmp_path, sf_dir
):
    """A store carrying epochs written by the pre-bucket (round-6)
    layout — no bucket= partition dirs, so the pinned schema reads
    their bucket as NULL — must still SEARCH them (pruning is an
    optimization; isin() alone would silently drop every legacy
    posting), and compact() must MIGRATE them into the bucketed layout
    by recomputing the hash."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_build_index,
        bm25_topk,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    ingest._process_batch(b0, 0)
    # Manufacture epoch=1 in the LEGACY layout: postings parquet with
    # no bucket column/dirs + the stats witness, exactly what a
    # round-6 writer left behind.
    postings, _dfreq, stats = bm25_build_index(b1)
    postings.select(
        F.col("doc_id").cast("long").alias("doc_id"), "term", "tf", "dl"
    ).write.parquet(str(tmp_path / "bm25_index" / "postings" / "epoch=1"))
    stats.write.parquet(str(tmp_path / "bm25_index" / "stats" / "epoch=1"))

    want = sorted(
        map(
            tuple,
            bm25_topk(b0.unionByName(b1), terms, k=10).collect(),
        )
    )
    got = sorted(map(tuple, ingest.search(terms, k=10).collect()))
    assert got == want and got, "legacy epoch must be scanned, not pruned away"

    # One more committed epoch so 1 is not newest, then compact over
    # the mixed range: results identical AND the fold migrated the
    # legacy rows into bucket= dirs (search pruning applies everywhere).
    ingest._process_batch(docs.filter(F.col("doc_id") % 3 == 2), 2)
    want_all = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    assert ingest.compact(upto_epoch=1) > 0
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == want_all
    folded = tmp_path / "bm25_index" / "postings" / "epoch=1"
    buckets = [p.name for p in folded.iterdir() if p.name.startswith("bucket=")]
    assert buckets, "compaction must rewrite legacy rows under bucket= dirs"
    assert not any("__HIVE_DEFAULT_PARTITION__" in b for b in buckets)


def test_bm25_compact_rejects_unwitnessed_upto_epoch(spark, tmp_path, sf_dir):
    """compact(upto_epoch) where upto is not a committed epoch id would
    fold postings into a target dir whose stats witness never exists —
    a crash between the two folds would hide every folded document. It
    must raise, naming the committed ids."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    for e in (0, 2, 4):  # non-contiguous epoch ids (gaps after retention)
        ingest._process_batch(docs.filter(F.col("doc_id") % 3 == e % 3), e)
    with pytest.raises(ValueError, match="not a committed epoch"):
        ingest.compact(upto_epoch=1)  # foldable={0}, but 1 is unwitnessed
    assert ingest.compact(upto_epoch=2) > 0  # committed id: fine


def test_bm25_compact_recovers_crashed_stats_fold_before_torn_check(
    spark, tmp_path, sf_dir
):
    """The real crash window compact() can produce: the postings fold
    COMPLETED (epochs 0-1 folded into epoch=1) and the stats fold
    crashed between its delete and rename — folded stats exist only in
    the tmp dir. The next compact() must recover that tmp BEFORE its
    torn-epoch check (the un-recovered listing shows postings {1,2} vs
    stats {2}, which the check would mis-diagnose as torn and wedge);
    search must return the exact pre-crash results throughout."""
    import os
    import shutil

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ingest = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    for e in range(3):
        ingest._process_batch(docs.filter(F.col("doc_id") % 3 == e), e)
    want = sorted(map(tuple, ingest.search(terms, k=10).collect()))

    # Stage the crash state by hand. Postings fold completed:
    post_store = str(tmp_path / "bm25_index" / "postings")
    folded_p = (
        spark.read.option("basePath", post_store)
        .parquet(f"{post_store}/epoch=0", f"{post_store}/epoch=1")
        .select("doc_id", "term", "tf", "dl", "bucket")
        .repartition(F.col("bucket"))
    )
    folded_p.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{post_store}/.compact_tmp_upto=1"
    )
    shutil.rmtree(f"{post_store}/epoch=0")
    shutil.rmtree(f"{post_store}/epoch=1")
    os.rename(f"{post_store}/.compact_tmp_upto=1", f"{post_store}/epoch=1")
    # Stats fold crashed mid-promotion: tmp written (with _SUCCESS),
    # folded dirs deleted, rename never ran.
    stats_store = str(tmp_path / "bm25_index" / "stats")
    folded_s = (
        spark.read.option("basePath", stats_store)
        .parquet(f"{stats_store}/epoch=0", f"{stats_store}/epoch=1")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_len").cast("long").alias("total_len"),
        )
    )
    folded_s.write.mode("overwrite").parquet(
        f"{stats_store}/.compact_tmp_upto=1"
    )
    shutil.rmtree(f"{stats_store}/epoch=0")
    shutil.rmtree(f"{stats_store}/epoch=1")

    # Re-running compact over the same range must recover the stats tmp
    # FIRST (not raise "torn"); there is nothing left to fold (epochs
    # are now {1, 2} on both stores and only one is <= upto), so it
    # returns 0 — and search is bit-identical to pre-crash.
    assert ingest.compact(upto_epoch=1) == 0
    assert (tmp_path / "bm25_index" / "stats" / "epoch=1").exists()
    assert sorted(map(tuple, ingest.search(terms, k=10).collect())) == want


def test_dedup_ingest_cdc_chunk_gate_catches_prefix_insertion(spark, tmp_path):
    """Round-8 CDC gate (r7 verdict #6): a batch-2 re-delivery of a
    batch-1 document with a LARGE prepended banner defeats both
    whole-document gates — the content digest changes (exact gate) and
    the shingle Jaccard drops below the LSH threshold — but content-
    defined chunk boundaries re-synchronize after the insertion point,
    so the shared chunk hashes flag it as chunk_dup against batch 1's
    store. A genuinely novel doc in the same batch is still admitted."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
        read_cdc_store,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
    )

    orig = (
        "the training corpus ingestion service deduplicates documents by "
        "minhash signatures and content digests while chunk boundaries come "
        "from rolling hashes over eight character grams making every chunk "
        "hash stable under prefix insertions across delivery attempts"
    )
    banner = (
        "LEGAL NOTICE " * 3
        + "this republication carries a mandatory compliance "
        "preamble inserted by the downstream syndication proxy containing "
        "entirely unrelated vocabulary tokens alpha bravo charlie delta echo "
        "foxtrot golf hotel india juliet kilo lima mike november oscar papa "
        "quebec romeo sierra tango uniform victor whiskey xray yankee zulu "
        "one two three four five six seven eight nine ten eleven twelve "
    )
    spark.createDataFrame([(1, orig)], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    ingest.start(f"{src}/*", schema).awaitTermination(120)

    # Sanity: the banner defeats the whole-doc gates on purpose — the
    # modified doc is NOT an exact dup and its Jaccard is sub-threshold.
    toks_o, toks_m = orig.lower().split(), (banner + orig).lower().split()
    sh = lambda t: {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
    jac = len(sh(toks_o) & sh(toks_m)) / len(sh(toks_o) | sh(toks_m))
    assert jac < ingest.threshold

    spark.createDataFrame(
        [
            (10, banner + orig),  # chunk-level verbatim reuse -> chunk_dup
            (11, "a genuinely novel second document with fresh content"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)

    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 11]
    # The CDC store grew with both epochs' admitted docs' chunk hashes.
    store = read_cdc_store(spark, str(tmp_path / "cdc"))
    assert store.count() == store.distinct().count() > 0

    # Disabled gate (pre-round-8 config) admits the banner variant —
    # the regression the gate exists to close, pinned both ways.
    legacy = DedupIngest(
        spark,
        store_path=str(tmp_path / "store2"),
        sink_path=str(tmp_path / "accepted2"),
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    src2 = tmp_path / "incoming2"
    src2.mkdir()
    spark.createDataFrame([(1, orig)], schema).coalesce(1).write.parquet(
        str(src2 / "b1")
    )
    legacy.start(f"{src2}/*", schema).awaitTermination(120)
    spark.createDataFrame([(10, banner + orig)], schema).coalesce(1).write.parquet(
        str(src2 / "b2")
    )
    legacy.start(f"{src2}/*", schema).awaitTermination(120)
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "accepted2")).collect()
    )
    assert got == [1, 10]


def test_dedup_ingest_chunk_gate_precedence(spark, tmp_path):
    """Verdict precedence: the chunk gate only relabels docs the
    whole-document gates passed. An exact re-delivery shares EVERY chunk
    with the store (far over cdc_min_chunks) but must stay exact_dup —
    and a sub-threshold sharer (< 3 distinct chunk hashes) stays
    unique."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
    )
    base = (
        "the training corpus ingestion service deduplicates documents by "
        "minhash signatures and content digests while chunk boundaries come "
        "from rolling hashes over eight character grams making every chunk "
        "hash stable under prefix insertions across delivery attempts"
    )
    spark.createDataFrame([(1, base)], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    ingest.start(f"{src}/*", schema).awaitTermination(120)

    batch = spark.createDataFrame(
        [
            (20, base),  # exact re-delivery: every chunk shared
            (21, "wholly unrelated content sharing nothing with the store"),
        ],
        schema,
    )
    status, survivors = ingest._classify(batch)
    verdicts = {r[0]: r[1] for r in status.collect()}
    assert verdicts[20] == "exact_dup"  # NOT chunk_dup — precedence
    assert verdicts[21] == "unique"
    assert [r.doc_id for r in survivors.collect()] == [21]


def _sq8_bootstrap(spark, tmp_path, sf_dir, n_cells=4):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        bootstrap_sq8_stats,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    boot = e.filter(F.col("vec_id") < 100)
    cents_path = str(tmp_path / "centroids")
    S.kmeans_centroids(boot, n_cells=n_cells).write.parquet(cents_path)
    stats_path = str(tmp_path / "sq8_stats")
    bootstrap_sq8_stats(boot, stats_path)
    return e, cents_path, stats_path


def _py_sq8(vec, mins, scales):
    """Independent Python transcription of encode + midpoint decode."""
    codes, recon = [], []
    for v, m, s in zip(vec, mins, scales):
        c = 0 if s == 0.0 else int(max(min((v - m) / s // 1, 255.0), 0.0))
        codes.append(c)
        recon.append((c + 0.5) * s + m)
    return codes, recon


def test_vector_ingest_sq8_codes_at_rest_and_search_parity(
    spark, tmp_path, sf_dir
):
    """SQ8 store mode: the store holds int8 codes (no vector column),
    the codes equal an independent Python quantization of the raw
    vectors against the frozen stats, and search reproduces the
    asymmetric-ADC ranking computed from those Python reconstructions
    bit-for-bit (same left-to-right fold)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    src = tmp_path / "vecs"
    src.mkdir()
    e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 140)).coalesce(
        1
    ).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(180)

    store = read_index_store(
        spark, str(tmp_path / "index"), quantized=True
    )
    assert set(store.columns) == {"vec_id", "cell_id", "codes", "code_norm"}
    stats = spark.read.parquet(stats_path).collect()[0]
    mins, scales = list(stats["mins"]), list(stats["scales"])
    raw = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 140)
        ).collect()
    }
    stored = {r["vec_id"]: list(r["codes"]) for r in store.collect()}
    assert set(stored) == set(raw)  # fixture vectors distinct: all admitted
    recons = {}
    for vid, vec in raw.items():
        codes, recon = _py_sq8(vec, mins, scales)
        assert stored[vid] == codes, f"codes diverge for {vid}"
        recons[vid] = recon

    queries = e.filter(F.col("vec_id") < 3)
    got = [
        (r["query_id"], r["cand_id"], r["rank"], r["cosine_sim"])
        for r in ingest.search(queries, k=3, n_probe=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    # Expected from the Python reconstructions: asymmetric cosine with
    # the same sequential fold, all cells probed, (sim DESC, id) ties.
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    expect = []
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in queries.collect()}
    for qid in sorted(qvecs):
        qv = qvecs[qid]
        qn = math.sqrt(fold_dot(qv, qv))
        scored = []
        for vid, rv in recons.items():
            if vid == qid:
                continue
            rn = math.sqrt(fold_dot(rv, rv))
            scored.append((fold_dot(qv, rv) / (qn * rn), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, vid) in enumerate(scored[:3], start=1):
            expect.append((qid, vid, rank, sim))
    assert got == expect


def test_vector_ingest_sq8_gate_rejects_redelivery_via_reconstruction(
    spark, tmp_path, sf_dir
):
    """The quantized gate detects a re-delivered vector THROUGH its
    stored reconstruction: recon cosine vs the raw original is ~0.9999
    (255 levels), above the 0.995 dup threshold."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    batch = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    ingest._process_batch(batch, 0)
    assert (
        read_index_store(spark, str(tmp_path / "index"), quantized=True).count()
        == 10
    )
    # Crash replay: the epoch must not self-reject against its own rows.
    assert ingest._admit(batch, exclude_epoch=0).count() == 10
    # A later epoch rejects re-arrivals THROUGH their reconstruction.
    # Expectation comes from the Python quantizer model, not a hardcoded
    # zero: a vector with components OUTSIDE the frozen bootstrap range
    # reconstructs through the uint8 clamp and can legitimately fall
    # below the 0.995 gate — the inherent frozen-stats SQ8 trade (same
    # as FAISS), which this fixture exercises (one of ten vectors).
    import math

    stats = spark.read.parquet(stats_path).collect()[0]
    mins, scales = list(stats["mins"]), list(stats["scales"])

    def _cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot, na, nb = dot + x * y, na + x * x, nb + y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    expect_admitted = set()
    for r in batch.collect():
        vec = list(r["embedding"])
        _, recon = _py_sq8(vec, mins, scales)
        if _cos(vec, recon) < ingest.dup_threshold:
            expect_admitted.add(r["vec_id"])
    got_admitted = {
        r["vec_id"] for r in ingest._admit(batch, exclude_epoch=1).collect()
    }
    assert got_admitted == expect_admitted
    assert len(got_admitted) <= 1, "gate should reject (nearly) all re-arrivals"


def test_vector_ingest_sq8_raw_layout_guard(spark, tmp_path, sf_dir):
    """Opening a raw-layout store in quantized mode fails LOUDLY (null
    codes raise per row) instead of silently scoring nothing."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    raw_ingest = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    raw_ingest._process_batch(
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)), 0
    )
    quant = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt2"),
        sq8_stats_path=stats_path,
    )
    with pytest.raises(Exception, match="raw-vector layout"):
        quant.search(e.filter(F.col("vec_id") < 2), k=3, n_probe=4).collect()


def test_vector_ingest_quantized_layout_guard_in_raw_mode(
    spark, tmp_path, sf_dir
):
    """The INVERSE layout mistake is also loud: a quantized store opened
    raw reads null vectors — without the guard the gate's NULL cosine
    would silently RE-ADMIT every duplicate and append raw rows into the
    quantized store. Both the search and the gate paths must raise."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    quant = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    batch = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    quant._process_batch(batch, 0)
    raw = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(Exception, match="SQ8 code layout"):
        raw.search(e.filter(F.col("vec_id") < 2), k=3, n_probe=4).collect()
    with pytest.raises(Exception, match="SQ8 code layout"):
        raw._admit(batch, exclude_epoch=1).count()


def test_sq8_codes_clamped_for_out_of_bootstrap_range_values(spark):
    """Frozen bootstrap stats + a later batch value OUTSIDE the
    bootstrap range: below-min values clamp to code 0 (without the
    lower clamp they would go NEGATIVE, breaking the uint8 contract a
    byte-packed deployment relies on), above-max values clamp to 255."""
    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        sq8_codes_col,
        sq8_stats,
    )

    boot = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    stats = sq8_stats(boot, dim=4)
    later = spark.createDataFrame(
        [(3, [-5.0, 2.0, 0.5, 1.0])], "vec_id long, embedding array<double>"
    )
    row = (
        later.crossJoin(F.broadcast(stats))
        .select(
            sq8_codes_col(
                F.col("embedding"), F.col("mins"), F.col("scales")
            ).alias("codes")
        )
        .collect()[0]
    )
    assert row["codes"][0] == 0      # below bootstrap min -> clamp, not negative
    assert row["codes"][1] == 255    # above bootstrap max
    assert 0 <= row["codes"][2] <= 255


def test_vector_ingest_layout_check_tolerates_uncommitted_store(
    spark, tmp_path, sf_dir
):
    """The eager layout check must be no STRICTER than the pinned-schema
    reader it guards: a store dir whose first epoch write crashed before
    any part file committed (only _temporary inside — no footer to infer
    a schema from) is 'store not created yet', and checkpoint replay
    must proceed rather than wedge in a crash loop on
    UNABLE_TO_INFER_SCHEMA."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    store = tmp_path / "index"
    (store / "epoch=0" / "_temporary" / "0").mkdir(parents=True)
    (store / "epoch=0" / "_temporary" / "0" / "task_junk").write_bytes(b"x")
    for mode_stats, ckpt in ((stats_path, "ckpt_q"), (None, "ckpt_r")):
        ingest = VectorIngest(
            spark,
            centroids_path=cents_path,
            store_path=str(store),
            checkpoint_path=str(tmp_path / ckpt),
            sq8_stats_path=mode_stats,
        )
        ingest._check_layout()  # must not raise
    quant = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(store),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    quant._process_batch(
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)), 0
    )
    got = read_index_store(spark, str(store), quantized=True).count()
    assert got == 10, "recovered store must hold the replayed epoch"


def test_vector_ingest_layout_check_survives_foreign_partition_dir(
    spark, tmp_path, sf_dir
):
    """A sibling dir with a DIFFERENT partition column name (a foreign
    tool's leftovers) defeats Spark's tree-wide partition discovery with
    CONFLICTING_PARTITION_COLUMN_NAMES — but each epoch dir is
    internally consistent, so the layout check derives the column set
    per epoch dir (the reader's own fallback) instead of re-raising
    where the reader would recover."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    quant = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    quant._process_batch(
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)), 0
    )
    # Manufacture the conflicting sibling: a parquet dir under a
    # different partition key at the store root.
    spark.range(1).write.parquet(str(tmp_path / "index" / "bucket=0"))
    quant._check_layout()  # must fall back to per-epoch-dir columns


def test_vector_ingest_sq8_dim_mismatch_raises(spark, tmp_path, sf_dir):
    """A vector whose length differs from the frozen SQ8 stats must
    raise AT ENCODE time: zip_with would otherwise pad with nulls and
    produce codes with null ELEMENTS — the whole-array layout guard
    never fires, the gate's cosine goes null (duplicates silently
    re-admitted), and search sims go null, all without any error."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    e, cents_path, stats_path = _sq8_bootstrap(spark, tmp_path, sf_dir)
    quant = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "index"),
        checkpoint_path=str(tmp_path / "ckpt"),
        sq8_stats_path=stats_path,
    )
    short = e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        "vec_id", F.slice(F.col("embedding"), 1, 32).alias("embedding")
    )
    with pytest.raises(Exception, match="SQ8 encode: vector dim"):
        quant._process_batch(short, 0)


def _cos_gate_ingest(spark, tmp_path, **over):
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    kw = dict(
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
        cosine_store_path=str(tmp_path / "cosine"),
    )
    kw.update(over)
    return DedupIngest(spark, **kw)


def test_dedup_ingest_cosine_gate_rejects_lexically_close_redelivery(
    spark, tmp_path
):
    """The fourth net: a re-delivery that is lexically close (bag-of-
    bigram cosine >= 0.8) but BELOW the LSH shingle-Jaccard threshold
    and WITHOUT chunk-aligned verbatim reuse must be rejected across
    batches via the persisted cosine store. The verdict string proves
    the other gates missed it — precedence means exact/near-dup/
    chunk_dup would have claimed the doc first. Constructions:

    - doc 20 vs stored doc 1: same tf-heavy 'x y' skeleton, but fresh
      one-token separators every 4 pairs kill the 3-gram shingle set
      (J ~ 0.03) and break every >=96-char verbatim run (CDC gate is
      ON and does not fire), while the bigram TF vectors stay at
      cosine ~ 0.94 — caught only through the corpus df store (the
      separators are batch-novel, so the cross-corpus prefix ranks the
      corpus-seen 'x y'/'y x' terms instead of wasting slots on them).
    - docs 30/31 within one batch: same 'm n' skeleton at different
      repetition counts with disjoint tails (J ~ 0.09, cosine ~ 0.99);
      min-id wins, 31 is cosine_dup_batch (prefix overlap on the
      digest-ranked 'm n' term is deterministic — verified offline)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming._store import (
        read_epoch_store,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        _cos_postings_schema,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ingest = _cos_gate_ingest(spark, tmp_path)

    a_text = "x y " * 40 + "alpha beta gamma delta epsilon"
    batch1 = spark.createDataFrame(
        [(1, a_text), (2, "the quick brown fox jumps over the lazy dog")],
        schema,
    )
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2]

    b_text = "".join(f"x y x y sep{i} " for i in range(20))
    e_text = "m n " * 40 + "zeta yotta zulu zebra xylem xenon yarrow yucca zephyr zinnia"
    e2_text = "m n " * 30 + "quartz quince quill quorum quest quiver quail quake qualm quartzite"
    batch2 = spark.createDataFrame(
        [
            (20, b_text),
            (30, e_text),
            (31, e2_text),
            (40, "a genuinely novel document about streaming ingest gates"),
        ],
        schema,
    )
    status, _ = ingest._classify(batch2, exclude_epoch=1)
    got = {r.doc_id: r.verdict for r in status.collect()}
    D.unpersist_all()
    assert got == {
        20: "cosine_dup_corpus",
        30: "unique",
        31: "cosine_dup_batch",
        40: "unique",
    }, got

    batch2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 30, 40]
    # The cosine store grew by exactly the admitted docs.
    postings = read_epoch_store(
        spark, str(tmp_path / "cosine" / "postings"), _cos_postings_schema("doc_id")
    )
    assert sorted(
        r.doc_id for r in postings.select("doc_id").distinct().collect()
    ) == [1, 2, 30, 40]


def test_dedup_ingest_cosine_replay_excludes_own_epoch(spark, tmp_path):
    """Crash-replay drill for the cosine store: when epoch 0's cosine
    store writes survived a crash but the checkpoint commit did not,
    the replay must EXCLUDE epoch 0's own postings/norms/df rows — or
    the batch's docs would match their own TF vectors at cosine 1.0 and
    the replay would overwrite the epoch dirs with empty frames. A
    LATER epoch must then see them."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    ingest = _cos_gate_ingest(spark, tmp_path, cdc_store_path=None)
    a_text = "x y " * 40 + "alpha beta gamma delta epsilon"
    batch = spark.createDataFrame([(1, a_text)], schema)
    # Materialize ONLY what epoch 0 wrote to the cosine store before the
    # crash (sink/signature writes happen first; excluding them isolates
    # the cosine gate's replay behavior).
    sp = str(tmp_path / "cosine")
    tf = ingest._cosine_tf(batch)
    tf.select("doc_id", "term", "tf").write.parquet(f"{sp}/postings/epoch=0")
    tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm_sq")
    ).write.parquet(f"{sp}/norms/epoch=0")
    tf.groupBy("term").agg(F.count("*").alias("df")).write.parquet(
        f"{sp}/df/epoch=0"
    )
    D.unpersist_all()

    # Replay of epoch 0: its own rows must not count as corpus.
    status_replay, survivors = ingest._classify(batch, exclude_epoch=0)
    assert [r.verdict for r in status_replay.collect()] == ["unique"]
    assert survivors.count() == 1
    D.unpersist_all()
    # A later epoch re-delivering the same text under a new id must be
    # caught THROUGH THE COSINE STORE ALONE (the signature store is
    # empty here, so the exact-digest gate cannot claim it).
    redelivery = spark.createDataFrame([(10, a_text)], schema)
    status_next, _ = ingest._classify(redelivery, exclude_epoch=1)
    assert [r.verdict for r in status_next.collect()] == ["cosine_dup_corpus"]
    D.unpersist_all()


def test_dedup_ingest_cosine_store_bucket_pruning_and_modulus_guard(
    spark, tmp_path
):
    """The cosine postings/df stores are term-bucketed: (1) gate reads
    prune to the batch-vocabulary buckets — pinned by DELETING every
    other bucket dir and verifying a re-delivery is still caught
    (exactly the bm25 store's pruning pin); (2) a reader configured
    with a different modulus raises loudly instead of pruning the wrong
    buckets; (3) a legacy FLAT epoch (no bucket dirs) is scanned via
    NULL-bucket tolerance alongside bucketed epochs."""
    import shutil

    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        term_bucket,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    ingest = _cos_gate_ingest(spark, tmp_path, cdc_store_path=None)
    a_text = "x y " * 40 + "alpha beta gamma delta epsilon"
    # A high-vocabulary filler doc makes the store span (nearly) all 16
    # buckets while the re-delivery's vocabulary (ONE repeated
    # separator -> ~5 distinct bigrams) needs only a few — so deleting
    # the non-needed buckets is a real pruning pin, not a no-op.
    filler = " ".join(f"filler{i}" for i in range(60))
    ingest._process_batch(
        spark.createDataFrame([(1, a_text), (5, filler)], schema), 0
    )
    redelivery = spark.createDataFrame(
        [(10, "x y x y s " * 20)], schema
    )
    # Compute which buckets the re-delivery's vocabulary needs, then
    # delete every OTHER bucket dir from both term-keyed stores. If the
    # gate read anything outside the batch's buckets, the deletion
    # would be visible; it is not.
    tf = ingest._cosine_tf(redelivery)
    need = {
        term_bucket(r["term"], ingest.cosine_n_buckets)
        for r in tf.select("term").distinct().collect()
    }
    D.unpersist_all()
    removed = 0
    for sub in ("postings", "df"):
        epoch_dir = tmp_path / "cosine" / sub / "epoch=0"
        for d in epoch_dir.iterdir():
            if d.name.startswith("bucket="):
                if int(d.name.split("=", 1)[1]) not in need:
                    shutil.rmtree(d)
                    removed += 1
    assert removed > 0, "fixture must actually exercise pruning"
    status, _ = ingest._classify(redelivery, exclude_epoch=1)
    assert [r.verdict for r in status.collect()] == ["cosine_dup_corpus"]
    D.unpersist_all()

    # Modulus mismatch is loud.
    bad = _cos_gate_ingest(
        spark, tmp_path, cdc_store_path=None, cosine_n_buckets=8
    )
    with pytest.raises(ValueError, match="n_buckets=16"):
        bad._classify(redelivery, exclude_epoch=1)
    D.unpersist_all()

    # Legacy flat epoch alongside the bucketed one: manufacture epoch=1
    # in the pre-bucket layout for a SECOND base doc, then verify a
    # re-delivery of THAT doc is caught through the mixed-layout store.
    b_text = "p q " * 40 + "omega psi chi phi upsilon"
    sp = str(tmp_path / "cosine")
    tf1 = ingest._cosine_tf(spark.createDataFrame([(2, b_text)], schema))
    tf1.select("doc_id", "term", "tf").write.parquet(f"{sp}/postings/epoch=1")
    tf1.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm_sq")
    ).write.parquet(f"{sp}/norms/epoch=1")
    tf1.groupBy("term").agg(F.count("*").alias("df")).write.parquet(
        f"{sp}/df/epoch=1"
    )
    D.unpersist_all()
    re2 = spark.createDataFrame(
        [(20, "".join(f"p q p q sep{i} " for i in range(20)))], schema
    )
    status2, _ = ingest._classify(re2, exclude_epoch=2)
    assert [r.verdict for r in status2.collect()] == ["cosine_dup_corpus"]
    D.unpersist_all()


def test_dedup_ingest_all_gates_torn_cosine_write_recovery(spark, tmp_path):
    """Crash INSIDE the multi-store write window: epoch 1 commits its
    sink + signature + CDC writes, then the driver dies BEFORE the
    cosine-store writes (injected at the bucket-marker check, the first
    step of the cosine block). The replay classifies with its own epoch
    excluded from EVERY store — partial epoch-1 artifacts included — so
    it rewrites all four consistently; a later cosine-catchable
    re-delivery then proves the recovered cosine store gates correctly."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming._store import (
        read_epoch_store,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
        _cos_postings_schema,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    a_text = "x y " * 40 + "alpha beta gamma delta epsilon"
    batches = [
        [(1, a_text)],
        # novel doc + exact dup of epoch 0's doc
        [(2, "pack my box with five dozen liquor jugs today"), (10, a_text)],
        # cosine-catchable re-delivery of doc 1 (below LSH, no chunk
        # alignment) + a novel doc
        [(20, "".join(f"x y x y sep{i} " for i in range(20))),
         (3, "sphinx of black quartz judge my vow tonight")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    paths = dict(
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
        cosine_store_path=str(tmp_path / "cosine"),
    )

    class TornCrash(DedupIngest):
        """Dies at epoch 1's cosine write (after the other three
        stores' epoch dirs landed)."""

        def _check_cosine_n_buckets(self, create: bool) -> None:
            if create and getattr(self, "_armed", False):
                self._armed = False
                raise RuntimeError("injected death before cosine write")
            super()._check_cosine_n_buckets(create)

        def _process_batch(self, batch_df, epoch_id):
            self._armed = epoch_id == 1
            super()._process_batch(batch_df, epoch_id)

    crashing = TornCrash(spark, **paths)
    died = None
    try:
        crashing.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    except Exception as ex:
        died = ex
    assert died is not None and "injected death" in str(died)
    # The torn window is real: epoch 1's sink + signature dirs landed,
    # its cosine dirs did not.
    assert (tmp_path / "accepted" / "epoch=1").exists()
    assert (tmp_path / "store" / "epoch=1").exists()
    assert not (tmp_path / "cosine" / "postings" / "epoch=1").exists()

    recovered = DedupIngest(spark, **paths)
    recovered.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    # 10 rejected (exact dup), 20 rejected (cosine) — through the
    # crash-recovered store.
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 3]
    postings = read_epoch_store(
        spark, f"{tmp_path}/cosine/postings", _cos_postings_schema("doc_id")
    )
    assert sorted(
        r.doc_id for r in postings.select("doc_id").distinct().collect()
    ) == [1, 2, 3]
    assert len(glob.glob(f"{tmp_path}/cosine/postings/epoch=*")) == 3


def test_hybrid_search_from_stores_matches_batch_hybrid(spark, tmp_path, sf_dir):
    """The production hybrid-search shape end-to-end: both persisted
    stores (term-bucketed BM25 inverted index + IVF vector index) are
    built by their streaming ingests over two epochs, then ONE fused
    search over the stores must equal the batch composition — rrf_fuse
    of the batch BM25 top-k and brute-force cosine top-k over the same
    admitted corpus (all cells probed, so IVF equals brute force; both
    provider parities are pinned by their own tests, the fusion rule by
    the oracle-backed hybrid_rrf_search)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_topk,
        rrf_fuse,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.hybrid_search import (
        hybrid_search_from_stores,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_path = str(tmp_path / "centroids")
    S.kmeans_centroids(e, n_cells=8).write.parquet(cents_path)

    bm25 = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "bm25_ckpt"),
    )
    vec = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "vec_index"),
        checkpoint_path=str(tmp_path / "vec_ckpt"),
    )
    # Two epochs each (the foreachBatch bodies directly — the streaming
    # wrapper's exactly-once tracking has its own tests).
    bm25._process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    bm25._process_batch(docs.filter(F.col("doc_id") % 2 != 0), 1)
    vec._process_batch(e.filter(F.col("vec_id") % 2 == 0), 0)
    vec._process_batch(e.filter(F.col("vec_id") % 2 != 0), 1)

    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))

    fused = hybrid_search_from_stores(
        bm25, vec, terms, queries, k=10, bm25_k=10, ann_k=20, n_probe=8
    ).orderBy("query_id", "rank")

    admitted = read_index_store(spark, str(tmp_path / "vec_index")).select(
        "vec_id", "embedding"
    )
    lex = bm25_topk(docs, terms, k=10).select(
        "query_id", F.col("doc_id").alias("cand_id"), "rank"
    )
    sem = S.brute_force_topk(admitted, queries, k=20).select(
        "query_id", "cand_id", "rank"
    )
    want = rrf_fuse(lex, sem, k=10).orderBy("query_id", "rank")
    got_rows = [tuple(r) for r in fused.collect()]
    want_rows = [tuple(r) for r in want.collect()]
    assert got_rows == want_rows and got_rows


def _tile_docs():
    """Three 24-token corpus docs with disjoint vocabularies, an
    assembled doc X whose four tiles are (A's middle tile, B's middle
    tile, C's middle tile, one fresh tile) — 3 of 4 borrowed — and a
    fully novel doc. Short tokens keep every 8-token tile under the
    CDC divisor so chunk alignment cannot claim X first."""
    def doc(prefix):
        return " ".join(f"{prefix}{i}" for i in range(1, 25))

    a, b, c = doc("a"), doc("b"), doc("c")

    def tile(text, idx):  # 1-based tile of 8 tokens
        t = text.split()
        return " ".join(t[(idx - 1) * 8: idx * 8])

    x = " ".join([tile(a, 2), tile(b, 2), tile(c, 2),
                  " ".join(f"z{i}" for i in range(1, 9))])
    novel = " ".join(f"n{i}" for i in range(1, 25))
    return a, b, c, x, novel


def test_dedup_ingest_tile_gate_rejects_assembled_doc(spark, tmp_path):
    """The fifth net: a document ASSEMBLED from three admitted docs'
    tiles (3 of its 4 tiles borrowed) must be rejected as tile_dup —
    the verdict string proves every cheaper gate missed it (fresh
    content digest, whole-doc Jaccard vs any one source ~0.16 < the
    0.4 LSH threshold, sub-chunk borrowed runs, mixed bigram vector at
    cosine ~0.3 < 0.8 vs any one source). A doc with exactly half its
    tiles borrowed keeps (the strict >1/2 rule), as does a short
    (<tile_k tokens) doc with zero tiles."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ingest = _cos_gate_ingest(
        spark, tmp_path, tile_store_path=str(tmp_path / "tiles")
    )
    a, b, c, x, novel = _tile_docs()
    batch1 = spark.createDataFrame([(1, a), (2, b), (3, c)], schema)
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 3]

    # half-borrowed: one tile from A, one fresh -> 2*1 <= 2 keeps.
    half = " ".join([
        " ".join(a.split()[8:16]),
        " ".join(f"q{i}" for i in range(1, 9)),
    ])
    batch2 = spark.createDataFrame(
        [(20, x), (30, novel), (40, half), (50, "too short to tile")],
        schema,
    )
    status, _ = ingest._classify(batch2, exclude_epoch=1)
    got = {r.doc_id: r.verdict for r in status.collect()}
    D.unpersist_all()
    assert got == {
        20: "tile_dup",
        30: "unique",
        40: "unique",
        50: "unique",
    }, got

    batch2.coalesce(1).write.parquet(str(src / "b2"))
    ingest.start(f"{src}/*", schema).awaitTermination(120)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 3, 30, 40, 50]


def test_dedup_ingest_all_gates_torn_tile_write_recovery(spark, tmp_path):
    """Crash INSIDE the five-store write window: epoch 1 commits its
    sink + signature + CDC + cosine writes, then the driver dies BEFORE
    the tile-store write. The replay classifies with its own epoch
    excluded from EVERY store — partial epoch-1 artifacts included — so
    it rewrites all five consistently; a later tile-catchable assembled
    doc then proves the recovered tile store gates correctly."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    a, b, c, x, novel = _tile_docs()
    batches = [
        [(1, a), (2, b), (3, c)],
        # novel doc + exact dup of epoch 0's doc 1
        [(4, novel), (10, a)],
        # tile-catchable assembled doc + a novel doc
        [(20, x), (5, " ".join(f"p{i}" for i in range(1, 25)))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    paths = dict(
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
        cosine_store_path=str(tmp_path / "cosine"),
        tile_store_path=str(tmp_path / "tiles"),
    )

    class TornCrash(DedupIngest):
        """Dies at epoch 1's tile write (after the other four stores'
        epoch dirs landed)."""

        def _write_tile_store(self, survivors, epoch_id):
            if epoch_id == 1 and getattr(self, "_armed", True):
                self._armed = False
                raise RuntimeError("injected death before tile write")
            super()._write_tile_store(survivors, epoch_id)

    crashing = TornCrash(spark, **paths)
    died = None
    try:
        crashing.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    except Exception as ex:
        died = ex
    assert died is not None and "injected death" in str(died)
    # The torn window is real: epoch 1's other four stores landed, its
    # tile dir did not.
    assert (tmp_path / "accepted" / "epoch=1").exists()
    assert (tmp_path / "store" / "epoch=1").exists()
    assert (tmp_path / "cdc" / "epoch=1").exists()
    assert (tmp_path / "cosine" / "norms" / "epoch=1").exists()
    assert not (tmp_path / "tiles" / "epoch=1").exists()

    recovered = DedupIngest(spark, **paths)
    recovered.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    # 10 rejected (exact dup), 20 rejected (tile gate) — through the
    # crash-recovered stores.
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 2, 3, 4, 5]
    assert len(glob.glob(f"{tmp_path}/tiles/epoch=*")) == 3


def test_hybrid_search_from_stores_sq8_vector_store(spark, tmp_path, sf_dir):
    """The hybrid store search composes unchanged over an SQ8
    (int8-codes-at-rest) vector store: the fused output equals
    rrf_fuse of the two provider searches run independently — pinning
    the column contract (doc_id -> cand_id relabel, rank passthrough)
    in quantized mode, where the ANN list is ranked against midpoint
    reconstructions (that search's own parity has its own tests)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import rrf_fuse
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.hybrid_search import (
        hybrid_search_from_stores,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        bootstrap_sq8_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_path = str(tmp_path / "centroids")
    S.kmeans_centroids(e, n_cells=8).write.parquet(cents_path)
    stats_path = str(tmp_path / "sq8_stats")
    bootstrap_sq8_stats(e, stats_path)
    bm25 = Bm25IndexIngest(
        spark,
        store_path=str(tmp_path / "bm25_index"),
        checkpoint_path=str(tmp_path / "bm25_ckpt"),
    )
    vec = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "vec_index"),
        checkpoint_path=str(tmp_path / "vec_ckpt"),
        sq8_stats_path=stats_path,
    )
    bm25._process_batch(docs, 0)
    vec._process_batch(e, 0)
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))

    fused = hybrid_search_from_stores(
        bm25, vec, terms, queries, k=5, ann_k=10, n_probe=8
    ).orderBy("query_id", "rank")
    lex = bm25.search(terms, k=10).select(
        "query_id", F.col("doc_id").alias("cand_id"), "rank"
    )
    sem = vec.search(queries, k=10, n_probe=8).select(
        "query_id", "cand_id", "rank"
    )
    want = rrf_fuse(lex, sem, k=5).orderBy("query_id", "rank")
    got_rows = [tuple(r) for r in fused.collect()]
    want_rows = [tuple(r) for r in want.collect()]
    assert got_rows == want_rows and got_rows
    assert {r[0] for r in got_rows} == set(qids)


def test_dedup_ingest_existence_store_bucket_pruning_and_guards(
    spark, tmp_path
):
    """The CDC and tile stores are hash-bucketed at rest: (1) gate
    reads prune to the batch's digest buckets — pinned by DELETING
    every other bucket dir and verifying the re-delivery is still
    caught (the bm25/cosine pruning pin); (2) a reader configured with
    a different modulus raises loudly; (3) a legacy FLAT epoch (no
    bucket dirs) is scanned via NULL-bucket tolerance alongside
    bucketed epochs."""
    import shutil

    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        term_bucket,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    a, b, c, x, novel = _tile_docs()
    ingest = _cos_gate_ingest(
        spark,
        tmp_path,
        cosine_store_path=None,
        tile_store_path=str(tmp_path / "tiles"),
    )
    # A high-vocabulary filler doc spreads the stores over many buckets
    # while the assembled re-delivery needs only a few — real pruning.
    filler = " ".join(f"filler{i}" for i in range(120))
    ingest._process_batch(
        spark.createDataFrame([(1, a), (2, b), (3, c), (5, filler)], schema), 0
    )
    redelivery = spark.createDataFrame([(20, x)], schema)
    tiles = ingest._batch_tiles(redelivery)
    need_t = {
        term_bucket(r["tile_hash"], ingest.tile_n_buckets)
        for r in tiles.select("tile_hash").distinct().collect()
    }
    chunks = ingest._batch_chunks(redelivery)
    need_c = {
        term_bucket(r["chunk_hash"], ingest.cdc_n_buckets)
        for r in chunks.select("chunk_hash").distinct().collect()
    }
    D.unpersist_all()
    removed = 0
    for store, need in (("tiles", need_t), ("cdc", need_c)):
        epoch_dir = tmp_path / store / "epoch=0"
        for d in epoch_dir.iterdir():
            if d.name.startswith("bucket="):
                if int(d.name.split("=", 1)[1]) not in need:
                    shutil.rmtree(d)
                    removed += 1
    assert removed > 0, "fixture must actually exercise pruning"
    status, _ = ingest._classify(redelivery, exclude_epoch=1)
    assert [r.verdict for r in status.collect()] == ["tile_dup"]
    D.unpersist_all()

    # Modulus mismatch is loud — on both stores.
    bad = _cos_gate_ingest(
        spark,
        tmp_path,
        cosine_store_path=None,
        tile_store_path=str(tmp_path / "tiles"),
        tile_n_buckets=8,
    )
    with pytest.raises(ValueError, match="tile.*n_buckets=16"):
        bad._classify(redelivery, exclude_epoch=1)
    D.unpersist_all()
    bad2 = _cos_gate_ingest(
        spark,
        tmp_path,
        cosine_store_path=None,
        tile_store_path=str(tmp_path / "tiles"),
        cdc_n_buckets=4,
    )
    with pytest.raises(ValueError, match="cdc.*n_buckets=16"):
        bad2._classify(redelivery, exclude_epoch=1)
    D.unpersist_all()

    # Legacy flat epochs (pre-bucket layout, hand-built) alongside the
    # bucketed ones: a doc known only through flat epoch=1 dirs must
    # still gate a later assembly built from it.
    legacy_doc = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(1, 25)))], schema
    )
    ingest._batch_tiles(legacy_doc).select("tile_hash").distinct().write.parquet(
        str(tmp_path / "tiles" / "epoch=1")
    )
    ingest._batch_chunks(legacy_doc).select("chunk_hash").distinct().write.parquet(
        str(tmp_path / "cdc" / "epoch=1")
    )
    D.unpersist_all()
    w = " ".join(f"w{i}" for i in range(1, 25))
    assembled = " ".join([
        " ".join(w.split()[0:8]),
        " ".join(w.split()[8:16]),
        " ".join(f"v{i}" for i in range(1, 9)),
    ])
    status2, _ = ingest._classify(
        spark.createDataFrame([(30, assembled)], schema), exclude_epoch=2
    )
    assert [r.verdict for r in status2.collect()] == ["tile_dup"]
    D.unpersist_all()


def test_dedup_all_stores_compaction_gating_identical(spark, tmp_path):
    """r10 verdict #1: fold the five dedup-gate stores' committed epoch
    dirs and pin that GATING DECISIONS are identical pre/post — the
    bm25 equivalence standard. One probe batch triggers every net
    (exact, LSH near-dup, CDC chunk, lexical cosine, tile) plus a
    unique admit; the verdict rows must not move by a bit across the
    fold, the dir count must drop, a second compact is a no-op, and
    folding the newest epoch is refused (it may be an uncommitted
    batch's replay target)."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
        cosine_store_path=str(tmp_path / "cosine"),
        tile_store_path=str(tmp_path / "tiles"),
    )
    a_text = "x y " * 40 + "alpha beta gamma delta epsilon"
    orig_cdc = (
        "the training corpus ingestion service deduplicates documents by "
        "minhash signatures and content digests while chunk boundaries come "
        "from rolling hashes over eight character grams making every chunk "
        "hash stable under prefix insertions across delivery attempts"
    )
    banner = (
        "LEGAL NOTICE " * 3
        + "this republication carries a mandatory compliance "
        "preamble inserted by the downstream syndication proxy containing "
        "entirely unrelated vocabulary tokens alpha bravo charlie delta echo "
        "foxtrot golf hotel india juliet kilo lima mike november oscar papa "
        "quebec romeo sierra tango uniform victor whiskey xray yankee zulu "
        "one two three four five six seven eight nine ten eleven twelve "
    )
    lsh_base = (
        "the quick brown fox jumps over the lazy dog near the riverbank "
        "in the early morning light before the ferry crossing opens"
    )
    ta, tb, tc, x, _novel = _tile_docs()
    epochs = [
        [(1, a_text), (2, orig_cdc), (3, ta), (4, tb), (5, tc), (6, lsh_base)],
        [(7, "pack my box with five dozen liquor jugs today")],
        [(8, "sphinx of black quartz judge my vow tonight")],
    ]
    for e, rows in enumerate(epochs):
        ingest._process_batch(spark.createDataFrame(rows, schema), e)
        D.unpersist_all()
    probe = spark.createDataFrame(
        [
            (101, a_text),  # exact
            (102, lsh_base + " suddenly"),  # LSH near-dup
            (103, banner + orig_cdc),  # CDC chunk reuse
            (104, "".join(f"x y x y sep{i} " for i in range(20))),  # cosine
            (105, x),  # tile assembly
            (106, "entirely fresh vocabulary sentence about nothing much"),
        ],
        schema,
    )

    def verdicts() -> dict[int, str]:
        status, _ = ingest._classify(probe, exclude_epoch=99)
        out = {r.doc_id: r.verdict for r in status.collect()}
        D.unpersist_all()
        return out

    before = verdicts()
    assert before == {
        101: "exact_dup",
        102: "near_dup_corpus",
        103: "chunk_dup",
        104: "cosine_dup_corpus",
        105: "tile_dup",
        106: "unique",
    }
    dirs_before = len(glob.glob(str(tmp_path / "store" / "epoch=*")))
    assert dirs_before == 3

    folded = ingest.compact(upto_epoch=1)
    # Every configured store folded its two committed epoch dirs.
    assert set(folded.values()) == {2} and len(folded) == 6
    for root in ("store", "cdc", "tiles"):
        assert len(glob.glob(str(tmp_path / root / "epoch=*"))) == 2
    for sub in ("postings", "norms", "df"):
        assert len(glob.glob(str(tmp_path / "cosine" / sub / "epoch=*"))) == 2
    # The bucketed at-rest layout survived the fold (pruning still works).
    assert glob.glob(str(tmp_path / "tiles" / "epoch=1" / "bucket=*"))
    assert glob.glob(str(tmp_path / "cdc" / "epoch=1" / "bucket=*"))

    assert verdicts() == before, "compaction changed a gating verdict"
    # Idempotent: nothing left to fold below the newest epoch.
    assert set(ingest.compact(upto_epoch=1).values()) == {0}
    # The newest epoch is never foldable.
    with pytest.raises(ValueError, match="newest epoch"):
        ingest.compact(upto_epoch=2)
    # Post-compaction ingest continues on the folded base: re-delivery
    # of a compacted doc is still rejected in a real epoch.
    ingest._process_batch(
        spark.createDataFrame([(200, a_text), (201, "brand new words entirely")], schema), 3
    )
    D.unpersist_all()
    sink = spark.read.parquet(str(tmp_path / "accepted" / "epoch=3"))
    assert [r.doc_id for r in sink.collect()] == [201]


def test_dedup_compaction_crash_recovered_on_next_batch(spark, tmp_path):
    """Crash drill for the dedup-store compaction: a death inside the
    delete->rename window leaves the folded tile history ONLY in
    ``.compact_tmp_upto=K`` with the source epoch dirs already gone.
    The next batch's read side must promote it BEFORE classifying — a
    tile-catchable assembly is still rejected through the recovered
    store, and the tmp dir is gone after."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        term_bucket_col,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
        _TILE_SCHEMA,
        read_tile_store,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    tiles = tmp_path / "tiles"
    ingest = DedupIngest(
        spark,
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        tile_store_path=str(tiles),
    )
    ta, tb, tc, x, novel = _tile_docs()
    epochs = [
        [(1, ta), (2, tb), (3, tc)],
        [(4, novel)],
        [(5, "sphinx of black quartz judge my vow tonight")],
    ]
    for e, rows in enumerate(epochs):
        ingest._process_batch(spark.createDataFrame(rows, schema), e)
        D.unpersist_all()

    # Hand-build the mid-crash state the drill targets: the fold of
    # epochs 0-1 committed to the tmp dir (_SUCCESS present), the
    # source dirs already deleted, the rename never ran.
    import shutil

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming._store import (
        read_epoch_dirs_union,
    )

    fold_src = read_epoch_dirs_union(
        spark, str(tiles), _TILE_SCHEMA, epochs={0, 1}
    )
    (
        fold_src.select("tile_hash")
        .distinct()
        .select(
            "tile_hash",
            term_bucket_col(F.col("tile_hash"), ingest.tile_n_buckets).alias(
                "bucket"
            ),
        )
        .write.partitionBy("bucket")
        .parquet(str(tiles / ".compact_tmp_upto=1"))
    )
    shutil.rmtree(str(tiles / "epoch=0"))
    shutil.rmtree(str(tiles / "epoch=1"))
    # Without recovery the store has LOST docs 1-3's tiles: the raw
    # reader (no recovery hook) sees only epoch 2.
    assert (
        read_tile_store(spark, str(tiles))
        .join(
            ingest._batch_tiles(
                spark.createDataFrame([(99, ta)], schema)
            ).select("tile_hash"),
            "tile_hash",
            "left_semi",
        )
        .count()
        == 0
    )
    D.unpersist_all()

    # The next batch recovers FIRST, then classifies: the assembled doc
    # is rejected through the promoted history.
    ingest._process_batch(
        spark.createDataFrame(
            [(20, x), (6, " ".join(f"p{i}" for i in range(1, 25)))], schema
        ),
        3,
    )
    D.unpersist_all()
    assert not (tiles / ".compact_tmp_upto=1").exists()
    assert (tiles / "epoch=1").exists()
    sink = spark.read.parquet(str(tmp_path / "accepted" / "epoch=3"))
    assert [r.doc_id for r in sink.collect()] == [6]


def test_vector_store_compaction_search_identical_and_gate_holds(
    spark, tmp_path, sf_dir
):
    """VectorIngest.compact folds committed index epochs into one dir;
    search over the folded store is bit-identical (raw AND SQ8
    layouts), the near-dup gate still rejects a re-delivered compacted
    vector, and the newest epoch is never foldable (shared-helper
    guard)."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        bootstrap_sq8_stats,
        read_index_store,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_path = str(tmp_path / "centroids")
    S.kmeans_centroids(e, n_cells=8).write.parquet(cents_path)
    stats_path = str(tmp_path / "sq8_stats")
    bootstrap_sq8_stats(e, stats_path)
    queries = e.filter(F.col("vec_id") < 6)

    for label, sq8 in (("raw", None), ("sq8", stats_path)):
        vec = VectorIngest(
            spark,
            centroids_path=cents_path,
            store_path=str(tmp_path / f"idx_{label}"),
            checkpoint_path=str(tmp_path / f"ckpt_{label}"),
            sq8_stats_path=sq8,
        )
        for ep in range(3):
            vec._process_batch(e.filter(F.col("vec_id") % 3 == ep), ep)
        before = sorted(
            map(tuple, vec.search(queries, k=5, n_probe=8).collect())
        )
        n_before = read_index_store(
            spark, vec.store_path, quantized=sq8 is not None
        ).count()
        assert vec.compact(upto_epoch=1) == 2
        assert (
            len(glob.glob(str(tmp_path / f"idx_{label}" / "epoch=*"))) == 2
        )
        after = sorted(
            map(tuple, vec.search(queries, k=5, n_probe=8).collect())
        )
        assert after == before and after, label
        # Gate holds on the folded base: re-delivering epoch 0's
        # vectors admits nothing.
        vec._process_batch(e.filter(F.col("vec_id") % 3 == 0), 3)
        n_after = read_index_store(
            spark, vec.store_path, quantized=sq8 is not None
        ).count()
        assert n_after == n_before, label
        with pytest.raises(ValueError, match="strictly below"):
            vec.compact(upto_epoch=3)


def _semantic_docs():
    """Corpus doc A, a PARAPHRASE P (zero token overlap with A — fresh
    digest, no shared shingles/chunks/n-grams/tiles — but a near-equal
    embedding), and two novel docs with far embeddings. Dim-4 vectors;
    two frozen cells ([1,0,0,0] and [0,1,0,0]) put A and P in cell 0."""
    ta = (
        "the committee approved the new budget for the coming fiscal "
        "year after long deliberation over infrastructure costs"
    )
    tp = (
        "finance panel green lights upcoming annual spending plan "
        "following extended debate about transport outlays"
    )
    ea = [1.0, 0.0, 0.0, 0.0]
    ep = [0.9999, 0.01, 0.0, 0.0]
    return ta, tp, ea, ep


def test_dedup_ingest_embedding_gate_rejects_paraphrase(spark, tmp_path):
    """r10 verdict #3 — the SIXTH net: a paraphrase-with-fresh-tokens
    re-delivery passes all five lexical/structural nets (verdict-string
    proof below: a five-net ingest classifies it ``unique``) and is
    rejected as ``embedding_dup`` only by the semantic gate. Also pins
    that compaction folds the semantic store with the others and the
    gate holds through the folded base."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.operators import dedup as D
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    ta, tp, ea, ep = _semantic_docs()
    cents = str(tmp_path / "centroids")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cell_id long, cell_vec array<double>",
    ).write.parquet(cents)

    def paths(tag):
        return dict(
            store_path=str(tmp_path / tag / "store"),
            sink_path=str(tmp_path / tag / "accepted"),
            checkpoint_path=str(tmp_path / tag / "ckpt"),
            cdc_store_path=str(tmp_path / tag / "cdc"),
            cosine_store_path=str(tmp_path / tag / "cosine"),
            tile_store_path=str(tmp_path / tag / "tiles"),
        )

    six = DedupIngest(
        spark,
        **paths("six"),
        embedding_store_path=str(tmp_path / "six" / "emb"),
        embedding_centroids_path=cents,
    )
    five = DedupIngest(spark, **paths("five"))
    src = tmp_path / "incoming"
    src.mkdir()
    epochs = [
        [(1, ta, ea), (2, "pack my box with five dozen liquor jugs", [0.0, 1.0, 0.0, 0.0])],
        [(3, "sphinx of black quartz judge my vow", [0.0, 0.98, 0.2, 0.0])],
    ]
    for e, rows in enumerate(epochs):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{e}")
        )
    # Both ingests drain the same backlog through their own checkpoints
    # (epochs 0-1) — the stores and checkpoints stay one unit, so the
    # later stream run below continues at epoch 2.
    for ing in (six, five):
        ing.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
        D.unpersist_all()
    probe = spark.createDataFrame(
        [
            (10, tp, ep),  # paraphrase of doc 1: semantic-only dup
            (11, "entirely novel vocabulary about gardening tips", [0.0, 0.0, 1.0, 0.0]),
        ],
        schema,
    )

    def verdicts(ing):
        status, _ = ing._classify(probe, exclude_epoch=99)
        out = {r.doc_id: r.verdict for r in status.collect()}
        D.unpersist_all()
        return out

    # The five lexical/structural nets ALL miss the paraphrase — the
    # gap the sixth net exists to close.
    assert verdicts(five) == {10: "unique", 11: "unique"}
    assert verdicts(six) == {10: "embedding_dup", 11: "unique"}

    # End-to-end through the stream: the paraphrase is dropped from the
    # sink, the novel doc admitted, and the semantic store grew per
    # epoch (text-free: ids + cells + vectors only).
    probe.coalesce(1).write.parquet(str(src / "b2"))
    six.start(f"{src}/*", schema).awaitTermination(240)
    D.unpersist_all()
    accepted = spark.read.parquet(f"{six.sink_path}/epoch=2")
    assert sorted(r.doc_id for r in accepted.collect()) == [11]
    all_accepted = spark.read.parquet(six.sink_path)
    assert sorted(r.doc_id for r in all_accepted.collect()) == [1, 2, 3, 11]
    emb_store = spark.read.parquet(str(tmp_path / "six" / "emb"))
    # Keyed by the DEDUP id column (the composed VectorIngest inherits it).
    assert set(emb_store.columns) >= {"doc_id", "cell_id", "embedding", "vec_norm"}
    assert "text" not in emb_store.columns

    # Compaction folds the semantic store alongside the other five and
    # the gate still rejects a second paraphrase through the folded base.
    folded = six.compact(upto_epoch=1)
    assert folded[str(tmp_path / "six" / "emb")] == 2
    assert len(glob.glob(str(tmp_path / "six" / "emb" / "epoch=*"))) == 2
    probe2 = spark.createDataFrame(
        [(20, "reworded once more with different words", [0.99995, 0.0, 0.01, 0.0])],
        schema,
    )
    status2, _ = six._classify(probe2, exclude_epoch=99)
    assert [r.verdict for r in status2.collect()] == ["embedding_dup"]
    D.unpersist_all()


def test_dedup_ingest_all_gates_torn_embedding_write_recovery(spark, tmp_path):
    """Crash INSIDE the six-store write window: epoch 1 commits its
    sink + signature + CDC + cosine + tile writes, then the driver dies
    BEFORE the embedding-store write. The replay classifies with its
    own epoch excluded from EVERY store and rewrites all six
    consistently; a later paraphrase re-delivery proves the recovered
    semantic store gates correctly."""
    import glob

    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.dedup_ingest import (
        DedupIngest,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    ta, tp, ea, ep = _semantic_docs()
    cents = str(tmp_path / "centroids")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cell_id long, cell_vec array<double>",
    ).write.parquet(cents)
    src = tmp_path / "incoming"
    src.mkdir()
    batches = [
        [(1, ta, ea)],
        [(4, "pack my box with five dozen liquor jugs", [0.0, 1.0, 0.0, 0.0])],
        [(20, tp, ep),  # paraphrase: only the semantic store catches it
         (5, "sphinx of black quartz judge my vow", [0.0, 0.98, 0.2, 0.0])],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    kwargs = dict(
        store_path=str(tmp_path / "store"),
        sink_path=str(tmp_path / "accepted"),
        checkpoint_path=str(tmp_path / "ckpt"),
        cdc_store_path=str(tmp_path / "cdc"),
        cosine_store_path=str(tmp_path / "cosine"),
        tile_store_path=str(tmp_path / "tiles"),
        embedding_store_path=str(tmp_path / "emb"),
        embedding_centroids_path=cents,
    )

    class TornCrash(DedupIngest):
        """Dies at epoch 1's embedding write (after the other five
        stores' epoch dirs landed)."""

        def _write_embedding_store(self, survivors, epoch_id):
            if epoch_id == 1 and getattr(self, "_armed", True):
                self._armed = False
                raise RuntimeError("injected death before embedding write")
            super()._write_embedding_store(survivors, epoch_id)

    crashing = TornCrash(spark, **kwargs)
    died = None
    try:
        crashing.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    except Exception as ex:
        died = ex
    assert died is not None and "injected death" in str(died)
    # The torn window is real: epoch 1's other five stores landed, the
    # embedding dir did not.
    assert (tmp_path / "accepted" / "epoch=1").exists()
    assert (tmp_path / "store" / "epoch=1").exists()
    assert (tmp_path / "tiles" / "epoch=1").exists()
    assert not (tmp_path / "emb" / "epoch=1").exists()

    recovered = DedupIngest(spark, **kwargs)
    recovered.start(f"{src}/*", schema, max_files_per_trigger=1).awaitTermination(240)
    accepted = spark.read.parquet(str(tmp_path / "accepted"))
    # 20 rejected (semantic paraphrase) through the crash-recovered
    # stores; everything else admitted.
    assert sorted(r.doc_id for r in accepted.collect()) == [1, 4, 5]
    assert len(glob.glob(f"{tmp_path}/emb/epoch=*")) == 3


def test_vector_store_centroid_identity_guard(spark, tmp_path, sf_dir):
    """ADVICE r10: the vector store stamps a centroid-content digest at
    write time and every open cross-checks it — opening a store with
    FOREIGN centroids would probe the wrong cells and silently return
    wrong search results / re-admit duplicates, so it is a loud
    ValueError instead. A byte-identical centroid rewrite at a
    different path digests the same and opens fine."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_a = str(tmp_path / "cents_a")
    S.kmeans_centroids(e, n_cells=8, sample_mod=4).write.parquet(cents_a)
    cents_b = str(tmp_path / "cents_b")
    S.kmeans_centroids(e, n_cells=4, sample_mod=2).write.parquet(cents_b)

    store = str(tmp_path / "idx")
    vec = VectorIngest(
        spark, centroids_path=cents_a, store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    vec._process_batch(e, 0)
    assert (tmp_path / "idx").exists()
    queries = e.filter(F.col("vec_id") < 4)
    ok = vec.search(queries, k=3, n_probe=2).collect()
    assert ok

    foreign = VectorIngest(
        spark, centroids_path=cents_b, store_path=store,
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    with pytest.raises(ValueError, match="centroids"):
        foreign.search(queries, k=3, n_probe=2).collect()
    with pytest.raises(ValueError, match="centroids"):
        foreign._process_batch(e.limit(5), 1)

    # Content identity, not path identity: a byte-identical copy at a
    # new path opens and searches identically.
    import shutil

    cents_copy = str(tmp_path / "cents_copy")
    shutil.copytree(cents_a, cents_copy)
    same = VectorIngest(
        spark, centroids_path=cents_copy, store_path=store,
        checkpoint_path=str(tmp_path / "ckpt3"),
    )
    got = same.search(queries, k=3, n_probe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ok))


def test_asset_store_compaction_gate_identical(spark, tmp_path):
    """AssetIngest.compact folds committed fingerprint-store epochs into
    one dir; the exact-fingerprint gate sees the identical set pre/post
    (a byte-different re-encode of a compacted image is still rejected),
    dir count drops, and the newest epoch is never foldable — the r11
    compaction discipline applied to the one epoch store without it."""
    import datetime as dt
    import glob

    import numpy as np

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
        make_png_codec,
        make_wav_codec,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.asset_ingest import (
        AssetIngest,
        read_asset_store,
    )

    encode_png, _ = make_png_codec()
    encode_wav, _ = make_wav_codec()
    ingest = AssetIngest(
        spark,
        store_path=str(tmp_path / "store"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    def batch(rows):
        ts = dt.datetime(2026, 1, 1)
        return spark.createDataFrame(
            [(n, ts, len(p), bytearray(p)) for n, p in rows],
            "path string, modificationTime timestamp, length long, content binary",
        )

    px_a = ((7 * np.arange(9)[None, :] + 13 * np.arange(6)[:, None]) % 256).astype(
        np.uint8
    )
    px_b = ((17 * np.arange(9)[None, :] + 3 * np.arange(6)[:, None]) % 256).astype(
        np.uint8
    )
    wav = encode_wav((np.arange(400) * 997 % 65536 - 32768).astype(np.int16))
    for e, rows in enumerate(
        [
            [("a.png", encode_png(px_a))],
            [("b.png", encode_png(px_b))],
            [("c.wav", wav)],
        ]
    ):
        ingest._process_batch(batch(rows), e)
    assert len(glob.glob(str(tmp_path / "store" / "epoch=*"))) == 3
    before = sorted(
        map(tuple, read_asset_store(spark, ingest.store_path).collect())
    )
    assert len(before) == 3

    assert ingest.compact(upto_epoch=1) == 2
    assert len(glob.glob(str(tmp_path / "store" / "epoch=*"))) == 2
    after = sorted(
        map(tuple, read_asset_store(spark, ingest.store_path).collect())
    )
    assert after == before

    # Re-delivery of a COMPACTED image, re-encoded with different row
    # filters (different bytes, same perceptual fingerprint): still
    # rejected through the folded base — epoch 3 admits nothing.
    redelivery = encode_png(px_a, filters=[2] * px_a.shape[0])
    ingest._process_batch(batch([("a_copy.png", redelivery)]), 3)
    assert read_asset_store(spark, ingest.store_path).count() == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="strictly below"):
        ingest.compact(upto_epoch=3)

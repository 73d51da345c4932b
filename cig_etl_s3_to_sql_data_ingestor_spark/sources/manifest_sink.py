"""Manifest-committed parquet tables: atomic publish on object stores.

``compact_parquet``/``zorder_compact`` swap directories with FS renames —
atomic on HDFS/posix, NOT on S3, where rename is copy+delete and readers
can observe half a table (NOTES.md known gap). The table-format answer
(what Delta/Iceberg do at their core) is a MANIFEST: data files are
immutable and write-once under unique names, and a reader only sees files
listed by the latest committed manifest. Publishing is then one small
``create(manifest, overwrite=false)`` — an atomic claim on HDFS/posix and
a conditional PUT on object stores that support it — never a rename of
data.

Protocol (minimal Delta-log shape):

- data lives in ``<table>/data/batch-<uuid>/part-*.parquet``; every write
  goes to a fresh batch directory, so concurrent/failed writers never
  collide on data paths;
- ``<table>/_manifests/v{N}.json`` lists the batch directories visible at
  version N; the file is written via ``create(..., overwrite=false)`` —
  claiming version N is winning that create;
- a writer that loses the claim re-reads the new latest manifest, rebases
  (append keeps its batch + the winner's list) and retries at N+1 —
  optimistic concurrency, bounded by ``max_retries``;
- a crash after data write but before manifest commit leaves an ORPHAN
  batch directory: invisible to every reader, reclaimed by ``vacuum``.

Readers (:func:`read_snapshot`) load the union of listed batch dirs —
a consistent snapshot regardless of concurrent publishes.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _manifest_path(jvm, table_path: str, version: int):
    return jvm.org.apache.hadoop.fs.Path(
        f"{table_path.rstrip('/')}/{MANIFEST_DIR}/v{version}.json"
    )


def _read_manifest(fs, jvm, table_path: str, version: int) -> dict:
    p = _manifest_path(jvm, table_path, version)
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; py4j can't fill a Python
        # bytearray through a Java read(byte[]) call.
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        return json.loads(text)
    finally:
        stream.close()


def current_version(spark: SparkSession, table_path: str) -> int:
    """Latest committed manifest version, or 0 when the table is empty."""
    fs, jvm = _fs(spark, table_path)
    d = jvm.org.apache.hadoop.fs.Path(f"{table_path.rstrip('/')}/{MANIFEST_DIR}")
    if not fs.exists(d):
        return 0
    best = 0
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def write_snapshot(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    max_retries: int = 10,
) -> int:
    """Publish ``df`` as a new table version; returns the version number.

    ``append`` adds this batch to the current snapshot; ``overwrite``
    makes the new snapshot exactly this batch. The data write happens
    once — only the (tiny) manifest commit retries under contention.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    spark = df.sparkSession
    table_path = table_path.rstrip("/")
    batch = f"data/batch-{uuid.uuid4().hex}"
    df.write.parquet(f"{table_path}/{batch}")
    fs, jvm = _fs(spark, table_path)
    for _ in range(max_retries):
        latest = current_version(spark, table_path)
        batches = [batch]
        if mode == "append" and latest > 0:
            batches = _read_manifest(fs, jvm, table_path, latest)["batches"] + [batch]
        target = _manifest_path(jvm, table_path, latest + 1)
        try:
            # create(path, overwrite=false): the atomic claim. On object
            # stores this maps to a conditional PUT where supported; the
            # worst case (no conditional support) is last-writer-wins on
            # ONE version file — data files are never mutated either way.
            out = fs.create(target, False)
        except Exception:  # claim lost — rebase on the new latest, retry
            continue
        try:
            out.write(
                json.dumps(
                    {"version": latest + 1, "mode": mode, "batches": batches}
                ).encode("utf-8")
            )
        finally:
            out.close()
        return latest + 1
    raise RuntimeError(
        f"lost the manifest claim {max_retries} times for {table_path}"
    )


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Consistent snapshot at ``version`` (default: latest). Only batch
    directories listed by that manifest are read — in-flight or orphaned
    batches are invisible."""
    table_path = table_path.rstrip("/")
    fs, jvm = _fs(spark, table_path)
    v = current_version(spark, table_path) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot in {table_path}")
    m = _read_manifest(fs, jvm, table_path, v)
    return spark.read.parquet(*[f"{table_path}/{b}" for b in m["batches"]])


def vacuum(spark: SparkSession, table_path: str) -> int:
    """Delete batch directories not referenced by the LATEST manifest
    (crashed writers' orphans, overwritten history); returns the number
    removed. Run it only when no reader needs time travel to older
    versions."""
    table_path = table_path.rstrip("/")
    fs, jvm = _fs(spark, table_path)
    v = current_version(spark, table_path)
    live = set()
    if v > 0:
        live = set(_read_manifest(fs, jvm, table_path, v)["batches"])
    data_dir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/data")
    if not fs.exists(data_dir):
        return 0
    removed = 0
    for st in fs.listStatus(data_dir):
        rel = f"data/{st.getPath().getName()}"
        if rel not in live:
            fs.delete(st.getPath(), True)
            removed += 1
    return removed

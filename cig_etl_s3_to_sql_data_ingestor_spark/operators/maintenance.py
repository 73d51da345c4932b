"""Table maintenance: small-file compaction.

Per-batch appends (daily ingest, streaming micro-batches) accumulate
many small parquet files; at scale the resulting task-per-tiny-file
scheduling and open-cost overhead dominate scan time. ``compact_parquet``
rewrites a directory to ~``target_file_bytes`` files:

1. size the output file count from the actual on-disk footprint
   (Hadoop FS metadata — no data read),
2. write the compacted copy to a staging directory,
3. swap staging into place with FS renames (atomic on HDFS/posix;
   on S3 use a manifest/table format — Delta/Iceberg — instead).

Readers see either the old or the new layout, row content identical.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), hpath, jvm


def directory_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) from FS metadata only."""
    fs, hpath, _ = _fs(spark, path)
    n, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if st.isFile() and not name.startswith("_") and not name.startswith("."):
            n += 1
            total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> int:
    """Compact ``path`` to ~target-size files; returns the new file count
    (0 = nothing done)."""
    n_files, total = directory_stats(spark, path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_files < min_files_to_compact or n_out >= n_files:
        return 0
    fs, hpath, jvm = _fs(spark, path)
    staging = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compacting")
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(staging.toString())
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._precompact")
    if not fs.rename(hpath, old):
        raise IOError(f"compaction swap failed for {path}")
    if not fs.rename(staging, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compaction swap-in failed for {path}")
    fs.delete(old, True)
    return n_out

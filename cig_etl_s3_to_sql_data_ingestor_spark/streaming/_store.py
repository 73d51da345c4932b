"""Shared epoch-addressed store reader for the streaming gate family.

Every gate (text dedup, vector index, binary assets, frequency sketch)
persists state as ``<store>/epoch=N`` parquet dirs and reads it back
with the same three rules:

- schema PINNED by the caller (never inferred — an empty or
  partially-written store must not change types);
- ``exclude_epoch`` drops the CURRENT epoch's rows so a crash-replay
  classifies against exactly the state its first attempt saw;
- only the missing-path case maps to an empty frame — any other read
  error propagates (an empty-on-error fallback would silently re-admit
  duplicates / double-count).

One implementation keeps those semantics in lockstep across gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_epoch_store(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    exclude_epoch: int | None = None,
    keep_epoch: bool = False,
) -> DataFrame:
    """``keep_epoch=True`` retains the ``epoch`` partition column (as a
    long) — for stores whose readers must cross-check epoch membership
    between sibling dirs (e.g. bm25_ingest's stats-as-commit-witness);
    an empty/missing store then still carries the column."""
    from pyspark.errors import AnalysisException

    cols = [f.name for f in schema.fields]
    if keep_epoch:
        out_schema = T.StructType(
            list(schema.fields) + [T.StructField("epoch", T.LongType())]
        )
        cols = cols + ["epoch"]
    else:
        out_schema = schema
    try:
        df = spark.read.schema(schema).parquet(path)
        # `epoch` is the store layout's virtual partition column; it is
        # absent when the path exists but no epoch dir ever committed a
        # part file — nothing to exclude (or keep) then.
        if "epoch" not in df.columns:
            if keep_epoch:
                df = df.withColumn("epoch", F.lit(None).cast("long"))
        elif exclude_epoch is not None:
            df = df.filter(F.col("epoch") != exclude_epoch)
        if keep_epoch:
            df = df.withColumn("epoch", F.col("epoch").cast("long"))
        return df.select(cols)
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex):
            return spark.createDataFrame([], out_schema)
        raise
    except Exception as ex:  # noqa: BLE001 — re-raised unless layout-mix
        # A store carrying BOTH flat epochs (a pre-partitioned-layout
        # writer version) and partition-subdir epochs (e.g. bm25's
        # bucket= dirs) defeats Spark's tree-wide partition discovery
        # with CONFLICTING_PARTITION_COLUMN_NAMES. The store is still
        # well-formed — each epoch dir is internally consistent — so
        # fall back to reading per epoch dir (bounded count: compaction
        # keeps the dir list short) and unioning; the pinned schema
        # fills columns a legacy dir lacks with NULL, which the reader
        # treats as "no at-rest layout: scan, don't prune".
        if "CONFLICTING_PARTITION_COLUMN_NAMES" not in str(ex):
            raise
        df = read_epoch_dirs_union(spark, path, schema)
        if df is None:
            return spark.createDataFrame([], out_schema)
        if exclude_epoch is not None:
            df = df.filter(F.col("epoch") != exclude_epoch)
        if not keep_epoch:
            df = df.drop("epoch")
        return df.select(cols)


def list_epoch_dirs(spark: SparkSession, path: str) -> list[tuple[int, str]]:
    """(epoch, dir) pairs under an epoch-addressed store, sorted."""
    from ..fsutil import hadoop_fs

    fs, jvm = hadoop_fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            out.append((int(name.split("=", 1)[1]), f"{path}/{name}"))
    return sorted(out)


def read_epoch_dirs_union(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    epochs: set[int] | None = None,
) -> DataFrame | None:
    """Per-epoch-dir union read with a pinned schema — the mixed-layout
    path (see read_epoch_store), also reused by compaction's fold read.
    Returns None for an empty store (or empty ``epochs`` subset).
    Each dir is read independently, so one dir's partition layout
    cannot conflict with another's; the ``epoch`` column is re-derived
    from the dir name. ``epochs`` restricts to a subset of dirs AT
    LISTING TIME (no lazily-built-then-filtered branches)."""
    dirs = list_epoch_dirs(spark, path)
    if epochs is not None:
        dirs = [(e, p) for e, p in dirs if e in epochs]
    cols = [f.name for f in schema.fields]
    parts = []
    for e, p in dirs:
        d = spark.read.schema(schema).parquet(p)
        parts.append(d.select(cols).withColumn("epoch", F.lit(e).cast("long")))
    if not parts:
        return None
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out

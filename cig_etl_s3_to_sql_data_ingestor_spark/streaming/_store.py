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

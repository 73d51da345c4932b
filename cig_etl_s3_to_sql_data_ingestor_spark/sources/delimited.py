"""Delimited text sources: CSV and JSON-lines with quarantine semantics.

The reference ingests parquet only (`CigEolHostingIngestionLogic.py:10-14`);
real upstream feeds also arrive as CSV extracts and JSON event logs. These
readers extend the same ingestion surface with the rules that matter at
100 TB:

- **Explicit schema, always.** Schema inference is a full extra pass over
  the data before the real read; at scale that doubles the scan bill and
  silently changes types when the sample shifts. Callers pass the schema
  (or reflect it from the target table, like the reference does).
- **Malformed rows are data, not exceptions.** PERMISSIVE mode with a
  corrupt-record column turns parse failures into rows;
  :func:`split_quarantine` separates clean rows from a quarantine frame
  carrying the raw offending text plus whatever cells did parse — the
  pipeline ingests the clean side and ships the quarantine to an audit
  sink instead of dying mid-job (the batch analogue of a dead-letter
  queue).
- **Row validity must not depend on column pruning.** DROPMALFORMED is
  deliberately NOT used: a pruned query under it skips conversions and
  silently changes which rows exist (``count()`` disagrees with
  ``collect()``, SPARK-21610). The PERMISSIVE corrupt column always
  forces full-row validation, so both split sides are stable under any
  projection.
- **Splittable by default.** ``multiLine`` stays off — multi-line
  CSV/JSON files cannot be split across tasks, so one big file would
  serialize onto one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    """Schema + the corrupt-record capture column (Spark only captures
    raw malformed text when the column is declared in the schema)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema and corrupt-record capture.

    A row that fails to parse (wrong arity after quoting, uncastable
    cell) lands with unparsed cells NULL and the raw line preserved in
    ``_corrupt_record``; well-formed rows carry NULL there.
    """
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (one object per line, splittable) with explicit
    schema and corrupt-record capture; same quarantine contract as
    :func:`read_csv`."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantine) from a PERMISSIVE delimited read.

    Clean rows drop the capture column; the quarantine keeps the raw
    malformed text, the source file (``input_file_name``), and the
    PARTIALLY parsed data columns — PERMISSIVE fills every cell it
    decoded before the failure, which is real diagnostic evidence.

    Spark refuses any scan whose referenced columns are ONLY the internal
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN) — which is exactly what a pruned cardinality-only query
    (``count()``, ``isEmpty()``) on either side becomes, since Catalyst
    prunes unused projection columns. Both filters therefore carry an
    always-true term referencing a data column (``IsNull(c) OR
    IsNotNull(c)``, which the optimizer does not fold) so the scan shape
    stays legal under any pruning. If a future optimizer learns to fold
    it, these queries fail LOUDLY with the restriction error — never
    silently, unlike DROPMALFORMED's pruning-dependent row set.
    """
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    if not data_cols:
        raise ValueError("frame has no data columns besides the capture column")
    anchor = F.col(data_cols[0])
    keep_scan_legal = anchor.isNull() | anchor.isNotNull()
    clean = df.filter(F.col(CORRUPT_COL).isNull() & keep_scan_legal).drop(CORRUPT_COL)
    quarantine = df.filter(
        F.col(CORRUPT_COL).isNotNull() & keep_scan_legal
    ).select(
        F.col(CORRUPT_COL).alias("raw_record"),
        F.input_file_name().alias("source_file"),
        *[F.col(c) for c in data_cols],
    )
    return clean, quarantine


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    header: bool = True,
    sep: str = ",",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Convenience: PERMISSIVE read + :func:`split_quarantine`."""
    if fmt == "csv":
        df = read_csv(spark, path, schema, header=header, sep=sep, **options)
    elif fmt == "json":
        df = read_json_lines(spark, path, schema, **options)
    else:
        raise ValueError(f"unsupported delimited format {fmt!r}")
    return split_quarantine(df)

"""Additional batch source formats: ORC, XML, binary assets, and
fixed-width text — the long tail of upstream feeds a complete ingestion
engine must read alongside parquet/CSV/JSONL (sources/delimited.py).

Same rules as the delimited readers: explicit schemas (no inference
pass over 100 TB), splittable reads by default, and every format lands
in a plain DataFrame so the whole transform/dedup/sink surface applies
unchanged.

- **ORC** is Spark-native and keeps the parquet read discipline:
  predicate pushdown and column pruning reach the scan (plan-asserted
  in tests), so an ORC lake is a drop-in swap for the parquet tree.
- **XML** (Spark 4 built-in): explicit ``rowTag`` + schema. XML splits
  by row tag; documents nested under one giant root still parse but a
  single multi-GB element serializes onto one task — feed-level
  partitioning (many files) is the scale path, as with multiLine JSON.
- **Binary assets** via the ``binaryFile`` source: the production
  arrival path for the multimodal operators — image/audio payloads read
  straight from an object-store prefix as (path, length, payload)
  rows that feed decode/resize/fingerprint exactly like the generated
  fixtures (proven by a byte-identical test against the PNG codec).
  ``pathGlobFilter`` prunes by extension server-side; files larger than
  ``spark.sql.sources.binaryFile.maxLength`` fail loudly rather than
  truncate.
- **Fixed-width text**: the mainframe/legacy extract format. One text
  scan, per-column ``substr`` + trim + cast projections — pure codegen,
  no Python, schema declared as (name, start, width, type) tuples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan with the same pushdown/pruning behavior as the parquet
    readers (asserted in tests/test_formats.py)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def read_xml_records(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType,
) -> DataFrame:
    """XML rows under ``row_tag`` with an EXPLICIT schema — inference
    over XML is even costlier than over JSON (full parse of every
    document) and type-unstable across samples."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary payload rows — (asset_path, asset_name, length, payload) —
    from a directory/prefix, the arrival path that feeds the multimodal
    decode operators in production (their docstrings promise exactly
    this source). ``glob`` prunes by pattern during listing, before any
    bytes move."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    out = df.select(
        F.col("path").alias("asset_path"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("asset_name"),
        F.col("length"),
        F.col("content").alias("payload"),
    )
    return out


def fixed_width_schema(
    cols: list[tuple[str, int, int, str]],
) -> list[tuple[str, int, int, str]]:
    """Validate a fixed-width layout: (name, start_1_based, width, type)
    tuples, non-overlapping and in order."""
    pos = 1
    for name, start, width, _ in cols:
        if start < pos:
            raise ValueError(
                f"fixed-width column {name!r} starts at {start}, overlapping "
                f"the previous column ending at {pos - 1}"
            )
        if width <= 0:
            raise ValueError(f"fixed-width column {name!r} has width {width}")
        pos = start + width
    return cols


def read_fixed_width(
    spark: SparkSession,
    path: str,
    cols: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width text records as typed columns: one text scan, one
    codegen projection of ``substr``+trim+cast per column. Numeric casts
    use try_cast so a corrupt cell becomes NULL (quarantine on
    ``_raw IS NOT NULL AND col IS NULL`` if needed) instead of failing
    the task under ANSI."""
    fixed_width_schema(cols)
    raw = spark.read.text(path)
    projections = [
        F.trim(F.col("value").substr(start, width)).try_cast(dtype).alias(name)
        for name, start, width, dtype in cols
    ]
    return raw.select(*projections, F.col("value").alias("_raw"))

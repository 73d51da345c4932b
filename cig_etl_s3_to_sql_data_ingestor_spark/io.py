"""Synthetic-table loading helpers (TESTDATA.md contract).

Timestamp determinism: ``events.ts`` is normalized to TIMESTAMP_NTZ at
load, whatever the parquet vintage encodes (nanos-as-long, µs NTZ, or a
tz-annotated instant). NTZ wall time is exactly what DuckDB reads from
the same file as a naive timestamp, so Spark results and the DuckDB
oracles agree bit-for-bit with NO dependence on the session timezone —
``unix_timestamp``/casts through the session zone are banned on this
column in favor of the ``epoch_micros``/``micros_to_ntz`` helpers below.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Integer µs since epoch for a timestamp column, timezone-independent.

    TIMESTAMP_NTZ is measured against the NTZ epoch with ``timestampdiff``
    (pure wall-time arithmetic — never through the session timezone), which
    equals DuckDB's ``epoch_us(ts)`` on the same naive parquet value.
    TIMESTAMP (an instant) uses ``unix_micros``, which is already absolute.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "timestamp_ntz":
        return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), F.col(col))
    return F.unix_micros(F.col(col))


def epoch_seconds(df: DataFrame, col: str = "ts") -> Column:
    """Integer seconds since epoch (floored), timezone-independent."""
    return F.floor(epoch_micros(df, col) / 1_000_000).cast("long")


def micros_to_ntz(us: Column) -> Column:
    """Rebuild a TIMESTAMP_NTZ wall time from integer epoch µs.

    The inverse of ``epoch_micros`` on the NTZ branch; DuckDB's
    ``make_timestamp(us)`` produces the identical naive value.
    """
    return F.timestamp_add("MICROSECOND", us, F.expr(_EPOCH_NTZ))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes projections/predicates into it."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events with ``ts`` normalized to TIMESTAMP_NTZ (see module doc).

    Parquet vintages seen from the driver's generator: TIMESTAMP(NANOS)
    (readable only as a nanosecond long), and plain µs without a timezone
    (read as NTZ). A tz-annotated instant would arrive as TIMESTAMP; it is
    pinned to its UTC wall time, matching DuckDB's epoch-based reading.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer division: ns -> µs floor, no double round-trip
        df = df.withColumn("ts", micros_to_ntz(F.expr("ts div 1000")))
    elif dt == "timestamp":
        df = df.withColumn("ts", micros_to_ntz(F.unix_micros(F.col("ts"))))
    return df

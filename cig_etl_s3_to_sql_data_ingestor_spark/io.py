"""Synthetic-table loading helpers (TESTDATA.md contract)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes projections/predicates into it.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark refuses by
    default — it is read as a nanosecond long and floored to microseconds
    (identical to DuckDB's µs truncation of the same file)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns -> µs floor, no double round-trip
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df

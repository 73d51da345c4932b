"""Audit Spark-vs-DuckDB result dtypes for every registered query.

The external driver compares results after fetching both sides into pandas
frames; DuckDB's HUGEINT (e.g. SUM over integer columns) lands as float64
there while Spark's bigint lands as int64, which flips the value hash even
when the values are numerically identical. This audit runs every query at a
small scale factor and reports any column whose numeric *kind* (integer vs
float) differs between the two engines, plus any object-dtype asymmetry.

Usage: python scripts/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from cig_etl_s3_to_sql_data_ingestor_spark.io import TABLES
from cig_etl_s3_to_sql_data_ingestor_spark.queries import ORACLES, QUERIES


def kind(dtype) -> str:
    k = dtype.kind  # numpy kind: i/u int, f float, b bool, O object, M datetime
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    conn = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    bad = 0
    for name, fn in QUERIES.items():
        oracle = ORACLES.get(name)
        if oracle is None:
            print(f"{name:28s} SKIP (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = conn.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            continue
        mismatches = []
        for col in sdf.columns:
            if col not in ddf.columns:
                mismatches.append(f"{col}: missing in oracle")
                continue
            sk, dk = kind(sdf[col].dtype), kind(ddf[col].dtype)
            # int-vs-float is the hash-flipping class. A side whose column
            # contains nulls may legitimately surface as float64 (pandas
            # NaN) or object; only flag when neither side has nulls.
            if sk != dk and {sk, dk} <= {"int", "float", "bool"}:
                if sdf[col].isna().any() or ddf[col].isna().any():
                    continue
                mismatches.append(f"{col}: spark={sk} duckdb={dk}")
        if mismatches:
            bad += 1
            print(f"{name:28s} MISMATCH {'; '.join(mismatches)}")
        else:
            print(f"{name:28s} ok")
    spark.stop()
    print(f"\n{bad} queries with dtype mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

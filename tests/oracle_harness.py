"""Mini differential harness mirroring the driver's correctness gate:
run a Spark query and its DuckDB oracle on the same parquet tables, sort
columns by name, canonicalize values, and compare rows order-insensitively.
Stricter than a hash: mismatches show the offending cells.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

from cig_etl_s3_to_sql_data_ingestor_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return conn


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return canon(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def frame_to_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [columns[i] for i in order], sorted(out, key=repr)


def compare(spark, sf_dir: str, spark_fn, oracle: str, name: str = "?"):
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    conn = duckdb_conn(sf_dir)
    try:
        res = conn.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        conn.close()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    sc, sr = frame_to_rows(s_cols, s_rows)
    dc, dr = frame_to_rows(d_cols, d_rows)
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, (
            f"{name}: row {i} differs (cols {sc}):\n  spark : {a}\n  duckdb: {b}"
        )
    return len(sr)

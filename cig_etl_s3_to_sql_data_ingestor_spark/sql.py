"""SQL API surface: register the engine's tables as temp views so users
can query with plain ``spark.sql`` — the reference's consumers query its
SQL Server tables with raw SQL (`test_compare_sql_local_and_prod_data.py:32`);
this is the Spark-native equivalent of that interface.

Because every query's oracle in this repo is written in portable ANSI
SQL, most of them run verbatim through ``spark.sql`` against these views
(tested in tests/test_sql_surface.py) — the engine answers the same
queries through either the DataFrame or the SQL front end, with one
Catalyst plan underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)

"""Bucketed co-located joins: the write-once-shuffle-never contract.

The value assertion checks the join result; the plan assertion checks
the scale property — a join of two identically-bucketed tables must
contain NO Exchange (the buckets already align), while the same join on
plain tables does shuffle.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
from cig_etl_s3_to_sql_data_ingestor_spark.sources.bucketed import (
    co_located_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(od, "b_orders", ["l_orderkey"], n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_no_shuffle_and_correct(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # Disable auto-broadcast so the small test tables take the same
    # sort-merge path the 100 TB tables would.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, lt, rt, ["l_orderkey"])
        plan = _formatted_plan(spark, joined)
        assert "SortMergeJoin" in plan
        assert not re.search(r"\(\d+\) Exchange", plan), plan

        # Same join on plain (unbucketed) frames shuffles both sides.
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
        )
        plain = li.join(od, ["l_orderkey"])
        plain_plan = _formatted_plan(spark, plain)
        assert re.search(r"\(\d+\) Exchange", plain_plan)

        # Results identical.
        assert joined.count() == plain.count()
        a = joined.agg(F.sum("l_quantity").cast("long")).first()[0]
        b = plain.agg(F.sum("l_quantity").cast("long")).first()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

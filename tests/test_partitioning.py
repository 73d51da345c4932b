"""fan_out and salted_join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.partitioning import fan_out, salted_join


def test_fan_out_spreads_single_partition(spark):
    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_fan_out_noop_on_well_split(spark):
    df = spark.range(100).repartition(16)
    assert fan_out(df, target=8) is df


def test_salted_join_matches_plain_join(spark):
    # Skewed big side: 90% of rows share key 0.
    big = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    medium = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("mval")
    )
    plain = big.join(medium, "k").select("k", "payload", "mval")
    salted = salted_join(big, medium, "k").select("k", "payload", "mval")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    medium = spark.range(3).select(F.col("id").alias("k"), F.lit("m").alias("v"))
    out = salted_join(big, medium, "k", how="left")
    assert out.count() == 10
    assert out.filter(F.col("v").isNull()).count() == 7

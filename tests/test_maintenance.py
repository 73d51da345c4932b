"""Small-file compaction: fewer files, identical rows, safe swap."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
    compact_parquet,
    directory_stats,
)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # 20 tiny appends -> >= 20 data files.
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
    before_files, before_bytes = directory_stats(spark, path)
    assert before_files >= 20
    before_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())

    n_out = compact_parquet(spark, path, target_file_bytes=before_bytes)
    assert n_out == 1
    after_files, _ = directory_stats(spark, path)
    assert after_files < before_files
    after_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows == list(range(200))


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(100).coalesce(1).write.parquet(path)
    assert compact_parquet(spark, path) == 0

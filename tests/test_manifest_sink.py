"""Manifest-committed parquet tables: snapshot atomicity without renames."""

from __future__ import annotations

import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.sources import manifest_sink as M


def test_append_versions_accumulate(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = M.write_snapshot(spark.range(0, 10), t, mode="append")
    v2 = M.write_snapshot(spark.range(10, 15), t, mode="append")
    assert (v1, v2) == (1, 2)
    assert M.current_version(spark, t) == 2
    assert M.read_snapshot(spark, t).count() == 15
    # time travel: version 1 still readable and unchanged
    assert M.read_snapshot(spark, t, version=1).count() == 10


def test_overwrite_replaces_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.write_snapshot(spark.range(0, 10), t, mode="append")
    M.write_snapshot(spark.range(0, 3), t, mode="overwrite")
    assert M.read_snapshot(spark, t).count() == 3


def test_orphan_batch_is_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.write_snapshot(spark.range(0, 10), t)
    # Simulate a writer that crashed after the data write, before the
    # manifest commit: a batch directory with no manifest entry.
    orphan = tmp_path / "tbl" / "data" / "batch-deadbeef"
    spark.range(100, 200).write.parquet(str(orphan))
    assert M.read_snapshot(spark, t).count() == 10  # invisible
    assert M.vacuum(spark, t) == 1
    assert not orphan.exists()
    assert M.read_snapshot(spark, t).count() == 10


def test_lost_claim_rebases_and_retries(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.write_snapshot(spark.range(0, 5), t)
    # Another writer claims v2 between our data write and commit: simulate
    # by pre-creating the v2 manifest file with a valid snapshot.
    mdir = tmp_path / "tbl" / "_manifests"
    import json

    v1 = json.loads((mdir / "v1.json").read_text())
    (mdir / "v2.json").write_text(
        json.dumps({"version": 2, "mode": "append", "batches": v1["batches"]})
    )
    v = M.write_snapshot(spark.range(5, 9), t, mode="append")
    assert v == 3
    # The rebased append sees v2's batches plus its own.
    assert M.read_snapshot(spark, t).count() == 9


def test_empty_table_reads_fail_loudly(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        M.read_snapshot(spark, str(tmp_path / "none"))


def test_vacuum_after_overwrite_reclaims_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.write_snapshot(spark.range(0, 10), t, mode="append")
    M.write_snapshot(spark.range(0, 3), t, mode="overwrite")
    assert M.vacuum(spark, t) == 1  # version-1 batch reclaimed
    assert M.read_snapshot(spark, t).count() == 3

"""Small-file compaction and z-order layout maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
    compact_parquet,
    directory_stats,
    zorder_write,
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


def _file_envelopes(path, cols):
    """Per-parquet-file (min, max) of each column from footer statistics —
    exactly the metadata a scan uses to skip files/row groups."""
    import glob

    import pyarrow.parquet as pq

    out = {c: [] for c in cols}
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for i, name in enumerate(schema_names):
                if name in cols:
                    st = md.row_group(rg).column(i).statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        for c in cols:
            out[c].append((lo[c], hi[c]))
    return out


def _coverage(envelopes):
    """Mean fraction of the global value range a single file spans —
    1.0 = every file covers everything (no pruning possible)."""
    glo = min(lo for lo, _ in envelopes)
    ghi = max(hi for _, hi in envelopes)
    span = max(ghi - glo, 1)
    return sum(hi - lo for lo, hi in envelopes) / (len(envelopes) * span)


def test_zorder_layout_narrows_file_envelopes(spark, sf_dir, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    # Independent dimensions (l_suppkey is a deterministic function of
    # l_partkey in TPC-H, so that pair cannot mutually cluster).
    cols = ["l_partkey", "l_quantity"]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", *cols)

    naive = str(tmp_path / "naive")
    li.repartition(4).write.mode("overwrite").parquet(naive)
    zordered = str(tmp_path / "zorder")
    zorder_write(li, zordered, cols, n_files=4, bits=6)

    # Same rows either way.
    assert (
        spark.read.parquet(zordered).count()
        == spark.read.parquet(naive).count()
        == li.count()
    )

    for c in cols:
        naive_cov = _coverage(_file_envelopes(naive, [c])[c])
        z_cov = _coverage(_file_envelopes(zordered, [c])[c])
        # Round-robin files each span ~the full key range; 4 z-curve
        # quadrants span ~half of each dimension.
        # approxQuantile's summary merge order and repartitionByRange's
        # boundary sampling both vary with task scheduling, so coverage
        # jitters between runs (observed up to ~0.75 on a quadrant whose
        # ideal is ~0.55). Assert the property that matters — a SUBSTANTIAL
        # narrowing versus the round-robin layout — with jitter margin.
        assert naive_cov > 0.85, f"{c}: naive layout unexpectedly clustered"
        assert z_cov < 0.82, f"{c}: z-order did not narrow file envelopes ({z_cov})"
        assert z_cov < 0.9 * naive_cov, f"{c}: narrowing too weak ({z_cov} vs {naive_cov})"


def test_zorder_handles_dates_and_rejects_strings(spark, sf_dir, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        zorder_write,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_partkey", "l_returnflag"
    )
    out = str(tmp_path / "zdate")
    zorder_write(li, out, ["l_shipdate", "l_partkey"], n_files=2)
    assert spark.read.parquet(out).count() == li.count()

    import pytest

    with pytest.raises(ValueError, match="l_returnflag"):
        zorder_write(li, str(tmp_path / "zbad"), ["l_returnflag"], n_files=2)


def test_zorder_compact_noop_on_empty_dir(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        zorder_compact,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    assert zorder_compact(spark, str(empty), ["a"]) == 0


def test_zorder_snapshot_clusters_manifest_table_rename_free(spark, sf_dir, tmp_path):
    """The object-store path: a clustering rewrite lands as a fresh batch
    + one manifest commit. Rows survive, file envelopes narrow, the
    pre-rewrite version stays time-travelable, and no rename ever moves
    the live data directory."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        zorder_snapshot,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.sources import manifest_sink as M

    cols = ["l_partkey", "l_quantity"]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", *cols)
    t = str(tmp_path / "ztbl")
    # Two appends -> round-robin-ish multi-batch layout.
    half = li.filter(F.col("l_orderkey") % 2 == 0)
    other = li.filter(F.col("l_orderkey") % 2 == 1)
    M.write_snapshot(half.repartition(2), t, mode="append")
    M.write_snapshot(other.repartition(2), t, mode="append")
    n_rows = li.count()
    assert M.read_snapshot(spark, t).count() == n_rows

    _, total_bytes = directory_stats(spark, f"{t}/data")
    v = zorder_snapshot(spark, t, cols, target_file_bytes=total_bytes // 4 + 1)
    assert v == 3
    assert M.read_snapshot(spark, t).count() == n_rows
    # Pre-rewrite snapshot still readable (time travel, no renames).
    assert M.read_snapshot(spark, t, version=2).count() == n_rows

    # The new version's batch is z-clustered: envelopes narrow vs the
    # union of the old batches.
    import json

    mdir = tmp_path / "ztbl" / "_manifests"
    new_batches = json.loads((mdir / "v3.json").read_text())["batches"]
    old_batches = json.loads((mdir / "v2.json").read_text())["batches"]
    assert len(new_batches) == 1 and new_batches[0] not in old_batches
    for c in cols:
        old_env = []
        for b in old_batches:
            old_env += _file_envelopes(f"{t}/{b}", [c])[c]
        new_env = _file_envelopes(f"{t}/{new_batches[0]}", [c])[c]
        assert len(new_env) >= 2
        assert _coverage(new_env) < 0.9 * _coverage(old_env), c


def test_zorder_snapshot_noop_on_empty_table(spark, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        zorder_snapshot,
    )

    assert zorder_snapshot(spark, str(tmp_path / "none"), ["a"]) == 0


def test_merge_aggregate_state_handles_one_sided_keys(spark):
    """A key present only in history or only in the delta must survive
    the merge with the other side contributing identity values."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_state,
    )

    old = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], ["k", "v"]
    )
    delta = spark.createDataFrame([("a", 30.0), ("c", 7.0)], ["k", "v"])
    merged = merge_aggregate_state(
        aggregate_state(old, ["k"], "v"),
        aggregate_state(delta, ["k"], "v"),
        ["k"],
    )
    out = {
        r.k: (r.n_rows, r.total_value, r.min_value, r.max_value, r.avg_value)
        for r in finalize_aggregate_state(merged, ["k"]).collect()
    }
    assert out["a"] == (3, 60.0, 10.0, 30.0, 20.0)
    assert out["b"] == (1, 5.0, 5.0, 5.0, 5.0)   # history-only key
    assert out["c"] == (1, 7.0, 7.0, 7.0, 7.0)   # delta-only key

    # Merging with the full recompute is the associativity identity.
    both = aggregate_state(old.unionByName(delta), ["k"], "v")
    full = {
        r.k: (r.n_rows, r.total_value)
        for r in finalize_aggregate_state(both, ["k"]).collect()
    }
    assert {k: v[:2] for k, v in out.items()} == full


def test_aggregate_state_honors_nondefault_scale(spark):
    """scale=6 must keep 6 decimal places through the state sum and the
    merge — the merge == full-recompute identity at any scale (the
    review caught the state hardcoding scale 4, which silently rounded
    and broke the identity)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_state,
    )

    old = spark.createDataFrame([("a", 1.000050)], ["k", "v"])
    delta = spark.createDataFrame([("a", 2.000050)], ["k", "v"])
    merged = merge_aggregate_state(
        aggregate_state(old, ["k"], "v", scale=6),
        aggregate_state(delta, ["k"], "v", scale=6),
        ["k"],
    )
    full = aggregate_state(old.unionByName(delta), ["k"], "v", scale=6)
    got = finalize_aggregate_state(merged, ["k"]).first()
    want = finalize_aggregate_state(full, ["k"]).first()
    assert got.total_value == want.total_value == 3.0001

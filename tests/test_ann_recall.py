"""ANN recall@k against brute-force ground truth.

Oracle parity for the ANN queries proves both engines run the SAME
algorithm — it says nothing about whether the algorithm finds the true
neighbors. This harness measures recall@k against `brute_force_topk`
(the exact baseline), pins floors for the DEFAULT operating points, and
records the probes/recall trade-off so the dials are documented with
measured numbers, not guesses.

Everything here is deterministic (hash-based sampling, sorted KMeans
init, axis-aligned LSH), so recall on a fixed fixture is a constant —
the floors are tight assertions, not flaky statistics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S

K = 10
N_QUERIES = 32


@pytest.fixture(scope="module")
def ground_truth(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    gt = (
        S.brute_force_topk(e, q, k=K)
        .select("query_id", "cand_id")
        .cache()
    )
    gt.count()
    return e, q, gt


def _recall(gt, approx) -> float:
    total = gt.count()
    hits = gt.join(approx.select("query_id", "cand_id"), ["query_id", "cand_id"]).count()
    return hits / total


def test_banded_lsh_default_recall_floor(ground_truth):
    e, q, gt = ground_truth
    recall = _recall(gt, S.axis_lsh_topk(e, q, k=K))
    assert recall >= 0.95, f"banded-LSH default recall@{K} fell to {recall:.3f}"


def test_banded_lsh_banding_tradeoff(ground_truth):
    """Fewer bands must cost recall (the OR-amplification story): the
    single-band form is the documented recall cliff."""
    e, q, gt = ground_truth
    one_band = _recall(gt, S.axis_lsh_topk(e, q, k=K, bands=1, band_bits=4))
    default = _recall(gt, S.axis_lsh_topk(e, q, k=K))
    assert one_band < 0.5, f"one-band LSH unexpectedly strong ({one_band:.3f})"
    assert default > one_band + 0.3


def test_ivf_default_recall_floor(ground_truth):
    e, q, gt = ground_truth
    recall = _recall(
        gt, S.ivf_topk(e, q, k=K, n_cells=16, kmeans_sample_mod=4)
    )
    assert recall >= 0.90, f"IVF default recall@{K} fell to {recall:.3f}"


def test_ivf_probe_recall_curve(ground_truth):
    """recall@k must be monotone in n_probe and reach 1.0 when every
    cell is probed (probing all cells IS brute force)."""
    e, q, gt = ground_truth
    curve = {
        n: _recall(
            gt, S.ivf_topk(e, q, k=K, n_cells=16, n_probe=n, kmeans_sample_mod=4)
        )
        for n in (4, 12, 16)
    }
    assert curve[4] <= curve[12] <= curve[16]
    assert curve[16] == pytest.approx(1.0), curve
    assert curve[4] < 0.8, f"probe curve lost its trade-off shape: {curve}"


def test_pq_default_recall_floor(ground_truth):
    """PQ at the shipped defaults (16 subspaces x 16 codes, ADC + k*8
    shortlist exact re-rank) must stay close to brute force on the
    fixture — the re-rank step means recall is bounded by whether true
    neighbors reach the ADC shortlist, which is the quantity measured
    here."""
    e, q, gt = ground_truth
    recall = _recall(gt, S.pq_topk(e, q, k=K))
    assert recall >= 0.90, f"PQ default recall@{K} fell to {recall:.3f}"


def test_pq_shortlist_tradeoff(ground_truth):
    """A wider ADC shortlist must not lose recall, and a 1x shortlist
    (pure ADC ranking, no slack for quantization error) must cost some."""
    e, q, gt = ground_truth
    narrow = _recall(gt, S.pq_topk(e, q, k=K, shortlist_factor=1))
    default = _recall(gt, S.pq_topk(e, q, k=K))
    wide = _recall(gt, S.pq_topk(e, q, k=K, shortlist_factor=16))
    assert narrow < default <= wide, (narrow, default, wide)


def test_ivf_pq_composed_recall(ground_truth):
    """The composed index loses recall from BOTH stages (probe miss x
    shortlist miss) but must stay within a few points of the weaker
    stage — if composition cratered recall, the candidate restriction
    would be wrong, not just lossy."""
    e, q, gt = ground_truth
    composed = _recall(gt, S.ivf_pq_topk(e, q, k=K, kmeans_sample_mod=4))
    ivf_only = _recall(gt, S.ivf_topk(e, q, k=K, n_cells=16, kmeans_sample_mod=4))
    pq_only = _recall(gt, S.pq_topk(e, q, k=K))
    assert composed >= 0.80, f"IVF-PQ recall@{K} fell to {composed:.3f}"
    assert composed <= min(ivf_only, pq_only) + 0.05, (
        composed, ivf_only, pq_only,
    )


def test_prebuilt_index_search_identical_to_full_path(ground_truth):
    """The train-once/search-many path (codebooks/codes/centroids/
    assignment injected, as streaming/vector_ingest and the bench's
    ann_*_search entries use it) must return BIT-IDENTICAL results to
    the end-to-end call — amortization is a caching decision, never a
    semantics change."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist

    e, q, _gt = ground_truth

    def rows(df):
        return sorted(
            (r.query_id, r.cand_id, r.rank, round(r.cosine_sim, 12))
            for r in df.collect()
        )

    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = _persist(S.pq_encode(e, cb, subs=subs))
    assert rows(S.pq_topk(e, q, k=K, codebooks=cb, codes=codes)) == rows(
        S.pq_topk(e, q, k=K)
    )

    centroids = _persist(
        S.kmeans_centroids(e, n_cells=16, n_iters=2, sample_mod=4).select(
            F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
        )
    )
    assigned = _persist(
        S.ivf_assign(e, centroids, "vec_id", "embedding", n_probe=1).select(
            "cand_id", "cell_id"
        )
    )
    assert rows(
        S.ivf_pq_topk(
            e, q, k=K,
            centroids=centroids, assigned=assigned, codebooks=cb, codes=codes,
        )
    ) == rows(S.ivf_pq_topk(e, q, k=K, kmeans_sample_mod=4))
    for df in (subs, cb, codes, centroids, assigned):
        df.unpersist()


def test_packed_search_identical_to_join_path(ground_truth):
    """The latency path (dense packed codes, driver-computed distance
    tables and probes, in-row ADC) must return BIT-IDENTICAL results to
    the join-based search for BOTH plain PQ and IVF+PQ — the Python LUT
    fold replicates Spark's l2sq/dot IEEE fold exactly, and a packing or
    dense-remap bug would break this, not just slow it down. Also pins
    the raw-rows input forms (queries/codebooks/centroids as collected
    tuples, the deployed client-resident shape)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist

    e, q, _gt = ground_truth

    def rows(df):
        return sorted(
            (r.query_id, r.cand_id, r.rank, r.cosine_sim) for r in df.collect()
        )

    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = _persist(S.pq_encode(e, cb, subs=subs))
    cb_rows = [tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()]
    packed = _persist(S.pq_pack_codes(codes, cb_rows))
    q_rows = [tuple(r) for r in q.select("vec_id", "embedding").collect()]

    assert rows(S.pq_search_packed(e, q_rows, cb_rows, packed, k=K)) == rows(
        S.pq_topk(e, q, k=K, codebooks=cb, codes=codes)
    )
    # DataFrame inputs must behave identically to pre-collected rows.
    assert rows(S.pq_search_packed(e, q, cb, packed, k=K)) == rows(
        S.pq_topk(e, q, k=K, codebooks=cb, codes=codes)
    )

    centroids = _persist(
        S.kmeans_centroids(e, n_cells=16, n_iters=2, sample_mod=4).select(
            F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
        )
    )
    assigned = _persist(
        S.ivf_assign(e, centroids, "vec_id", "embedding", n_probe=1).select(
            "cand_id", "cell_id"
        )
    )
    packed_cells = _persist(packed.join(assigned, "cand_id"))
    cent_rows = [
        tuple(r) for r in centroids.select("vec_id", "embedding").collect()
    ]
    assert rows(
        S.pq_search_packed(
            e, q_rows, cb_rows, packed_cells, k=K,
            centroids=cent_rows, n_probe=12,
        )
    ) == rows(
        S.ivf_pq_topk(
            e, q, k=K,
            centroids=centroids, assigned=assigned, codebooks=cb, codes=codes,
        )
    )
    # Plan shape: the literal-LUT explode must never plan a cartesian,
    # and the exact re-rank join must be broadcast (packed search is not
    # a registered query, so scripts/plan_audit.py never sees it).
    plan = (
        S.pq_search_packed(e, q_rows, cb_rows, packed, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    # Guards: non-integer ids and non-finite vectors fail loudly (both
    # are silently wrong through the SQL-literal path otherwise).
    with pytest.raises(TypeError, match="integer ids"):
        S.pq_search_packed(
            e, [("q1", [0.0] * 64)], cb_rows, packed, k=K
        )
    with pytest.raises(ValueError, match="finite"):
        S.pq_search_packed(
            e, [(0, [float("inf")] * 64)], cb_rows, packed, k=K
        )
    # bool is an int subclass but would format as the SQL literal
    # 'TrueL' — it must hit the id guard, not an opaque parse error.
    with pytest.raises(TypeError, match="integer ids"):
        S.pq_search_packed(
            e, [(True, [0.0] * 64)], cb_rows, packed, k=K
        )
    # The interactive-batch boundary is a TOTAL LUT-entries budget
    # (queries x n_sub x n_codes), not a flat query count: 513 queries
    # on the 16x16 book is 131328 entries, just over the 131072 budget.
    with pytest.raises(ValueError, match="LUT literals"):
        S.pq_search_packed(
            e,
            [(i, [0.0] * 64) for i in range(513)],
            cb_rows,
            packed,
            k=K,
        )

    for df in (subs, cb, codes, packed, centroids, assigned, packed_cells):
        df.unpersist()


def test_sq8_recall_floor(ground_truth):
    """Asymmetric int8 scalar quantization keeps near-exact ranking:
    255 levels per dim is ~0.2% step error, so top-10 recall on the
    fixture is 319/320. Floor pinned just below the measured constant."""
    e, q, gt = ground_truth
    recall = _recall(gt, S.sq8_topk(e, q, k=K))
    assert recall >= 0.99, f"SQ8 recall@{K} fell to {recall:.3f}"


def test_ivf_sq8_composed_recall(ground_truth):
    """IVF + SQ8 composed: with 255 levels the scalar quantizer is
    near-exact, so the composition's recall matches IVF-flat on the
    fixture (0.9625 both — cell routing, not quantization, is the
    recall bound). Floor pinned below the measured constant; the
    second assertion pins 'quantization costs (almost) nothing' so a
    future change that degrades the SQ8 metric shows up here, not just
    in the absolute floor."""
    e, q, gt = ground_truth
    ivf = _recall(gt, S.ivf_topk(e, q, k=K, n_cells=16, n_probe=12))
    comp = _recall(gt, S.ivf_sq8_topk(e, q, k=K, n_cells=16, n_probe=12))
    assert comp >= 0.95, f"IVF+SQ8 recall@{K} fell to {comp:.3f}"
    assert comp >= ivf - 0.02, (
        f"SQ8 quantization cost {ivf - comp:.3f} recall inside IVF cells"
    )


def test_ivf_sq8_prepared_twin_identical_to_full_path(spark, sf_dir):
    """The bench's amortized ann_ivf_sq8_search body (prebuilt centroids
    + reconstructed members, probes inside the timer) must return
    BIT-IDENTICAL rows to ann_ivf_sq8_topk — amortization is a caching
    decision, never a semantics change."""
    import importlib.util
    import os

    from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    thunk = bench._ivf_sq8_search_prepare(spark, sf_dir)
    got = sorted(
        (r.query_id, r.cand_id, r.rank, r.sq8_sim) for r in thunk().collect()
    )
    want = sorted(
        (r.query_id, r.cand_id, r.rank, r.sq8_sim)
        for r in QUERIES["ann_ivf_sq8_topk"](spark, sf_dir).collect()
    )
    assert got == want


def test_cluster_balanced_sample_properties(spark, sf_dir):
    """Per-cell keep count is exactly ceil(cell_size/5), picks are
    dense ranks 1..k within each cell, and the selected set is
    invariant to input partitioning (md5 order, no RNG)."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    out = S.cluster_balanced_sample(
        e, rate_num=1, rate_den=5, n_cells=16, kmeans_sample_mod=4
    )
    rows = out.collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r)
    assert by_cell, "no cells sampled"
    for cell, members in by_cell.items():
        size = members[0]["cell_size"]
        assert all(m["cell_size"] == size for m in members)
        assert len(members) == math.ceil(size / 5), f"cell {cell}"
        assert sorted(m["pick_rank"] for m in members) == list(
            range(1, len(members) + 1)
        )
    total = e.count()
    assert sum(m[0]["cell_size"] for m in by_cell.values()) <= total
    redo = {
        (r["vec_id"], r["cell_id"])
        for r in S.cluster_balanced_sample(
            e.repartition(13), rate_num=1, rate_den=5, n_cells=16,
            kmeans_sample_mod=4,
        ).collect()
    }
    assert redo == {(r["vec_id"], r["cell_id"]) for r in rows}


def test_cluster_balanced_sample_rate_validation(spark, sf_dir):
    import pytest

    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="rate"):
        S.cluster_balanced_sample(e, rate_num=6, rate_den=5)
    with pytest.raises(ValueError, match="rate"):
        S.cluster_balanced_sample(e, rate_num=0, rate_den=5)


def test_truncated_rerank_recall_floor_and_factor_curve(ground_truth):
    """Dimension-adaptive retrieval: recall@10 vs exact brute force on
    the fixture. The synthetic embeddings are NOT MRL-trained — a
    16/64 prefix carries a random 25% of the information, so recall is
    far from the ~0.95+ an MRL-trained model shows at the same ratio;
    the floors pin exactly that documented behavior (deterministic
    pipeline -> recall is a constant: measured 0.434 at factor 4,
    0.613 at factor 8 on this fixture). Widening the shortlist factor
    must monotonically recover recall (the exact-rerank property)."""
    e, q, gt = ground_truth
    total = gt.count()
    r = {}
    for factor in (4, 8):
        tr = S.truncated_rerank_topk(
            e, q, k=K, prefix_dims=16, shortlist_factor=factor
        )
        hits = gt.join(
            tr.select("query_id", "cand_id"), ["query_id", "cand_id"]
        ).count()
        r[factor] = hits / total
    assert r[4] >= 0.42, r
    assert r[8] >= 0.59, r
    assert r[8] >= r[4], r


def test_hard_negatives_exclude_query_label(spark, sf_dir):
    """Every mined negative's label differs from its query's, ranks are
    dense 1..k, and the top negative is the best cross-label candidate
    (cross-checked against brute_force_topk with a post-filter on a
    full-corpus ranking)."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = S.hard_negatives(e, q, k=10)
    labels = {r["vec_id"]: r["label"] for r in q.select("vec_id", "label").collect()}
    rows = out.collect()
    assert len(rows) == 8 * 10
    by_q = {}
    for r in rows:
        assert r["neg_label"] != labels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cand_id"], r["cosine_sim"]))
    full = S.brute_force_topk(e, q, k=e.count()).collect()
    cand_label = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    for qid, got in by_q.items():
        got.sort()
        assert [g[0] for g in got] == list(range(1, 11))
        want = [
            (r["cand_id"], r["cosine_sim"])
            for r in sorted(full, key=lambda r: (r["query_id"], r["rank"]))
            if r["query_id"] == qid and cand_label[r["cand_id"]] != labels[qid]
        ][:10]
        assert [(c, s) for _, c, s in got] == want


def test_vector_store_search_partial_probe_recall_floor(spark, sf_dir, tmp_path):
    """r10 verdict #8: the PERSISTED store's search path gets the same
    recall discipline as the batch operators. Batch ANN has pinned
    floors above; the streaming store's search was asserted only at
    all-cells-probed equality — this pins recall@k at the DEFAULT
    partial probe (n_probe=4 of 16 cells) against brute force over the
    admitted members, plus the monotone probe curve up to exactness.
    Deterministic (sorted KMeans init on a fixed fixture), so the floor
    is a tight constant, not a flaky statistic."""
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
        read_index_store,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_path = str(tmp_path / "centroids")
    S.kmeans_centroids(e, n_cells=16, sample_mod=4).write.parquet(cents_path)
    vec = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=str(tmp_path / "idx"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    vec._process_batch(e.filter(F.col("vec_id") % 2 == 0), 0)
    vec._process_batch(e.filter(F.col("vec_id") % 2 != 0), 1)
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    admitted = read_index_store(spark, vec.store_path).select(
        "vec_id", "embedding"
    )
    gt = S.brute_force_topk(admitted, queries, k=K).select(
        "query_id", "cand_id"
    )
    curve = {
        n: _recall(gt, vec.search(queries, k=K, n_probe=n))
        for n in (4, 12, 16)
    }
    # Measured constant on the fixture: {4: 0.5625, 12: 0.934, 16: 1.0}.
    # The synthetic embeddings are near-uniform — true neighbors spread
    # almost evenly across cells, so 4/16 probes bounds recall near
    # 4/16-ish plus the query-cell concentration; clustered real
    # corpora sit far above this. The floor pins the shipped default
    # against regression, not against the fixture's geometry.
    assert curve[4] >= 0.55, (
        f"store search recall@{K} at default n_probe=4 fell to "
        f"{curve[4]:.3f}: {curve}"
    )
    assert curve[4] <= curve[12] <= curve[16]
    assert curve[16] == pytest.approx(1.0), curve

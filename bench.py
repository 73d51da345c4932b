#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization,
no write cost). Warmup queries amortize JVM/codegen/Python-worker startup,
and each query reports the min of $SPARK_GRAFT_BENCH_RUNS (default 3)
runs — steady-state engine throughput, not session boot or JIT noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES  # noqa: E402
from cig_etl_s3_to_sql_data_ingestor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pricing_summary",
    "verification_query",
    "shipping_priority",
    "region_nation_revenue",
    "top_returned_customers",
    "nation_trade_volume",
    "promo_revenue_share",
    "customer_activity_setops",
    "large_volume_orders",
    "order_rollup",
    "asof_last_click",
    "events_in_windows",
    "ann_ivf_topk",
    "config_enrich_join",
    "marker_antijoin",
    "topk_per_group",
    "partition_prune_counts",
    "windowed_events",
    "sessionize",
    "sentinel_cleaning",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "dedup_canonical",
    "budget_select",
    "profile_table",
    "tfidf_top_terms",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "embedding_neardup",
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_features",
    "brand_supplier_counts",
    "disjunctive_revenue",
    "idle_customers",
    "rolling_daily_revenue",
    "price_deciles",
    "fuzzy_name_pairs",
    "scd2_user_state",
    "order_cube",
    # round 2: LLM training-data prep surface
    "contamination_check",
    "chunk_documents",
    "pack_sequences",
    "stratified_sample",
    "interleave_sources",
    "pii_redaction",
    # round 3: repetition/LM quality signals, cluster summary, mixture
    # plan, exact-substring spans
    "repetition_stats",
    "char_lm_surprisal",
    "embedding_clusters",
    "source_mixture_plan",
    "exact_substring_overlap",
    "sole_return_supplier",
    "dominant_part_suppliers",
    "weekly_range_revenue",
    # round 4 additions — real multimodal decode paths
    "multimodal_frame_sample",
    "audio_features",
    # round 4 additions — corpus mining + analytic quantiles
    "cross_source_overlap",
    "ngram_diversity",
    "text_normalize_stats",
    "boilerplate_prefix_groups",
    "vocab_stats",
    "customer_order_distribution",
    "quarterly_top_supplier",
    "nation_quarterly_growth",
    "cheapest_supplier_per_part",
    "fulfillment_lag_quantiles",
    "source_quality_funnel",
    "market_share_by_year",
    "ann_incremental",
    # round 4, late session — Q6/Q17 gap fill + skew diagnostics
    "discount_band_revenue",
    "small_quantity_revenue",
    "heavy_hitter_keys",
    "bpe_merge_steps",
    "bpe_corpus_compression",
    "cms_word_frequency",
    "bloom_decontamination",
    "conversion_funnel",
    "cohort_retention",
    # round 4, late session — sequence analytics, embedding eval, PQ,
    # sketch envelopes, distribution divergence
    "event_transition_matrix",
    "knn_label_eval",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "approx_quantile_envelope",
    "source_token_divergence",
    "incremental_agg_merge",
    "cdc_snapshot",
    "part_copurchase_pagerank",
    "char_entropy",
    "image_ahash_groups",
    "audio_fingerprint_groups",
    "curation_decisions",
    "priority_sample",
    "price_quantity_stats",
    "weekday_event_chi2",
    # round 5: amortized ANN search (train-once/search-many deployment
    # shape) — prepared entries whose index builds OUTSIDE the timer,
    # so a regression in SEARCH is not masked by training noise.
    "ann_pq_search",
    "ann_ivf_pq_search",
    # round 6: the previously-unbenched remainder of the registry — all
    # cheap, but a perf regression anywhere should be visible
    # (round-5 verdict #5). Every queries() entry now has a bench row.
    "dedup_clusters",
    "median_order_value",
    "daily_event_pivot",
    "above_brand_average",
    "distinct_keys",
    "length_histogram",
    "order_priority_count",
    "worklist_semi_join",
    "latest_per_group",
    "staleness_tiered",
    "integrity_audit",
    "approx_distinct_stats",
    "embedding_norms",
    "lang_id",
    "lang_id_confusion",
    "deterministic_split",
    "env_derivation",
    "json_props_stats",
    "ordered_projection",
    "timestamp_truncation",
    # round 6 (bench-only) -> round 9 (registered + oracle-backed):
    # the scale-path twins of the quadratic-by-semantics queries the
    # 10x sweep flagged — now full queries() entries in
    # queries/vectors.py, benched like any registered query.
    "embedding_neardup_cells",
    "knn_label_eval_ann",
    "ann_incremental_cells",
    # round 6 additions: BM25 retrieval + SemDeDup decisions, plus the
    # amortized indexed-search variant (index built OUTSIDE the timer —
    # the build-once/search-many deployment shape, like ann_pq_search).
    "bm25_search",
    "semdedup_keep",
    "semdedup_keep_cells",
    "bm25_search_indexed",
    "bm25_incremental",
    "ann_mmr_topk",
    "collocation_pmi",
    "phrase_search",
    # round 7: index-composed retrieval — MMR over the PQ shortlist and
    # phrase search over the k-gram posting store (both oracle-scored),
    # plus their amortized prepared twins (index built OUTSIDE the
    # timer): MMR over pq_search_packed against prebuilt packed codes,
    # and phrase search over a prebuilt posting store.
    "ann_mmr_pq",
    "phrase_search_indexed",
    "ann_mmr_pq_search",
    "phrase_search_from_index",
    # round 7: curation operators — Gopher rule filter, MOSS winnowing
    # (site selection + cross-doc groups), Efraimidis–Spirakis weighted
    # sampling, DSIR importance weights.
    "gopher_quality_rules",
    "winnowing_sites",
    "winnowing_groups",
    "weighted_sample",
    "dsir_importance_weights",
    "winnowing_matches",
    "curation_pipeline",
    "dataset_report",
    "cdc_chunks",
    "cdc_chunk_dedup",
    "nb_quality_classifier",
    # round 8: learned curation capstone (Gopher rules -> NB classifier
    # -> winnowing near-dup, first-fail reasons), the deterministic
    # training-shard/pack-bin plan, and the bench-only composed
    # TERMINAL pipeline: prepare_corpus -> shard assignment ->
    # exactly-once manifest-committed sharded write (fresh table per
    # run — resume would make repeat runs no-ops).
    "curation_pipeline_learned",
    "training_shard_plan",
    "corpus_shards_write",
    # round 8, continued: the streaming CDC gate's classification rule
    # as a batch oracle query, and the NB margin calibration audit.
    "cdc_reuse_gate",
    "nb_score_calibration",
    "dsir_domain_select",
    "nb_budget_select",
    # round 8, session 2: sparse lexical cosine near-dup (AllPairs-style
    # rare-prefix blocking + integer-exact verify), the CCNet-style
    # frequent-segment document filter, and int8 scalar-quantized
    # asymmetric ANN (codes-at-rest modality next to PQ/sign-LSH).
    "dedup_bigram_cosine",
    "frequent_segment_filter",
    "ann_sq8_topk",
    "ann_ivf_sq8_topk",
    "frequent_segment_removal",
    "dedup_cosine_incremental",
    "cluster_balanced_sample",
    # amortized IVF+SQ8 search twin (index built OUTSIDE the timer).
    "ann_ivf_sq8_search",
    # round 9: retrieval-stack completions — RRF hybrid fusion,
    # hard-negative mining, Matryoshka-style truncated rerank, and the
    # ranking-metrics evaluation harness.
    "hybrid_rrf_search",
    "hybrid_rrf_search_ivf",
    "hard_negative_mining",
    "ann_truncated_rerank",
    "retrieval_quality_metrics",
    "contrastive_triplets",
    # round 10: the production hybrid shape — fused search over the two
    # PERSISTED streaming stores (BM25 inverted index + IVF vector
    # index), both built OUTSIDE the timer; the timed body is the
    # bucket-pruned lexical search, the cell-probed vector search, and
    # the |Q| x (k_a+k_b) fusion join.
    "hybrid_search_stores",
    # round 11: the sixth streaming net's batch-vs-corpus semantic gate
    # rule (sqrt-n-cells dial, corpus-frozen centroids).
    "embedding_gate_incremental",
]


def _profile_default_mode(spark, sf_dir):
    """Bench the operator's DEFAULT (HLL, Expand-free) profile — the mode
    a 100 TB profile runs. The registered `profile_table` QUERY opts into
    exact distincts only because a cross-engine oracle needs exact
    values; timing that validation form would misreport the operator."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.profile import profile_columns
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.core import _PROFILE_COLS

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(li, _PROFILE_COLS).orderBy("col_name")


def _corpus_shards_write_bench(spark, sf_dir):
    """The composed terminal pipeline, timed END-TO-END including the
    actual sharded parquet publish (the only bench entry that writes —
    a training-data pipeline's deliverable IS the written shards):
    prepare_corpus (exact+near dedup, quality floor, chunking) → shard
    + pack-bin assignment → wave-committed manifest publish + verify.
    Fresh table path per run: the writer's resume protocol would turn
    repeat runs into no-ops against a reused table."""
    import shutil
    import tempfile

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import unpersist_all
    from cig_etl_s3_to_sql_data_ingestor_spark.plans.corpus_pipeline import (
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="bench-shards-")
    try:
        out = write_training_shards(
            docs, f"{tmp}/table", n_shards=16, shards_per_commit=8
        )
    finally:
        unpersist_all()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(out["written_shards"], out["rows"])],
        "written_shards int, rows long",
    )


# name -> callable overriding (or, for bench-only entries like
# embedding_neardup_cells, supplying) the timed body.
BENCH_OVERRIDES = {
    "profile_table": _profile_default_mode,
    "corpus_shards_write": _corpus_shards_write_bench,
}


def _pq_search_prepare(spark, sf_dir):
    """Build + materialize the PQ index OUTSIDE the timer in its
    deployed at-rest shape — packed dense codes (FAISS-style contiguous
    code arrays), cached corpus vectors for the exact re-rank, and
    CLIENT-RESIDENT codebooks (collected rows, exactly how FAISS holds
    them in RAM). The thunk is pure search: per-query distance tables,
    in-row ADC over the packed scan, shortlist, exact re-rank — pinned
    bit-identical to the pq_topk join path by
    tests/test_ann_recall.py::test_packed_search_identical_to_join_path.
    ann_pq_topk still times the full build+search path."""
    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist

    e = load_table(spark, sf_dir, "embeddings")
    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = _persist(S.pq_encode(e, cb, subs=subs))
    cb_rows = [tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()]
    packed = _persist(S.pq_pack_codes(codes, cb_rows).coalesce(4))
    packed.count()
    rerank = _persist(e.coalesce(4))
    rerank.count()
    # Query vectors arrive IN a search request in deployment; the
    # per-query distance-table math stays inside the timer.
    q_rows = [
        tuple(r)
        for r in e.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    return lambda: S.pq_search_packed(
        rerank, q_rows, cb_rows, packed, k=5
    ).orderBy("query_id", "rank")


def _ivf_pq_search_prepare(spark, sf_dir):
    """IVF+PQ with every index part prebuilt — packed dense codes
    carrying their cell assignment, client-resident codebooks AND coarse
    centroids; the thunk probes cells driver-side and searches (pinned
    bit-identical to the ivf_pq_topk join path by the same test)."""
    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist

    e = load_table(spark, sf_dir, "embeddings")
    centroids = _persist(
        S.kmeans_centroids(e, n_cells=16, n_iters=2, sample_mod=4).select(
            F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
        )
    )
    assigned = S.ivf_assign(e, centroids, "vec_id", "embedding", n_probe=1).select(
        "cand_id", "cell_id"
    )
    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = _persist(S.pq_encode(e, cb, subs=subs))
    cb_rows = [tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()]
    packed_cells = _persist(
        S.pq_pack_codes(codes, cb_rows).join(assigned, "cand_id").coalesce(4)
    )
    packed_cells.count()
    cent_rows = [
        tuple(r) for r in centroids.select("vec_id", "embedding").collect()
    ]
    rerank = _persist(e.coalesce(4))
    rerank.count()
    q_rows = [
        tuple(r)
        for r in e.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    return lambda: S.pq_search_packed(
        rerank, q_rows, cb_rows, packed_cells, k=5,
        centroids=cent_rows, n_probe=12,
    ).orderBy("query_id", "rank")


def _bm25_search_indexed_prepare(spark, sf_dir):
    """BM25 with the inverted index prebuilt OUTSIDE the timer — the
    build-once/search-many retrieval deployment shape. The thunk is
    pure search: broadcast query-vocabulary semi-joins against the
    persisted postings/df plus the shared scoring tail, pinned
    row-identical to the direct bm25_search path by
    tests/test_retrieval_semdedup.py."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_build_index,
        bm25_search_indexed,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )

    docs = load_table(spark, sf_dir, "documents")
    postings, dfreq, stats = bm25_build_index(docs)
    postings = _persist(postings)
    postings.count()
    dfreq = _persist(dfreq)
    dfreq.count()
    stats = _persist(stats)
    stats.count()
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    return lambda: bm25_search_indexed(postings, dfreq, stats, terms, k=10).orderBy(
        "query_id", "rank"
    )


def _mmr_pq_search_prepare(spark, sf_dir):
    """MMR diversification with the ENTIRE index side prebuilt outside
    the timer (r6 verdict #4's deployment shape): the thunk's shortlist
    is pq_search_packed over persisted packed codes — driver-side ADC
    tables, zero joins before the shortlist, the corpus's raw vectors
    touched only by the shortlist's exact re-rank and MMR's vector
    fetch (both broadcast equi-joins, never a full relevance scan)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.vectors import MMR_LAM

    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = _persist(S.pq_encode(e, cb, subs=subs))
    cb_rows = [tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()]
    packed = _persist(S.pq_pack_codes(codes, cb_rows).coalesce(4))
    packed.count()
    rerank = _persist(e.coalesce(4))
    rerank.count()
    queries = rerank.filter(F.col("vec_id") < 8)
    q_rows = [
        tuple(r) for r in queries.select("vec_id", "embedding").collect()
    ]

    def thunk():
        short = S.pq_search_packed(
            rerank, q_rows, cb_rows, packed, k=20
        ).select("query_id", "cand_id", "cosine_sim")
        # Driver-side MMR: bit-identical to the distributed rounds on
        # the same shortlist (pinned), one job instead of k-1
        # checkpointed rounds — the interactive deployment shape this
        # prepared entry exists to measure.
        return S.mmr_rerank_local(
            rerank, short, k=5, lam=MMR_LAM
        ).orderBy("query_id", "rank")

    return thunk


def _phrase_from_index_prepare(spark, sf_dir):
    """Phrase search with the k-gram posting store prebuilt OUTSIDE the
    timer — the search-many shape the r6 verdict asked for (direct
    phrase_search re-tokenizes the corpus per call). The thunk is a
    broadcast semi-join against persisted postings + the shared top-k
    tail; corpus text is never touched."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        phrase_build_index,
        phrase_search_indexed,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        PHRASE_QUERIES,
    )

    docs = load_table(spark, sf_dir, "documents")
    postings = _persist(phrase_build_index(docs, lengths=(2, 3)))
    postings.count()
    pq = spark.createDataFrame(
        list(PHRASE_QUERIES), "query_id long, phrase string"
    )
    # stored_lengths as build-recorded metadata: the amortized path must
    # not pay a store-sized distinct per search (that is the point).
    return lambda: phrase_search_indexed(
        postings, pq, k=10, stored_lengths=(2, 3)
    )


def _ivf_sq8_search_prepare(spark, sf_dir):
    """Build + materialize the IVF+SQ8 index OUTSIDE the timer in its
    at-rest shape — frozen centroids, reconstructed member vectors with
    precomputed norms (what a deployment derives from the stored int8
    codes + the 2x64-double stats row). The thunk is pure search: probe
    ranking against the broadcast centroids, probed-cell equi-join,
    asymmetric reconstructed-cosine rank — exactly ann_ivf_sq8_topk's
    tail, which still times the full build+search path."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.functions.vectors import dot, norm
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist

    e = load_table(spark, sf_dir, "embeddings")
    cents = _persist(
        S.kmeans_centroids(e, n_cells=16, n_iters=2, sample_mod=4).select(
            F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
        )
    )
    cents.count()
    stats = S.sq8_stats(e)
    coded = _persist(
        S.ivf_assign(e, cents, n_probe=1)
        .crossJoin(F.broadcast(stats))
        .select(
            "cand_id",
            "cell_id",
            S._sq8_recon_col(
                F.col("cand_vec"), F.col("mins"), F.col("scales")
            ).alias("recon_vec"),
        )
        .withColumn("recon_norm", norm(F.col("recon_vec")))
        .coalesce(4)
    )
    coded.count()
    qdf = _persist(e.filter(F.col("vec_id") < 8).coalesce(1))
    qdf.count()

    def run():
        probes = S.ivf_assign(qdf, cents, n_probe=12).select(
            F.col("cand_id").alias("query_id"),
            F.col("cand_vec").alias("query_vec"),
            F.col("cand_norm").alias("query_norm"),
            "cell_id",
        )
        scored = (
            coded.join(F.broadcast(probes), "cell_id")
            .filter(F.col("cand_id") != F.col("query_id"))
            .withColumn(
                "sq8_sim",
                dot(F.col("query_vec"), F.col("recon_vec"))
                / (F.col("query_norm") * F.col("recon_norm")),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("sq8_sim").desc(), F.col("cand_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "cand_id", "sq8_sim", "rank")
        )

    return run



def _hybrid_search_stores_prepare(spark, sf_dir):
    """Build BOTH persisted retrieval stores outside the timer — the
    term-bucketed BM25 inverted index and the IVF vector index, each
    via its streaming ingest's batch body — then time the deployed
    search shape: bucket-pruned BM25 top-10 + cell-probed IVF top-20 +
    RRF fusion (streaming.hybrid_search.hybrid_search_from_stores; the
    fusion rule is oracle-backed via hybrid_rrf_search, both provider
    parities pinned in tests/test_streaming.py)."""
    import tempfile

    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.bm25_ingest import (
        Bm25IndexIngest,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.hybrid_search import (
        hybrid_search_from_stores,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.streaming.vector_ingest import (
        VectorIngest,
    )

    # The stores must outlive this prepare call (the timed runs read
    # them cold), so cleanup is deferred to interpreter exit instead of
    # a try/finally — without it every bench run leaks a full BM25 +
    # vector index copy into /tmp.
    import atexit
    import shutil

    tmp = tempfile.mkdtemp(prefix="hybrid_stores_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents_path = f"{tmp}/centroids"
    S.kmeans_centroids(e, n_cells=16).write.parquet(cents_path)
    bm25 = Bm25IndexIngest(
        spark,
        store_path=f"{tmp}/bm25_index",
        checkpoint_path=f"{tmp}/bm25_ckpt",
    )
    vec = VectorIngest(
        spark,
        centroids_path=cents_path,
        store_path=f"{tmp}/vec_index",
        checkpoint_path=f"{tmp}/vec_ckpt",
    )
    bm25._process_batch(docs, 0)
    vec._process_batch(e, 0)
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))
    return lambda: hybrid_search_from_stores(
        bm25, vec, terms, queries, k=10, bm25_k=10, ann_k=20, n_probe=4
    ).orderBy("query_id", "rank")


# name -> prepare(spark, sf_dir) -> thunk. The prepare step runs ONCE
# per query, outside the timer; cache-clearing is skipped for these
# (the persisted index is the point), and the run body creates no
# caches of its own, so repeat runs stay honest.
BENCH_PREPARE = {
    "ann_pq_search": _pq_search_prepare,
    "ann_ivf_pq_search": _ivf_pq_search_prepare,
    "bm25_search_indexed": _bm25_search_indexed_prepare,
    "ann_mmr_pq_search": _mmr_pq_search_prepare,
    "phrase_search_from_index": _phrase_from_index_prepare,
    "ann_ivf_sq8_search": _ivf_sq8_search_prepare,
    "hybrid_search_stores": _hybrid_search_stores_prepare,
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="cig-etl-bench")
    # Warmup: boot executors + codegen on a trivial plan, and boot the
    # Python (Arrow) workers so pandas-UDF queries measure throughput,
    # not interpreter fork time.
    materialize(QUERIES["distinct_keys"](spark, SF_DIR))
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # min-of-3 by default: the harness machine has bursty co-tenant load
    # (observed 5-25x inflation for seconds at a time); three runs give
    # each query a fair chance of one quiet measurement.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        prep = BENCH_PREPARE.get(name)
        if prep is not None:
            spark.catalog.clearCache()
            thunk = prep(spark, SF_DIR)  # index build — NOT timed
        best = float("inf")
        for _ in range(runs):
            if prep is None:
                # Drop caches persisted by a previous run of the same
                # query — Spark's CacheManager matches by canonical
                # plan, so without this a re-run would silently reuse
                # the LSH signature caches and report a flattered time.
                # (Prepared entries SKIP this: their persisted index is
                # the point, and their run body persists nothing.)
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            if prep is not None:
                materialize(thunk())
            else:
                # Explicit lookup (not dict.get(name, QUERIES[name]) —
                # the default arg evaluates eagerly, so a bench-only
                # override name would KeyError); a typo'd HEADLINE entry
                # still fails loudly with the name.
                fn = (
                    BENCH_OVERRIDES[name]
                    if name in BENCH_OVERRIDES
                    else QUERIES[name]
                )
                materialize(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        if prep is not None:
            spark.catalog.clearCache()  # don't leak the index downstream

    total = round(sum(timings.values()), 3)
    try:  # contention transparency: loadavg BEFORE this bench's own load decays
        load1 = round(os.getloadavg()[1], 2)
    except OSError:  # pragma: no cover
        load1 = None
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(HEADLINE),
        "loadavg5": load1,
    }
    # The driver captures only a truncated stdout tail (~4KB; r4 lost 34
    # of 100 per-query times that way) — persist the full record so
    # every round's numbers survive for cross-round comparison.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json"),
        "w",
    ) as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

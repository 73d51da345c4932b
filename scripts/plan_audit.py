"""Mechanical scale audit: explain EVERY registered query and flag plan
shapes that break at 100 TB — cartesian products, broadcast nested-loop
joins outside the known broadcast-singleton allowlist, and unpartitioned
windows that are not running over a bounded (post-aggregate) frame.

This is the full-surface sweep behind tests/test_plans.py's targeted
pins: the pins assert specific properties deeply; this audit guarantees
no query ANYWHERE regresses into the two unambiguous scale-killers.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# every one is a broadcast of a SINGLE-ROW (or provably tiny, bounded)
# aggregate/literal frame — the documented crossJoin(broadcast(...))
# pattern (scalar totals, 1-row models, quantile-level literals).
BNLJ_ALLOWED = {
    "ann_cosine_topk",        # broadcast query set (bounded by caller)
    "ann_lsh_bucketed",
    "knn_label_eval",
    "embedding_norms",
    "char_lm_surprisal",      # 1-row OOV floor + scalar total
    "char_entropy",
    "tfidf_top_terms",        # 1-row n_sources
    "source_token_divergence",  # 1-row corpus total
    "vocab_stats",            # 1-row total
    "approx_distinct_stats",
    "conversion_funnel",      # three 1-row stage counts
    "source_mixture_plan",
    "budget_select",
    "interleave_sources",
    "contamination_check",
    "profile_table",
    "length_histogram",
    "repetition_stats",
    "deterministic_split",
    "approx_quantile_envelope",
    "incremental_agg_merge",
    "weekday_event_chi2",     # 1-row grand total
    "cms_word_frequency",     # bounded sketch frame
    "bloom_decontamination",  # bounded bit frame
    "bpe_merge_steps",        # 1-row argmax per unrolled step
    "bpe_corpus_compression",
    "dsir_importance_weights",  # 1-row corpus token totals (N_T, N_S)
    "dsir_domain_select",       # same 1-row DSIR totals frame
    "ann_sq8_topk",             # 1-row SQ8 stats frame + broadcast query set
    "ann_ivf_sq8_topk",         # same 1-row stats + broadcast centroid frame
    "cluster_balanced_sample",  # broadcast trained-centroid frame (bounded cells)
    "nb_quality_classifier",  # 1-row train-doc total for the priors
    "curation_pipeline_learned",  # same NB 1-row priors total
    "nb_score_calibration",       # same NB 1-row priors total
    "nb_budget_select",           # same NB priors + budget_select's 1-row-per-partition totals
    "ann_incremental",
    "ann_incremental_cells",    # same broadcast centroid frame, sqrt-cells dial
    "knn_label_eval_ann",       # broadcast capped query sample + centroid frame
    "embedding_neardup_cells",  # broadcast trained-centroid frame (bounded cells)
    "embedding_gate_incremental",  # same broadcast centroid frame, sqrt-cells dial
    "embedding_clusters",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "exact_substring_overlap",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_incremental",
    "dedup_canonical",
    "dedup_clusters",
    "embedding_neardup",
    "multimodal_frame_sample",
    "stratified_sample",
    "json_props_stats",
    "market_share_by_year",
    "quarterly_top_supplier",
    "cross_source_overlap",
    "boilerplate_prefix_groups",
    "curation_decisions",
    "idle_customers",         # 1-row average-balance cutoff
    "heavy_hitter_keys",      # 1-row corpus-context stats
    "bm25_search",            # 1-row corpus stats (N, total_len)
    "bm25_incremental",       # same 1-row merged stats frame
    "ann_mmr_topk",           # broadcast query set (bounded by caller)
    "hybrid_rrf_search",      # broadcast 4-query set (ANN side) + 1-row BM25 stats
    "hybrid_rrf_search_ivf",  # same broadcast query set + 1-row BM25 stats (IVF provider)
    "hard_negative_mining",   # broadcast query set (bounded by caller)
    "ann_truncated_rerank",   # broadcast query set (bounded by caller)
    "retrieval_quality_metrics",  # broadcast 8-query set (ranked + pool sides)
    "contrastive_triplets",   # broadcast 32-anchor set (both mining sides)
    "collocation_pmi",        # two 1-row corpus totals (T, B)
    "semdedup_keep",          # 16-row broadcast centroid frame
    "semdedup_keep_cells",    # isqrt(n)-row broadcast centroid frame
}

# Queries whose single unpartitioned window runs over a BOUNDED frame
# (per-day / per-quarter / per-node / top-k aggregates — cardinality is
# calendar- or vocabulary-sized, never corpus-sized); each carries the
# justification in its docstring and most are plan-pinned individually.
GLOBAL_WINDOW_ALLOWED = {
    "rolling_daily_revenue",
    "weekly_range_revenue",
    "vocab_stats",
    "price_deciles",
    "order_cube",
    "nation_trade_volume",
    "market_share_by_year",
    "source_mixture_plan",
    "length_histogram",
    "daily_event_pivot",
    "part_copurchase_pagerank",
    "bpe_merge_steps",
    "bpe_corpus_compression",
    "cms_word_frequency",
    "interleave_sources",
    "json_props_stats",
    "heavy_hitter_keys",      # rank/cum-share window over the LIMIT-k frame
}


def audit(spark, sf_dir: str) -> list[tuple[str, str]]:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    problems: list[tuple[str, str]] = []
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in plan:
            problems.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            problems.append((name, "BroadcastNestedLoopJoin (unallowlisted)"))
        # Formatted plans render each Window's spec inline; an
        # unpartitioned spec starts directly with a sort item or the
        # frame spec instead of partition expressions. Split the
        # argument list at TOP-LEVEL commas (a naive first-comma split
        # would mis-parse sort expressions containing commas, e.g.
        # coalesce(a, b) ASC, and let a global window sail through).
        for ln in plan.splitlines():
            low = ln.lower()
            if "windowspecdefinition(" not in low:
                continue
            head = low.split("windowspecdefinition(", 1)[1]
            args, depth, cur = [], 0, []
            for ch in head:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif ch == "," and depth == 0:
                    args.append("".join(cur).strip())
                    cur = []
                    continue
                cur.append(ch)
            if cur:
                args.append("".join(cur).strip())
            first = args[0] if args else ""
            if (
                first.endswith(" asc nulls first")
                or first.endswith(" asc nulls last")
                or first.endswith(" desc nulls first")
                or first.endswith(" desc nulls last")
                or first.startswith("specifiedwindowframe")
            ) and name not in GLOBAL_WINDOW_ALLOWED:
                problems.append((name, f"unpartitioned window: {ln.strip()[:90]}"))
                break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from cig_etl_s3_to_sql_data_ingestor_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    problems = audit(spark, sf_dir)
    for name, what in problems:
        print(f"PROBLEM {name}: {what}")
    print(f"{len(QUERIES)} queries audited, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

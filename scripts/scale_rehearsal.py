#!/usr/bin/env python
"""sf0.1 -> sf1 scaling rehearsal for the most expensive bench queries
(round-5 verdict #7).

local[32] at sf0.1 cannot see super-linear blowups (quadratic shingle
joins, KMeans paths that degrade with corpus size); one 10x run can.
For each query this times min-of-N runs at sf0.1 and at the replicated
.benchdata/sf1 (scripts/make_sf1.py), prints the wall-time ratio, and
flags anything scaling worse than ~12x (10x rows + scheduling slack) as
super-linear. Results are recorded in NOTES.md.

Usage: python scripts/scale_rehearsal.py [runs=2] [--all]
  --all sweeps the ENTIRE registry (120 queries) instead of the
  expensive-tail TOP list, and writes scaling_sweep.json next to the
  repo's bench_full.json with per-query (sf0.1, sf1, ratio) rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES  # noqa: E402
from cig_etl_s3_to_sql_data_ingestor_spark.session import get_spark  # noqa: E402

# 12 entries: the most expensive r5 bench queries + the shingle-join
# family the verdict specifically called out as invisible-at-sf0.1 risks.
TOP = [
    "ann_ivf_pq_topk",
    "part_copurchase_pagerank",
    "ann_pq_topk",
    "ann_incremental",
    "cross_source_overlap",
    "bpe_merge_steps",
    "bpe_corpus_compression",
    "embedding_clusters",
    "image_ahash_groups",
    "multimodal_features",
    "exact_substring_overlap",
    "dedup_ngram_jaccard",
    # r6 additions: BM25 retrieval + SemDeDup decisions
    "bm25_search",
    "semdedup_keep",
    # r7 additions: winnowing (per-row HOF fold — the shape whose
    # regressions hide at small L), DSIR (two corpus token scans),
    # Gopher rules (map-only), E-S sample (TakeOrdered).
    "winnowing_groups",
    "winnowing_matches",
    "winnowing_sites",
    "cdc_chunk_dedup",
    "dsir_importance_weights",
    "gopher_quality_rules",
    "weighted_sample",
    # r8 additions: the learned curation pipeline (NB train/predict +
    # winnowing eviction composed), the CDC reuse gate (store-sized
    # chunk-hash join), NB margin calibration, and the shard/pack plan
    # (the one window-partitioned-by-shard query).
    "curation_pipeline_learned",
    "cdc_reuse_gate",
    "nb_score_calibration",
    "training_shard_plan",
    "nb_budget_select",
    # r8 session-2 additions: prefix-blocked lexical cosine (inverted
    # index + pair-agg — the shape whose fan-out blows up first), the
    # tile-frequency filter, and SQ8 brute scan.
    "dedup_bigram_cosine",
    "frequent_segment_filter",
    "ann_sq8_topk",
    "ann_ivf_sq8_topk",
    "frequent_segment_removal",
    "dedup_cosine_incremental",
    "cluster_balanced_sample",
    # r9 additions: the registered scale twins (previously bench-only)
    # and the retrieval-stack completions — the RRF fusion join, the
    # label-filtered brute kernel, the prefix-shortlist rerank, and
    # the metrics harness's pool join.
    "knn_label_eval_ann",
    "embedding_neardup_cells",
    "ann_incremental_cells",
    "hybrid_rrf_search",
    "hard_negative_mining",
    "ann_truncated_rerank",
    "retrieval_quality_metrics",
    # r10 additions: the SemDeDup sqrt-cells scale twin and the
    # contrastive-triplets miner (landed in the r9 snapshot commit
    # after the sweep ran — first measured r10).
    "semdedup_keep_cells",
    "contrastive_triplets",
]

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata",
    "sf1",
)
SUPERLINEAR = 12.0


def time_query(spark, name: str, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    sweep_all = "--all" in sys.argv[1:]
    runs = int(args[0]) if args else 2
    if not os.path.isdir(SF1):
        print("run scripts/make_sf1.py first", file=sys.stderr)
        return 1
    spark = get_spark(app_name="scale-rehearsal")
    # warmup
    QUERIES["distinct_keys"](spark, SF01).write.format("noop").mode(
        "overwrite"
    ).save()
    names = list(QUERIES) if sweep_all else TOP
    print(f"{'query':28} {'sf0.1':>8} {'sf1':>8} {'ratio':>7}")
    flagged, rows = [], {}
    for name in names:
        a = time_query(spark, name, SF01, runs)
        b = time_query(spark, name, SF1, runs)
        r = b / max(a, 1e-9)
        rows[name] = {"sf0_1": round(a, 3), "sf1": round(b, 3), "ratio": round(r, 2)}
        flag = "  <-- SUPER-LINEAR" if r > SUPERLINEAR else ""
        if r > SUPERLINEAR:
            flagged.append(name)
        print(f"{name:28} {a:8.2f} {b:8.2f} {r:7.2f}{flag}", flush=True)
    try:
        print("loadavg:", os.getloadavg())
    except OSError:
        pass
    if True:  # merge measured rows in BOTH modes (TOP runs update
        # their queries' rows in place; --all refreshes the registry)
        import json

        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scaling_sweep.json",
        )
        # Merge over the existing artifact: the `scale_paths` section
        # (bench-only counterparts like embedding_neardup_cells /
        # knn_label_eval_ann, measured out-of-band) and any notes are
        # NOT produced by this sweep and must survive a re-run.
        payload = {}
        if os.path.exists(out):
            try:
                payload = json.load(open(out))
            except json.JSONDecodeError:
                pass
        if sweep_all:
            # Full refresh: the sweep just measured the whole registry.
            payload.update(
                {"runs": runs, "superlinear_threshold": SUPERLINEAR,
                 "flagged": flagged, "queries": rows}
            )
        else:
            # TOP run: update only the measured queries' rows in place
            # and reconcile their flags; everything else keeps its last
            # full-sweep value.
            merged = dict(payload.get("queries", {}))
            merged.update(rows)
            keep_flags = [
                n for n in payload.get("flagged", []) if n not in rows
            ]
            payload.update(
                {"superlinear_threshold": SUPERLINEAR,
                 "flagged": sorted(set(keep_flags) | set(flagged)),
                 "queries": merged}
            )
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print("wrote", out)
    if flagged:
        print("super-linear outliers to diagnose:", ", ".join(flagged))
    return 0


if __name__ == "__main__":
    sys.exit(main())

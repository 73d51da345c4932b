#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization,
no write cost). One warmup query amortizes JVM/codegen startup so the
numbers reflect engine throughput, not session boot.
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
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "embedding_neardup",
    "multimodal_meta",
]


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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

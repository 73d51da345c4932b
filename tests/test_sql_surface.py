"""SQL front end: the ANSI oracle queries run through spark.sql against
registered views and produce the same rows as the DataFrame queries —
one engine, two query surfaces.
"""

from __future__ import annotations

import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.queries import ORACLES, QUERIES
from cig_etl_s3_to_sql_data_ingestor_spark.sql import register_views, sql

# Oracles written in portable ANSI SQL (no DuckDB-only list/lambda
# functions) — these must run verbatim on Spark SQL too.
PORTABLE = [
    "pricing_summary",
    "verification_query",
    "distinct_keys",
    "ordered_projection",
    "worklist_semi_join",
    "marker_antijoin",
    "latest_per_group",
    "topk_per_group",
    "shipping_priority",
    "region_nation_revenue",
    "order_priority_count",
    "top_returned_customers",
    "customer_activity_setops",
    "order_rollup",
    "dedup_exact",
    "customer_order_distribution",
    "quarterly_top_supplier",
    "nation_quarterly_growth",
    "cheapest_supplier_per_part",
    "market_share_by_year",
    "discount_band_revenue",
    "small_quantity_revenue",
    "heavy_hitter_keys",
    "conversion_funnel",
    "cohort_retention",
    "event_transition_matrix",
    "incremental_agg_merge",
    "cdc_snapshot",
    "priority_sample",
    "price_quantity_stats",
]


def test_registry_rotation_invariants():
    """The external driver scores only the first 50 registry entries, so
    the rotation contract must hold: every query registered exactly once,
    oracles keyed identically, the scored window EXACTLY the declared
    head, and the unscored set EXACTLY the declared tail — any edit that
    silently moves a query out of scoring fails here by name."""
    names = list(QUERIES)
    assert len(names) == len(set(names)) == 163
    # Round 4: every query carries a DuckDB oracle (the HLL sketch query
    # now emits an exact anchor + deterministic envelope boolean).
    assert set(ORACLES) == set(QUERIES)
    from cig_etl_s3_to_sql_data_ingestor_spark.queries import _HEAD, _TAIL

    assert len(_HEAD) == 50, "scored window must be exactly the declared head"
    assert set(names[:50]) == set(_HEAD), "a head query fell out of scoring"
    assert set(names[50:]) == set(_TAIL), (
        "unscored set diverged from the declared tail: "
        f"{set(names[50:]) ^ set(_TAIL)}"
    )
    assert not set(_HEAD) & set(_TAIL)


def test_doc_counts_match_registry():
    """README.md and COVERAGE.md state the registry size in prose; both
    counts drifted once each in rounds 9-10 (manual edits). Tie them to
    ``len(QUERIES)`` mechanically so a registration without the doc sync
    fails here by file name — no manual count edits ever again."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(__file__))
    checks = [
        ("README.md", r"(\d+) named queries"),
        ("COVERAGE.md", r"\((\d+) entries, every one oracle-backed\)"),
    ]
    for fname, pat in checks:
        with open(os.path.join(root, fname)) as f:
            text = f.read()
        counts = re.findall(pat, text)
        assert counts, f"{fname}: registry-count sentence missing ({pat})"
        for c in counts:
            assert int(c) == len(QUERIES), (
                f"{fname} says {c} queries, registry has {len(QUERIES)} — "
                "sync the doc with the registration"
            )


def test_every_registered_query_is_benched():
    """bench.py's HEADLINE must cover the ENTIRE registry (plus the two
    amortized-search variants) — an unbenched query is one whose perf
    regressions are invisible (round-5 verdict #5)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = set(QUERIES) - set(bench.HEADLINE)
    assert not missing, f"queries with no bench row: {sorted(missing)}"
    extras = set(bench.HEADLINE) - set(QUERIES)
    assert extras == {
        "ann_pq_search",
        "ann_ivf_pq_search",
        "bm25_search_indexed",
        "ann_mmr_pq_search",
        "phrase_search_from_index",
        "corpus_shards_write",
        "ann_ivf_sq8_search",
        "hybrid_search_stores",
    }, extras
    # Bench-only entries must have a timed body (prepare or override).
    for name in extras:
        assert name in bench.BENCH_PREPARE or name in bench.BENCH_OVERRIDES, name
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate bench rows"


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark_sql(spark, sf_dir, name):
    register_views(spark, sf_dir)
    via_sql = spark.sql(ORACLES[name])
    via_df = QUERIES[name](spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    sql_rows = sorted(map(repr, (tuple(r) for r in via_sql.collect())))
    df_rows = sorted(map(repr, (tuple(r) for r in via_df.collect())))
    assert sql_rows == df_rows, name


def test_sql_helper(spark, sf_dir):
    n = sql(spark, sf_dir, "SELECT COUNT(*) AS n FROM lineitem").first()["n"]
    assert n > 0

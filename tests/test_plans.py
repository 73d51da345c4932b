"""Physical-plan regression tests — the scale contract, not just results.

Each assertion pins a plan property that matters at 100 TB: filters
reaching the parquet scan, column-pruned ReadSchema, broadcast joins for
dimension sides, partial (map-side) aggregation, and the absence of
cartesian products in the LSH candidate generation. A refactor that
keeps results but breaks one of these would regress 100x at scale while
staying green on row-level tests — these catch that.
"""

from __future__ import annotations

import re

import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES


def explain(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = explain(spark, sf_dir, "verification_query")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters line in scan"
    # The to-date cast predicate must still convert to a pushable
    # timestamp range — not collapse to a post-scan filter.
    assert any("o_orderdate" in ln for ln in pushed), pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = explain(spark, sf_dir, "ordered_projection")
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, "no ReadSchema in plan"
    read = schema_lines[0]
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"):
        assert col in read
    # lineitem has 11 columns; the scan must not read the unused ones.
    for col in ("l_shipdate", "l_discount", "l_tax", "l_partkey", "l_suppkey"):
        assert col not in read, f"unpruned column {col} in {read}"


def test_dimension_joins_are_broadcast(spark, sf_dir):
    for name in ("config_enrich_join", "worklist_semi_join", "region_nation_revenue"):
        plan = explain(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan}"
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "shipping_priority",
        "worklist_semi_join",
        "large_volume_orders",
        "promo_revenue_share",
    ],
)
def test_scaling_tables_carry_no_broadcast_hint(spark, sf_dir, name):
    """customer/supplier/part scale with the data: a *forced* broadcast on
    them is a 100x scale cliff (OOM once the 'dimension' is GBs). These
    queries must carry NO broadcast hint at all — small-scale broadcast is
    AQE's runtime decision, verified separately below."""
    df = QUERIES[name](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, f"{name} still hints a join:\n{analyzed}"


@pytest.mark.parametrize("name", ["shipping_priority", "worklist_semi_join"])
def test_unhinted_joins_still_broadcast_at_small_scale(spark, sf_dir, name):
    """Without hints, the small-sf broadcast must still happen — statically
    from parquet size estimates or at runtime via AQE — so dropping the
    hints costs nothing at test scale."""
    df = QUERIES[name](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, f"{name} final plan:\n{final}"


def test_marker_antijoin_is_anti(spark, sf_dir):
    plan = explain(spark, sf_dir, "marker_antijoin")
    assert "LeftAnti" in plan


def test_aggregation_is_partial_then_final(spark, sf_dir):
    plan = explain(spark, sf_dir, "pricing_summary")
    # Two HashAggregate nodes around one exchange = map-side combine.
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, f"pricing_summary has {n_exchanges} exchanges"


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_incremental",
        "dedup_canonical",
        "exact_substring_overlap",
    ],
)
def test_lsh_candidate_join_never_cartesian(spark, sf_dir, name):
    plan = explain(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name} degenerated to a cross join"


def test_asof_join_is_single_window_no_join(spark, sf_dir):
    plan = explain(spark, sf_dir, "asof_last_click")
    # The union+window formulation must not contain any join node.
    assert not re.search(r"\(\d+\) \w*Join", plan), plan
    assert "Window" in plan


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned sink output must be read with partition pruning:
    a filter on the partition column appears as PartitionFilters in the
    scan and prunes directories before any data I/O."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_events
    from pyspark.sql import functions as F

    out = str(tmp_path / "by_date")
    ev = load_events(spark, sf_dir).withColumn(
        "event_date", F.col("ts").cast("date")
    )
    ev.write.partitionBy("event_date").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("event_date") == "2024-01-04")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = rd._jdf.queryExecution().explainString(mode)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0], plan
    # And the pruned read returns exactly that day's rows.
    expected = ev.filter(F.col("event_date") == "2024-01-04").count()
    assert rd.count() == expected > 0


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    plan = explain(spark, sf_dir, "events_in_windows")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q16_exclusion_is_broadcast_anti(spark, sf_dir):
    plan = explain(spark, sf_dir, "brand_supplier_counts")
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan
    # COUNT(DISTINCT) must still partial-aggregate before the shuffle.
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan


def test_q19_brand_filter_pushed_to_part_scan(spark, sf_dir):
    plan = explain(spark, sf_dir, "disjunctive_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln and "In(" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_q22_anti_join_side_is_key_only(spark, sf_dir):
    plan = explain(spark, sf_dir, "idle_customers")
    # The orders side of the anti-join must scan only the key + the
    # pushable date predicate — no other columns.
    order_reads = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "o_custkey" in ln
    ]
    assert order_reads and all("o_totalprice" not in ln for ln in order_reads), order_reads
    assert re.search(r"Join .*LeftAnti|BroadcastHashJoin .*LeftAnti|SortMergeJoin .*LeftAnti", plan), plan


def test_rolling_window_input_is_preaggregated(spark, sf_dir):
    # The unpartitioned frame window is fed by the daily HashAggregate,
    # never the raw fact scan: Window must appear after (above) an
    # aggregate in the tree, and exactly one global-sort Exchange
    # (SinglePartition) is expected for it.
    plan = explain(spark, sf_dir, "rolling_daily_revenue")
    assert "Window" in plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan
    assert plan.count("SinglePartition") <= 2, plan


def test_fuzzy_pairs_block_join_never_cartesian(spark, sf_dir):
    plan = explain(spark, sf_dir, "fuzzy_name_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scd2_windows_share_one_shuffle(spark, sf_dir):
    # Lag (change detection) and lead (interval close) partition on the
    # same key: exactly one hashpartitioning Exchange; the only other
    # Exchange allowed is the presentation orderBy's rangepartitioning.
    plan = explain(spark, sf_dir, "scd2_user_state")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2, plan
    hash_ex = re.findall(r"Arguments: hashpartitioning", plan)
    assert len(hash_ex) == 1, plan


def test_runtime_bloom_filter_reaches_probe_scan(spark, sf_dir):
    """The 100 TB runtime-filter path: a selective dimension filter should
    inject a bloom filter that pre-prunes the fact-side scan before the
    shuffle join. Default thresholds only engage on >=10GB probe scans, so
    this pins that the plumbing works by lowering them — at real scale the
    defaults fire on their own."""
    from pyspark.sql import functions as F

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(mode)
        assert "bloom_filter_agg" in plan, "no bloom filter built from the dim side"
        assert "might_contain" in plan, "probe side does not apply the bloom filter"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_budget_select_has_no_unpartitioned_window(spark, sf_dir):
    """The running total must come from per-partition windows + offsets,
    never a global (unpartitioned) window that serializes the corpus."""
    plan = explain(spark, sf_dir, "budget_select")
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            assert "_pid" in line, f"global window in budget_select: {line.strip()}"


def test_profile_aggregate_is_partial_then_final(spark, sf_dir):
    """The exact (opt-in) multi-distinct profile must keep map-side
    partial aggregation (Expand feeds partial HashAggregates before the
    exchange)."""
    plan = explain(spark, sf_dir, "profile_table")
    assert "Expand" in plan  # exact multi-column distinct rewrites via Expand
    # Sort- or hash-based depending on the agg buffer types; both fine.
    assert plan.count("Aggregate (") >= 2


def test_profile_default_mode_is_expand_free(spark, sf_dir):
    """The DEFAULT profile mode uses HLL sketches: the plan must carry NO
    Expand (exact multi-distinct multiplies the scan once per counted
    column — the thing a naive 100 TB profile must not hit) and still
    aggregate partial-then-final."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.profile import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    df = profile_columns(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate"]
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Expand" not in plan, "default profile mode must not Expand the scan"
    # partial + final (Sort- not Hash-aggregate: HLL buffers are not
    # mutable-buffer types, so Spark picks SortAggregate — still
    # map-side-combined).
    assert plan.count("Aggregate (") >= 2 and "partial_approx_count_distinct" in plan


# ---- round-4 additions: corpus mining + analytic quantiles ----------------


def test_order_distribution_join_stays_outer(spark, sf_dir):
    """The ON-clause priority filter must not let the optimizer turn the
    outer join inner — zero-order customers are the point of Q13."""
    plan = explain(spark, sf_dir, "customer_order_distribution")
    assert "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan


def test_top_supplier_max_is_aggregate_not_window(spark, sf_dir):
    """The Q15 tie-preserving max must come from a 1-row aggregate joined
    back, never a global window over the (sf-scaling) supplier set."""
    plan = explain(spark, sf_dir, "quarterly_top_supplier")
    assert "Window" not in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "cross_source_overlap",
        "cheapest_supplier_per_part",
        "fulfillment_lag_quantiles",
        "boilerplate_prefix_groups",
    ],
)
def test_round4_queries_never_cartesian(spark, sf_dir, name):
    plan = explain(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name


def test_vocab_topk_is_distributed_take_ordered(spark, sf_dir):
    """The top-25 must be TakeOrdered (per-partition heads merged on the
    driver), and any window must run AFTER the limit — a global sort or
    pre-limit global window over the vocabulary would not scale."""
    plan = explain(spark, sf_dir, "vocab_stats")
    assert "TakeOrderedAndProject" in plan, plan


def test_quantile_windows_are_keyed(spark, sf_dir):
    """Both window passes partition by o_orderpriority — no 'No Partition
    Defined' global window in the quantile computation."""
    df = QUERIES["fulfillment_lag_quantiles"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().optimizedPlan().toString()
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", analyzed):
        assert "o_orderpriority" in m.group(1), analyzed


def test_discount_band_filters_push_to_scan(spark, sf_dir):
    """Q6-flavor: every predicate (shipdate range, discount band,
    quantity cap) must reach the lineitem scan as PushedFilters, and the
    3-group aggregate must be map-side partial."""
    plan = explain(spark, sf_dir, "discount_band_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in discount_band_revenue scan"
    joined = " ".join(pushed)
    for col in ("l_discount", "l_quantity", "l_shipdate"):
        assert col in joined, f"{col} not pushed: {joined}"
    assert plan.count("HashAggregate") >= 2, "aggregate not partial+final"


def test_small_quantity_part_dim_is_broadcast(spark, sf_dir):
    """Q17-flavor: the filtered part dimension must broadcast to BOTH
    lineitem passes — the fact table shuffles only on l_partkey for the
    decorrelated average, never for the dimension."""
    plan = explain(spark, sf_dir, "small_quantity_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan


def test_heavy_hitters_topk_is_take_ordered(spark, sf_dir):
    """Skew report: the top-k must be a distributed TakeOrdered, and the
    only unbounded window runs over the 10 post-limit rows."""
    plan = explain(spark, sf_dir, "heavy_hitter_keys")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan  # ctx broadcast is 1 row


def test_bpe_compression_vocab_join_is_broadcast(spark, sf_dir):
    """The corpus-scale path of bpe_corpus_compression is exploded
    tokens joined to the (bounded) encoded vocabulary — that join must
    broadcast the vocabulary side, and nothing may go cartesian (the
    per-step argmax joins are 1-row broadcasts)."""
    plan = explain(spark, sf_dir, "bpe_corpus_compression")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_bpe_merge_step_argmax_is_take_ordered(spark, sf_dir):
    """Each greedy step's argmax must be a distributed TakeOrdered over
    the pair counts, never a global sort or window."""
    plan = explain(spark, sf_dir, "bpe_merge_steps")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_no_registered_query_is_cartesian_or_row_python(spark, sf_dir):
    """Blanket sweep over EVERY registered query: the physical plan may
    not contain a CartesianProduct (broadcast-singleton cross joins plan
    as BroadcastNestedLoopJoin and are exempt by design) nor a
    row-at-a-time Python eval (BatchEvalPython) — Python is allowed only
    as Arrow-batched MapInPandas/FlatMapGroupsInPandas. Per-query pins
    above catch specifics; this catches the NEXT query someone adds
    without one."""
    offenders = []
    for name in QUERIES:
        plan = explain(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_transition_matrix_windows_are_keyed(spark, sf_dir):
    """Both windows must be partitioned: the LEAD on user_id (per-user
    state, corpus-scalable) and the normalizing row-sum on from_type
    (bounded aggregate). No global window anywhere."""
    plan = explain(spark, sf_dir, "event_transition_matrix")
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            assert "user_id" in line or "from_type" in line, line.strip()
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan


def test_pq_adc_join_is_broadcast_never_cartesian(spark, sf_dir):
    """The ADC scan must join corpus CODES against the broadcast distance
    table on (m, code_id) — an equi-join, never a cartesian — and the
    per-(query, cand) sum must partial-aggregate before its shuffle."""
    plan = explain(spark, sf_dir, "ann_pq_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 2, plan


def test_knn_eval_corpus_never_shuffles_for_scoring(spark, sf_dir):
    """Scoring is a broadcast of the query set over the corpus; the only
    hash exchanges allowed are on post-top-k (bounded) frames."""
    plan = explain(spark, sf_dir, "knn_label_eval")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_quantile_envelope_estimates_are_broadcast(spark, sf_dir):
    """The 12-row estimate frame joins back to lineitem broadcast (rank
    counting) — the fact table itself must never sit on a shuffled join
    side."""
    plan = explain(spark, sf_dir, "approx_quantile_envelope")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_token_divergence_partial_aggregates(spark, sf_dir):
    """The (source, term) count and the vocabulary marginal must both
    partial-aggregate map-side; the corpus-total scalar joins broadcast."""
    plan = explain(spark, sf_dir, "source_token_divergence")
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_ivf_pq_candidate_restriction_is_equi_join(spark, sf_dir):
    """The composed index must restrict ADC to probed-cell pairs via
    equi-joins (cell_id, then cand_id/(query,m,code)) — no cartesian,
    centroid/codebook/distance tables all broadcast."""
    plan = explain(spark, sf_dir, "ann_ivf_pq_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pagerank_windows_only_over_node_frame(spark, sf_dir):
    """The only global window allowed is the final top-30 over the
    node-sized rank frame. Since the per-iteration localCheckpoint
    (operators/graph.py) truncates lineage, the final plan is just
    Window→Filter over a checkpointed node-sized scan — the iteration
    internals (joins + partial aggs, no cartesian) are pinned by
    test_dedup_ops' bounded-plan-depth assertions."""
    plan = explain(spark, sf_dir, "part_copurchase_pagerank")
    assert "CartesianProduct" not in plan, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan
    # lineage was cut at the rank frame: the window's input is a
    # checkpoint scan, not a re-derivation of the iterations
    assert "Scan ExistingRDD" in plan, plan

"""Analytical query surface: multi-way joins, set operations, rollups,
and temporal (as-of) joins over the TPC-H-shaped synthetic tables.

The reference's own query surface stops at single-table verification
selects (`/root/reference/test_compare_sql_local_and_prod_data.py:32`);
these queries extend the engine to the analytics a warehouse consumer of
those ingested tables would run. Scale discipline per query:

- dimension sides (region/nation/supplier/customer-after-filter) are
  broadcast — the fact table (lineitem/orders/events) never shuffles for
  a dimension join;
- aggregates on doubles use decimal-exact accumulation (functions.exact)
  so results are order-independent at any parallelism;
- the as-of join is the union+window formulation (operators.temporal) —
  one shuffle, no range join blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum, sql_exact_avg, sql_exact_sum
from ..io import load_table
from ..operators.temporal import as_of_join, range_join_by_buckets

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


REV = "l_extendedprice * (1 - l_discount)"
_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev_dec():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


# ---------------------------------------------------------------------------
# Q3 shape: shipping priority — customer ⨝ orders ⨝ lineitem, top revenue.
# customer is filtered then broadcast; orders⨝lineitem is the only shuffle
# join (both sides large at 100 TB → sort-merge on orderkey; AQE picks
# broadcast when the filtered orders side turns out small).
# ---------------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o_date, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_orderpriority",
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 shape: revenue per nation — 6-way join. Only the BOUNDED dims
# (nation, region) carry broadcast hints; supplier/customer scale with the
# data, so their join strategy is left to AQE — broadcast at small sf,
# shuffled-hash/sort-merge at cluster scale, no OOM cliff either way.
# lineitem⨝orders is the single big shuffle; the supplier⨝customer
# same-nation constraint applies post-join as a filter.
# ---------------------------------------------------------------------------


@register(
    "region_nation_revenue",
    oracle=f"""
    SELECT n.n_name, CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey
      AND r.r_name IN ('AMERICA', 'ASIA')
      AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q4 shape: order-priority count gated on an EXISTS — a left-semi join of
# orders against returned lineitems. Semi-join shuffles only the key.
# ---------------------------------------------------------------------------


@register(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        .cast("date")
        .between(F.lit("1997-01-01").cast("date"), F.lit("1997-12-31").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q10 shape: top customers by returned revenue — join + agg + top-k.
# ---------------------------------------------------------------------------


@register(
    "top_returned_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS lost_revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def top_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_dec()).cast("double").alias("lost_revenue"))
        .select("c_custkey", "c_name", "lost_revenue", "n_name")
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.6 set operations: INTERSECT / EXCEPT / UNION over yearly customer
# activity — Catalyst rewrites these into semi/anti joins with the same
# shuffle shape as J1/J4.
# ---------------------------------------------------------------------------


@register(
    "customer_activity_setops",
    oracle="""
    WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'),
         y98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1998-01-01' AND DATE '1998-12-31')
    SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'only_1997' AS cohort, o_custkey FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'only_1998' AS cohort, o_custkey FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y97)
    ORDER BY cohort, o_custkey
    """,
)
def customer_activity_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")

    def year(y: int) -> DataFrame:
        return (
            o.filter(
                d.between(
                    F.lit(f"{y}-01-01").cast("date"), F.lit(f"{y}-12-31").cast("date")
                )
            )
            .select("o_custkey")
            .distinct()
        )

    y97, y98 = year(1997), year(1998)
    both = y97.intersect(y98).select(F.lit("both").alias("cohort"), "o_custkey")
    only97 = y97.exceptAll(y98).select(F.lit("only_1997").alias("cohort"), "o_custkey")
    only98 = y98.exceptAll(y97).select(F.lit("only_1998").alias("cohort"), "o_custkey")
    return both.unionByName(only97).unionByName(only98).orderBy("cohort", "o_custkey")


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP over (priority, status) — partial aggregation and
# the grouping-set expansion both happen map-side before one shuffle.
# ---------------------------------------------------------------------------


@register(
    "order_rollup",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY priority, status
    """,
)
def order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
        .orderBy("priority", "status")
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase event picks up the user's most recent
# at-or-before click (operators.temporal.as_of_join — union+window, one
# shuffle). DuckDB verifies via its native ASOF JOIN with the same
# greatest-event_id tie-break expressed as a window dedup.
# ---------------------------------------------------------------------------


@register(
    "asof_last_click",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS ts_matched, c.event_id AS click_event_id, c.value AS click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = as_of_join(
        purchases,
        clicks,
        on="user_id",
        ts_col="ts",
        payload_cols=("event_id", "value"),
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "ts_matched",
        F.col("event_id_matched").alias("click_event_id"),
        F.col("value_matched").alias("click_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Range join: events against a fixed grid of 2h observation windows at 7h
# stride — no equi-key, so a naive plan is a nested-loop join; the
# operator (operators.temporal.range_join_by_buckets) buckets time to
# turn it into an equi-join. The oracle states the plain inequality join.
# ---------------------------------------------------------------------------


@register(
    "events_in_windows",
    oracle=f"""
    WITH windows AS (
      SELECT i AS window_id,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 7 HOUR AS w_start,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 7 HOUR
               + INTERVAL 2 HOUR AS w_end
      FROM unnest(generate_series(0, 102)) AS t(i)
    )
    SELECT w.window_id, e.event_type,
           COUNT(*) AS n, {sql_exact_sum('e.value', 2)} AS sum_value
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id, e.event_type
    ORDER BY w.window_id, e.event_type
    """,
)
def events_in_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    windows = spark.range(0, 103).select(
        F.col("id").alias("window_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.col("id") * F.expr("INTERVAL 7 HOURS")
        ).alias("w_start"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.col("id") * F.expr("INTERVAL 7 HOURS")
            + F.expr("INTERVAL 2 HOURS")
        ).alias("w_end"),
    )
    joined = range_join_by_buckets(e, windows, "ts", "w_start", "w_end")
    return (
        joined.groupBy("window_id", "event_type")
        .agg(F.count("*").alias("n"), exact_sum(F.col("value"), 2).alias("sum_value"))
        .orderBy("window_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Q7 shape: trade volume between two nation pairs — the join graph runs
# supplier-side and customer-side nation lookups simultaneously; both
# nation dims broadcast, the pair predicate filters post-join.
# ---------------------------------------------------------------------------


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(strftime(o.o_orderdate, '%Y') AS INTEGER) AS order_year,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, order_year
    ORDER BY supp_nation, cust_nation, order_year
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share — conditional aggregation over one join;
# exact decimal sums keep the ratio bit-stable, the final division is one
# double op.
# ---------------------------------------------------------------------------


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_DEC} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_REV_DEC}) AS DOUBLE) * 100 AS promo_share_pct,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1998-01-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") >= F.lit("1998-01-01").cast("date")
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_dec()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(rev).cast("double") * 100
            ).alias("promo_share_pct"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — HAVING on an aggregate, then the
# qualifying key set (small) joins back as a broadcast semi-join against
# the fact tables.
# ---------------------------------------------------------------------------


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_date,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Pivot: daily event counts, event types as columns. Spark's pivot with an
# explicit value list stays a single partial-aggregated pass (no second
# shuffle for value discovery); the oracle states the equivalent
# conditional aggregation.
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "daily_event_pivot",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY event_date
    ORDER BY event_date
    """,
)
def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("event_date"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# Rank-based median (percentile_disc): deterministic element selection via
# row_number over the sorted column — no interpolated float arithmetic, so
# any engine reproduces it exactly; one shuffle for the window, one for
# the final aggregate.
# ---------------------------------------------------------------------------


@register(
    "median_order_value",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS median_lo,
           MAX(CASE WHEN rn = n // 2 + 1 THEN o_totalprice END) AS median_hi,
           MAX(n) AS n_orders
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    lo = F.max(
        F.when(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"), F.col("o_totalprice"))
    )
    hi = F.max(
        F.when(F.col("rn") == (F.col("n") / 2).cast("long") + 1, F.col("o_totalprice"))
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            lo.alias("median_lo"),
            hi.alias("median_hi"),
            F.max("n").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# JSON scalar extraction: the events.props payload column — JSON parsing
# happens in the projection (codegen'd get_json_object), so it pipelines
# with the scan; no UDF, no shuffle beyond the aggregate.
# ---------------------------------------------------------------------------


# Both engines cast the extracted string via DOUBLE then floor() before
# summing: a direct string->BIGINT cast truncates in non-ANSI Spark but
# rounds in DuckDB ('3.7' -> 3 vs 4), and driver DuckDB versions differ in
# JSON numeric coercion — DOUBLE+floor is version- and ANSI-stable.
@register(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(floor(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.floor(F.get_json_object("props", "$.k").cast("double")).cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Correlated-aggregate filter: parts priced above their brand average —
# expressed as a broadcast join against the per-brand aggregate (the
# decorrelated plan Catalyst would produce for the subquery).
# ---------------------------------------------------------------------------


@register(
    "above_brand_average",
    oracle=f"""
    WITH brand_avg AS (
      SELECT p_brand, {sql_exact_sum("p_retailprice", 2)} / COUNT(*) AS avg_price
      FROM part GROUP BY p_brand
    )
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, b.avg_price
    FROM part p JOIN brand_avg b ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > b.avg_price
    ORDER BY p.p_partkey
    """,
)
def above_brand_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(
        (exact_sum(F.col("p_retailprice"), 2) / F.count("*")).alias("avg_price")
    )
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_brand", "p_retailprice", "avg_price")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per (brand, type) with a NOT-IN
# exclusion — COUNT(DISTINCT) forces a two-phase aggregate (partial
# distinct map-side, exact merge after one shuffle); the exclusion list is
# tiny and becomes a broadcast anti-join, so the fact side never shuffles
# for it. Reference parity: generalizes the enabled-table NOT-IN filtering
# of `main.py` worklist assembly to an aggregate query.
# ---------------------------------------------------------------------------


@register(
    "brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        l.join(excluded, l.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of per-branch conjunctions spanning both join
# sides. The OR can't be pushed through the join as-is, but its part-side
# projection (brand IN the three branch brands) can — stated explicitly so
# the part scan prunes to 3/25 brands before the broadcast. The residual
# disjunction evaluates post-join inside codegen.
# ---------------------------------------------------------------------------

_Q19_BRANCHES = (
    ("Brand#1", 1, 10, 1, 20),
    ("Brand#2", 5, 25, 10, 30),
    ("Brand#3", 20, 50, 20, 50),
)


@register(
    "disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1}"
        f" AND l.l_quantity BETWEEN {q0} AND {q1})"
        for b, s0, s1, q0, q1 in _Q19_BRANCHES)}
    """,
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin([b for b, *_ in _Q19_BRANCHES])
    )
    branch = None
    for b, s0, s1, q0, q1 in _Q19_BRANCHES:
        this = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )
        branch = this if branch is None else (branch | this)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(_rev_dec()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar aggregate subquery (global mean balance) + anti-join
# (customers with no recent orders). The scalar lands as a 1-row broadcast
# cross-join; the anti-join side is pre-projected to the bare key so only
# (o_custkey) shuffles. Mean uses the decimal-exact sum so the comparison
# threshold is bit-identical on any engine/partitioning.
# ---------------------------------------------------------------------------


@register(
    "idle_customers",
    oracle=f"""
    WITH cutoff AS (
      SELECT {sql_exact_avg("c_acctbal", 2)} AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, COUNT(*) AS n_custs,
           {sql_exact_sum("c.c_acctbal", 2)} AS total_bal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '2001-01-01')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        exact_avg_2(F.col("c_acctbal")).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") >= F.lit("2001-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            exact_sum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def exact_avg_2(col):
    """Decimal-exact mean at scale 2 (mirrors functions.exact.sql_exact_avg)."""
    return F.sum(col.cast("decimal(18,2)")).cast("double") / F.count(col)


# ---------------------------------------------------------------------------
# Window frames: 7-day rolling revenue over the per-day aggregate. The
# frame window is ordered but unpartitioned — safe at any fact scale
# because its input is the daily aggregate (one row per date, a few
# thousand rows for decades of data), produced by a normal partial-agg
# shuffle first. Sums stay decimal inside the frame; one double cast at
# the edge keeps oracle hash parity.
# ---------------------------------------------------------------------------


@register(
    "rolling_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             COUNT(*) AS n_orders
      FROM orders GROUP BY d
    )
    SELECT d, CAST(rev AS DOUBLE) AS day_rev, n_orders,
           CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
           CAST(SUM(rev) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS avg_7d
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY d
    """,
)
def rolling_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").alias("n_orders"),
    )
    w = W.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        "d",
        F.col("rev").cast("double").alias("day_rev"),
        "n_orders",
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("avg_7d"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy part-name pairs — blocked levenshtein self-join
# (operators.dedup.blocked_fuzzy_pairs). The block key (the name's noun)
# makes the candidate join an equi-join; edit distance evaluates in
# codegen on candidates only, never all pairs.
# ---------------------------------------------------------------------------


@register(
    "fuzzy_name_pairs",
    oracle="""
    WITH p AS (SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS noun
               FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM p a JOIN p b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY name_a, name_b
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import blocked_fuzzy_pairs

    p = load_table(spark, sf_dir, "part")
    pairs = blocked_fuzzy_pairs(
        p, "p_name", F.split(F.col("p_name"), " ").getItem(1), max_dist=2
    )
    return pairs.orderBy("name_a", "name_b")


# ---------------------------------------------------------------------------
# NTILE deciles per order priority: equal-frequency banding inside each
# group; (o_totalprice, o_orderkey) ordering makes tile assignment
# deterministic. The window partitions by priority, so each group sorts
# independently after one shuffle. A GLOBAL ntile would serialize into a
# single partition at 100 TB — the scale-safe form is this partitioned
# one, or approx-quantile boundaries + a bucket join for a global band.
# ---------------------------------------------------------------------------


@register(
    "price_deciles",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             NTILE(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT o_orderpriority, decile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM ranked
    GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
)
def price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority", "o_totalprice", F.ntile(10).over(w).alias("decile")
        )
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority", "decile")
    )


# ---------------------------------------------------------------------------
# SCD Type 2: per-user event_type state history — intervals open at each
# change, close at the next (operators.scd.build_scd2). One shuffle: the
# change-detection lag and the interval lead share the window partition
# key. The reference truncates-and-reloads its targets, losing history
# (`ParquetFileInsertion.py` marker-gated full insert); this derives the
# warehouse-standard SCD2 view instead.
# ---------------------------------------------------------------------------


@register(
    "scd2_user_state",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER w AS prev,
             LAG(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM s
      WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER w2 AS valid_to,
           LEAD(ts) OVER w2 IS NULL AS is_current,
           event_id
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import build_scd2

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    hist = build_scd2(
        e,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak=["event_id"],
    )
    return hist.orderBy("user_id", "valid_from", "event_id")


# ---------------------------------------------------------------------------
# Integrity audit: referential (orphan) and domain checks as one result
# frame — the post-load validation the reference leaves to its freshness
# monitor alone (`check_bucket_latest_folders.py` checks arrival, not
# content). Each referential check is an anti-join projected to the bare
# key; dimension key-sets broadcast, so the fact scans are column-pruned
# single passes with no shuffle. Counts land in one row each, unioned —
# the union is driver-free (no collect) and each branch is independently
# schedulable.
# ---------------------------------------------------------------------------


@register(
    "integrity_audit",
    oracle="""
    SELECT 'customer_without_nation' AS check_name, COUNT(*) AS n_violations
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'lineitem_without_order', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_without_part', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'negative_balance_customers', COUNT(*)
    FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT 'nonpositive_quantity_lineitems', COUNT(*)
    FROM lineitem WHERE l_quantity <= 0
    ORDER BY check_name
    """,
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"), F.count("*").alias("n_violations")
        )

    nation_keys = load_table(spark, sf_dir, "nation").select("n_nationkey")
    order_keys = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part_keys = load_table(spark, sf_dir, "part").select("p_partkey")
    checks = [
        count_row(
            "customer_without_nation",
            c.join(
                F.broadcast(nation_keys),
                c.c_nationkey == F.col("n_nationkey"),
                "left_anti",
            ),
        ),
        count_row(
            "lineitem_without_order",
            l.select("l_orderkey").join(
                order_keys, l.l_orderkey == order_keys.o_orderkey, "left_anti"
            ),
        ),
        count_row(
            "lineitem_without_part",
            l.select("l_partkey").join(
                part_keys,
                l.l_partkey == part_keys.p_partkey,
                "left_anti",
            ),
        ),
        count_row("negative_balance_customers", c.filter(F.col("c_acctbal") < 0)),
        count_row(
            "nonpositive_quantity_lineitems", l.filter(F.col("l_quantity") <= 0)
        ),
    ]
    out = checks[0]
    for ck in checks[1:]:
        out = out.unionByName(ck)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# CUBE + grouping_id: all four (priority, status) grouping sets in one
# pass — like ROLLUP, the set expansion happens map-side before a single
# shuffle. gid disambiguates real NULL keys from subtotal rows (stated as
# GROUPING() bits in the oracle, Spark's grouping_id bit order: first
# cube column = MSB).
# ---------------------------------------------------------------------------


@register(
    "order_cube",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY gid, priority, status
    """,
)
def order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "total",
        )
        .orderBy("gid", "priority", "status")
    )


# ---------------------------------------------------------------------------
# Q21-style double-correlated existence chain: suppliers who were the ONLY
# returning supplier inside finished multi-supplier orders. The two
# correlated subqueries become a semi-join and an anti-join against the
# same derived "other suppliers of the order" frame — no row explosion,
# aggregates partial. (TPC-H Q21's receipt/commit lateness is adapted to
# l_returnflag: this dataset carries no receipt dates.)
# ---------------------------------------------------------------------------


@register(
    "sole_return_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("other_supp"),
        "l_returnflag",
    )
    with_other = l1.join(
        others,
        (l1.l_orderkey == others.o_key) & (l1.l_suppkey != others.other_supp),
        "left_semi",
    )
    other_returns = others.filter(F.col("l_returnflag") == "R")
    sole = with_other.join(
        other_returns,
        (with_other.l_orderkey == other_returns.o_key)
        & (with_other.l_suppkey != other_returns.other_supp),
        "left_anti",
    )
    return (
        sole.join(supplier, sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Q20-style correlated-aggregate semi-join: suppliers that shipped more
# than half of some part's total 1995 volume. The correlated "50% of the
# part's total" subquery becomes one (part) aggregate joined to the
# (part, supplier) aggregate — two partial-agg passes over the filtered
# fact, a broadcast-able ratio filter, then a semi-join to suppliers.
# ---------------------------------------------------------------------------


@register(
    "dominant_part_suppliers",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             {sql_exact_sum('l_quantity', 2)} AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      GROUP BY l_partkey, l_suppkey
    ), p AS (
      SELECT l_partkey, {sql_exact_sum('l_quantity', 2)} AS part_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      GROUP BY l_partkey
    ), dom AS (
      SELECT ps.l_suppkey, COUNT(*) AS n_dominated
      FROM ps JOIN p USING (l_partkey)
      WHERE ps.supp_qty > 0.5 * p.part_qty
      GROUP BY ps.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, d.n_dominated
    FROM supplier s JOIN dom d ON d.l_suppkey = s.s_suppkey
    ORDER BY s.s_suppkey
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-01-01").cast("date"))
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        exact_sum(F.col("l_quantity"), 2).alias("supp_qty")
    )
    p = li.groupBy("l_partkey").agg(
        exact_sum(F.col("l_quantity"), 2).alias("part_qty")
    )
    dom = (
        ps.join(p, "l_partkey")
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated"))
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(dom, s.s_suppkey == dom.l_suppkey)
        .select("s_suppkey", "s_name", "n_dominated")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# RANGE frame over calendar days: unlike rolling_daily_revenue's ROWS
# frame (which silently spans gaps — 7 *rows*, not 7 *days*), the RANGE
# frame bounds the window by VALUE distance on integer epoch days, so
# missing days shrink the window. Both engines order by the same integer,
# making the frames identical by construction. Unpartitioned window is
# safe: input is the bounded per-day aggregate.
# ---------------------------------------------------------------------------


@register(
    "weekly_range_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dnum,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT d, n_orders,
           CAST(rev AS DOUBLE) AS day_rev,
           CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
           CAST(COUNT(*) OVER w AS BIGINT) AS days_present_7d
    FROM daily
    WINDOW w AS (ORDER BY dnum RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY d
    """,
)
def weekly_range_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").alias("n_orders"),
    ).withColumn("dnum", F.unix_date("d"))
    w = W.orderBy("dnum").rangeBetween(-6, 0)
    return daily.select(
        "d",
        "n_orders",
        F.col("rev").cast("double").alias("day_rev"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
        F.count("*").over(w).alias("days_present_7d"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — LEFT OUTER join with an
# ON-clause filter (the filter must NOT drop order-less customers, so it
# lives in the join condition, not a WHERE), then a two-level aggregation.
# At scale: customer⨝orders shuffles on custkey with map-side partial
# counts; the second group-by runs over at most max(n_orders)+1 keys.
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-customer order counts, keeping zero-order
    customers via the outer join (the priority filter is part of the
    join condition so it cannot turn the join inner)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier(s) by windowed revenue, ties preserved. The max
# over the per-supplier aggregate is itself a tiny aggregate broadcast back
# — no unpartitioned window over the (sf-scaling) supplier set. Decimal
# -exact sums make the equality join on the max deterministic on any
# engine/parallelism.
# ---------------------------------------------------------------------------


@register(
    "quarterly_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_REV_DEC}) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def quarterly_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with maximal 1997-Q1 revenue (ties kept, Q15-style).

    The scalar max is computed as a 1-row aggregate of the per-supplier
    aggregate and broadcast — never a global window."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_rev_dec()).cast("double").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Year-over-year growth: LAG(4) over per-(nation, quarter) revenue. The
# window partitions by nation and the frame is bounded by the calendar
# (years x 4 rows per nation), so the sort inside each partition never
# scales with row volume — the same justification as rolling_daily_revenue.
# ---------------------------------------------------------------------------


@register(
    "nation_quarterly_growth",
    oracle=f"""
    WITH q AS (
      SELECT n.n_name,
             CAST(year(o.o_orderdate) AS INTEGER) AS yr,
             CAST(quarter(o.o_orderdate) AS INTEGER) AS qtr,
             {sql_exact_sum("o.o_totalprice", 2)} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, yr, qtr
    )
    SELECT cur.n_name, cur.yr, cur.qtr, cur.revenue,
           prev.revenue AS prev_year_rev,
           CASE WHEN prev.revenue IS NOT NULL AND prev.revenue <> 0
                THEN (cur.revenue - prev.revenue) / prev.revenue
           END AS yoy_growth
    FROM q cur
    LEFT JOIN q prev
      ON prev.n_name = cur.n_name
     AND prev.yr = cur.yr - 1
     AND prev.qtr = cur.qtr
    ORDER BY cur.n_name, cur.yr, cur.qtr
    """,
)
def nation_quarterly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation quarterly revenue with year-over-year growth against
    the SAME quarter of the previous calendar year.

    The baseline is an explicit (nation, year-1, quarter) self-join of
    the quarterly aggregate, not LAG(4): a lag over row positions
    silently fetches the wrong quarter as soon as one (nation, quarter)
    row is missing (review finding). The join runs over the bounded
    per-quarter aggregate. orders⨝customer shuffles on custkey; nation
    is a broadcast dim; the quarterly aggregate is partial-agg'd
    map-side. The growth division runs on two identically-derived
    doubles, so it is bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    q = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(exact_sum(F.col("o_totalprice"), 2).alias("revenue"))
    )
    prev = q.select(
        "n_name",
        (F.col("yr") + 1).alias("yr"),
        "qtr",
        F.col("revenue").alias("prev_year_rev"),
    )
    joined = q.join(prev, ["n_name", "yr", "qtr"], "left")
    return joined.select(
        "n_name",
        "yr",
        "qtr",
        "revenue",
        "prev_year_rev",
        F.when(
            F.col("prev_year_rev").isNotNull() & (F.col("prev_year_rev") != 0),
            (F.col("revenue") - F.col("prev_year_rev")) / F.col("prev_year_rev"),
        ).alias("yoy_growth"),
    ).orderBy("n_name", "yr", "qtr")


# ---------------------------------------------------------------------------
# Q2 flavor: cheapest supplier per part. The per-(part, supplier) metric
# uses MIN (exactly associative — no float fold-order hazard, unlike AVG),
# and the per-part winner is a ROW_NUMBER window over the aggregate with a
# total-order tie-break. Keyed by partkey throughout — partitions scale.
# ---------------------------------------------------------------------------


@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS min_unit
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, min_unit,
             ROW_NUMBER() OVER (
               PARTITION BY l_partkey ORDER BY min_unit, l_suppkey
             ) AS rn
      FROM unit
    )
    SELECT r.l_partkey AS partkey, p.p_name, r.l_suppkey AS suppkey,
           s.s_name, r.min_unit AS best_unit_price
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rn = 1
    ORDER BY partkey
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: the supplier with the lowest observed unit price.

    The per-row division is deterministic; MIN and the (min_unit,
    suppkey) tie-break give one bit-stable winner per part. part and
    supplier scale with sf, so no broadcast hints — AQE decides."""
    from pyspark.sql import Window as W

    l = load_table(spark, sf_dir, "lineitem")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit")
    )
    w = W.partitionBy("l_partkey").orderBy("min_unit", "l_suppkey")
    best = unit.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_name",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.col("min_unit").alias("best_unit_price"),
        )
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# Exact distributed quantiles by key: per order priority, the discrete
# p50/p90 of fulfillment lag (days from order date to last shipment).
# ROW_NUMBER + COUNT over the per-priority partition pick the k-th value
# exactly — integer outputs, no interpolation ULP hazard, and the window
# is keyed (never global). Both engines evaluate floor((n-1)*q) in IEEE
# doubles, so the picked index is identical by construction.
# ---------------------------------------------------------------------------


@register(
    "fulfillment_lag_quantiles",
    oracle="""
    WITH lag_t AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(MAX(l.l_shipdate) AS DATE)) AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ), ranked AS (
      SELECT o_orderpriority, lag_days,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority ORDER BY lag_days, o_orderkey
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM lag_t
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                         THEN lag_days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT) + 1
                         THEN lag_days END) AS BIGINT) AS p90_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def fulfillment_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90/max of order-fulfillment lag per priority.

    Two shuffles: orders⨝lineitem on orderkey (with a map-side partial
    MAX on shipdate), then one window pass partitioned by priority. The
    quantile index floor((n-1)*q)+1 is picked via ROW_NUMBER with a
    total-order tie-break — exact, integer-valued, engine-stable."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag_t = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.datediff(
                F.col("last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lag_days"),
        )
    )
    wp = W.partitionBy("o_orderpriority")
    ranked = lag_t.select(
        "o_orderpriority",
        "lag_days",
        F.row_number().over(wp.orderBy("lag_days", "o_orderkey")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    idx50 = (F.floor((F.col("n") - 1) * F.lit(0.5)) + 1).cast("long")
    idx90 = (F.floor((F.col("n") - 1) * F.lit(0.9)) + 1).cast("long")
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.max(F.when(F.col("rn") == idx50, F.col("lag_days")))
            .cast("long")
            .alias("p50_days"),
            F.max(F.when(F.col("rn") == idx90, F.col("lag_days")))
            .cast("long")
            .alias("p90_days"),
            F.max("lag_days").cast("long").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share by year — the share of a region's revenue whose
# SUPPLIER sits in one focus nation, per order year. A conditional
# decimal sum over the joined fact gives numerator and denominator in
# ONE aggregation pass; the share division runs on two identically
# -derived doubles. nation/region broadcast; customer/supplier unhinted.
# ---------------------------------------------------------------------------


@register(
    "market_share_by_year",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS yr,
           CAST(SUM(CASE WHEN ns.n_name = 'CANADA' THEN {_REV_DEC}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS nation_rev,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS region_rev,
           CAST(SUM(CASE WHEN ns.n_name = 'CANADA' THEN {_REV_DEC}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_REV_DEC}) AS DOUBLE) AS market_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN region r ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY yr
    ORDER BY yr
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of AMERICA-region revenue supplied from CANADA, per year
    (Q8 shape: conditional aggregate ratio in one pass)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nc = n.select(
        F.col("n_nationkey").alias("nck"), F.col("n_regionkey").alias("nrk")
    )
    ns = n.select(
        F.col("n_nationkey").alias("nsk"), F.col("n_name").alias("supp_nation")
    )
    rr = r.filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    dec0 = F.lit(0).cast("decimal(18,4)")
    rev = _rev_dec().cast("decimal(18,4)")
    nat = F.when(F.col("supp_nation") == "CANADA", rev).otherwise(dec0)
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("nck"))
        .join(F.broadcast(rr), F.col("nrk") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("nsk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(nat).cast("double").alias("nation_rev"),
            F.sum(rev).cast("double").alias("region_rev"),
            (F.sum(nat).cast("double") / F.sum(rev).cast("double")).alias(
                "market_share"
            ),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Q6 shape: forecast-revenue-change — a pure filter + global aggregate,
# grouped here by the discount band so the answer shows *which* discount
# level carries the revenue. Everything pushes into the scan (shipdate
# year, discount band, quantity cap are all PushedFilters); the aggregate
# is map-side partial over at most 3 groups. At 100 TB this is the
# cheapest query shape the engine runs: no join, no wide shuffle — the
# shuffle moves 3 rows per task.
# ---------------------------------------------------------------------------


@register(
    "discount_band_revenue",
    oracle="""
    SELECT l_discount,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS discount_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    GROUP BY l_discount
    ORDER BY l_discount
    """,
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue the 1996 discount band 5-7% gave away on small-quantity
    lines (Q6 flavor), per discount level.

    Parity notes: the band compares the raw stored doubles against
    literal doubles (identical bits in both engines); the revenue term is
    decimal x decimal so accumulation order cannot change the sum.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return (
        l.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy("l_discount")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(disc_rev).cast("double").alias("discount_revenue"),
        )
        .orderBy("l_discount")
    )


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue. The correlated "quantity below
# half of this part's average" is decorrelated into a per-part aggregate
# joined back to lineitem — both shuffles key on partkey, so AQE can plan
# them into one exchange reuse. The 0.5 x avg comparison is rewritten in
# ALL-INTEGER arithmetic (2*qty*cnt < sum_qty) so no engine's float
# division can flip a boundary row: quantities are integer-valued, and
# the rewrite is exactly equivalent to qty < 0.5 * sum/cnt. (TPC-H uses
# 0.2 x avg; with this fixture's uniform 1-50 quantities that keeps ~0
# rows at small sf, so the audit uses the half-average band.)
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    oracle=f"""
    WITH bparts AS (
      SELECT p_partkey, p_brand FROM part
      WHERE p_brand IN ('Brand#4', 'Brand#12', 'Brand#13', 'Brand#23') AND p_size <= 25
    ),
    qstats AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem JOIN bparts ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT b.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           {sql_exact_sum("l.l_extendedprice", 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN bparts b ON l.l_partkey = b.p_partkey
    JOIN qstats q ON l.l_partkey = q.l_partkey
    WHERE 2 * CAST(l.l_quantity AS BIGINT) * q.cnt < q.sum_qty
    GROUP BY b.p_brand
    ORDER BY b.p_brand
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue lost to small-quantity orders of four brands'
    small parts (Q17 flavor), per brand.

    bparts is a filtered dimension -> broadcast to both lineitem passes;
    the per-part quantity stats and the probe join both shuffle lineitem
    on l_partkey only. The sub-average predicate is integer-exact."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#4", "Brand#12", "Brand#13", "Brand#23")
            & (F.col("p_size") <= 25)
        )
        .select("p_partkey", "p_brand")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lb = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    qstats = lb.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    small = lb.join(qstats, "l_partkey").filter(
        F.lit(2) * F.col("l_quantity").cast("bigint") * F.col("cnt")
        < F.col("sum_qty")
    )
    return (
        small.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_lines"),
            (exact_sum(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Event-analytics additions: ordered conversion funnel and daily cohort
# retention over the events stream. Both stay keyed by user_id for every
# shuffle (no global windows); the funnel's stage counts are three tiny
# 1-row aggregates broadcast together; retention joins each cohort row
# to its offset-0 base with a broadcast (cohorts are calendar-bounded).
# Day indexing uses an explicit epoch-anchored datediff so both engines
# share one definition (no date_trunc semantics dependence).
# ---------------------------------------------------------------------------


@register(
    "conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM v) AS nv,
             (SELECT COUNT(*) FROM c) AS nc,
             (SELECT COUNT(*) FROM p) AS np
    )
    SELECT * FROM (
      SELECT CAST(1 AS INTEGER) AS stage_idx, 'view' AS stage,
             CAST(nv AS BIGINT) AS n_users,
             CAST(1.0 AS DOUBLE) AS conversion_from_prev
      FROM counts
      UNION ALL
      SELECT 2, 'click', CAST(nc AS BIGINT), CAST(nc AS DOUBLE) / nv
      FROM counts
      UNION ALL
      SELECT 3, 'purchase', CAST(np AS BIGINT), CAST(np AS DOUBLE) / nc
      FROM counts
    ) ORDER BY stage_idx
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: users reaching each
    stage IN ORDER (a click only counts after that user's first view),
    with stage-to-stage conversion rates.

    Each stage is a per-user min-timestamp aggregate joined to the
    previous stage — every shuffle keys on user_id, and the three stage
    counts are 1-row aggregates combined via broadcast."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v.select("user_id", F.col("t").alias("vt")), "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", F.col("t").alias("ct")), "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("nv"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("nc"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("np"))))
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_idx"),
                    F.lit("view").alias("stage"),
                    F.col("nv").alias("n_users"),
                    F.lit(1.0).alias("conversion_from_prev"),
                ),
                F.struct(
                    F.lit(2).alias("stage_idx"),
                    F.lit("click").alias("stage"),
                    F.col("nc").alias("n_users"),
                    (F.col("nc").cast("double") / F.col("nv")).alias(
                        "conversion_from_prev"
                    ),
                ),
                F.struct(
                    F.lit(3).alias("stage_idx"),
                    F.lit("purchase").alias("stage"),
                    F.col("np").alias("n_users"),
                    (F.col("np").cast("double") / F.col("nc")).alias(
                        "conversion_from_prev"
                    ),
                ),
            )
        ).alias("s")
    )
    return stages.select("s.*").orderBy("stage_idx")


@register(
    "cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
        CAST(CAST(e.ts AS DATE) - DATE '1995-01-02' AS BIGINT) AS dy,
        CAST(f.d0 - DATE '1995-01-02' AS BIGINT) AS cohort_day
      FROM events e JOIN f ON e.user_id = f.user_id
    ),
    ret AS (
      SELECT cohort_day, dy - cohort_day AS offset_days,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM act GROUP BY cohort_day, dy
    ),
    base AS (
      SELECT cohort_day, n_active AS n0 FROM ret WHERE offset_days = 0
    )
    SELECT r.cohort_day, CAST(r.offset_days AS BIGINT) AS offset_days,
           r.n_active, CAST(r.n_active AS DOUBLE) / b.n0 AS retention
    FROM ret r JOIN base b ON r.cohort_day = b.cohort_day
    ORDER BY r.cohort_day, r.offset_days
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort triangle: users grouped by first-activity day,
    fraction still active N days later.

    Activity reduces to DISTINCT (user, day) pairs first — the corpus
    -scale dedup — then the per-(cohort, offset) counts are a bounded
    calendar-sized aggregate; the offset-0 base joins back broadcast.
    The day index is an explicit epoch-anchored datediff in both
    engines."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    anchor = F.lit("1995-01-02").cast("date")
    act = (
        e.join(f, "user_id")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), anchor).cast("bigint").alias(
                "dy"
            ),
            F.datediff(F.col("d0"), anchor).cast("bigint").alias("cohort_day"),
        )
        .distinct()
    )
    ret = act.groupBy("cohort_day", "dy").agg(
        F.count(F.lit(1)).alias("n_active")
    ).select(
        "cohort_day",
        (F.col("dy") - F.col("cohort_day")).alias("offset_days"),
        "n_active",
    )
    base = ret.filter(F.col("offset_days") == 0).select(
        "cohort_day", F.col("n_active").alias("n0")
    )
    return (
        ret.join(F.broadcast(base), "cohort_day")
        .select(
            "cohort_day",
            "offset_days",
            "n_active",
            (F.col("n_active").cast("double") / F.col("n0")).alias("retention"),
        )
        .orderBy("cohort_day", "offset_days")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM nxt WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
           CAST(n_trans AS DOUBLE)
             / SUM(n_trans) OVER (PARTITION BY from_type) AS p_next
    FROM c ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type).

    The LEAD window keys on user_id (per-user state fits one partition's
    sort — never a global window), successor pairs reduce to a
    #event_types^2-bounded aggregate, and the normalizing row-sum window
    runs over that bounded aggregate only. Ties at equal timestamps are
    broken by event_id in BOTH engines, so the successor relation is
    total-ordered and deterministic. Generalizes the reference's
    per-entity latest-state scans (CheckTimeStampSQLServer.py:36-55)
    into sequence analytics.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = nxt.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n_trans"))
    wrow = W.partitionBy("from_type")
    return (
        c.select(
            "from_type",
            "to_type",
            "n_trans",
            (
                F.col("n_trans").cast("double") / F.sum("n_trans").over(wrow)
            ).alias("p_next"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_exact_sum('o_totalprice')} AS total_value,
           MIN(o_totalprice) AS min_value,
           MAX(o_totalprice) AS max_value,
           {sql_exact_sum('o_totalprice')} / COUNT(*) AS avg_value
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, proven against a full
    recompute: history (orders before 1997-07-01) and the delta
    partition aggregate SEPARATELY into mergeable per-priority states
    (count, decimal-exact sum, min, max), the states merge, and the
    merged result must equal the oracle's single-pass aggregate over
    everything — because decimal addition is associative, the identity
    holds bit-for-bit at any parallelism.

    This is the 100 TB nightly-ETL pattern (generalizing the
    reference's re-scan-everything refresh,
    CigEolHostingIngestionLogic.py:168-188): history's state is a
    per-key frame you persist and roll forward; each day aggregates
    only its delta and merges — O(delta + keys), never O(history).
    """
    from ..operators.maintenance import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_state,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    cutoff = F.lit("1997-07-01").cast("timestamp")
    old = aggregate_state(
        o.filter(F.col("o_orderdate") < cutoff), ["o_orderpriority"], "o_totalprice"
    )
    delta = aggregate_state(
        o.filter(F.col("o_orderdate") >= cutoff), ["o_orderpriority"], "o_totalprice"
    )
    merged = merge_aggregate_state(old, delta, ["o_orderpriority"])
    return finalize_aggregate_state(merged, ["o_orderpriority"]).orderBy(
        "o_orderpriority"
    )


@register(
    "cdc_snapshot",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_event_type,
           value AS last_value,
           ts AS last_ts
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog application: the event stream read as a change log
    on user_id (an ``error`` event acts as the delete tombstone, any
    other event upserts the user's state), reduced to the final
    snapshot — last writer wins, trailing deletes drop the key.

    One window keyed by the CDC key (ts + event_id form the total
    order) — the snapshot costs O(changelog), never O(history), and a
    hot key pays only its own sort. See ``operators.scd.cdc_apply``.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
    )
    from ..operators.scd import cdc_apply

    snap = cdc_apply(e, ["user_id"], ["ts", "event_id"], "op", "D")
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    ).orderBy("user_id")


def _sql_pagerank_ctes(n_iters: int = 3) -> str:
    """Unrolled CTE mirror of ``operators.graph.undirected_pagerank``
    (same unrolled-iteration oracle technique as the BPE merge steps).
    Expects a CTE ``pairs`` (src, dst) of distinct undirected edges."""
    from ..operators.graph import PR_BASE, PR_DAMPING, PR_TELEPORT

    ctes = [
        "bidir AS (SELECT src AS u, dst AS v FROM pairs"
        " UNION ALL SELECT dst AS u, src AS v FROM pairs)",
        "deg AS (SELECT u, COUNT(*) AS deg FROM bidir GROUP BY u)",
        f"r0 AS (SELECT u, CAST({PR_BASE} AS BIGINT) AS pr FROM deg)",
    ]
    for it in range(n_iters):
        prev, cur = f"r{it}", f"r{it + 1}"
        ctes.append(
            f"""c{it} AS (
      SELECT b.v,
             CAST(FLOOR(CAST(r.pr AS DOUBLE) / CAST(d.deg AS DOUBLE))
                  AS BIGINT) AS c
      FROM bidir b JOIN {prev} r ON r.u = b.u JOIN deg d ON d.u = b.u
    )"""
        )
        ctes.append(
            f"""{cur} AS (
      SELECT v AS u,
             CAST(FLOOR({PR_TELEPORT!r} + {PR_DAMPING} * CAST(SUM(c) AS DOUBLE))
                  AS BIGINT) AS pr
      FROM c{it} GROUP BY v
    )"""
        )
    ctes.append(f"ranks AS (SELECT u AS node, pr FROM r{n_iters})")
    return ",\n    ".join(ctes)


@register(
    "part_copurchase_pagerank",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    {_sql_pagerank_ctes(n_iters=3)}
    SELECT node AS part_key, pr, rnk FROM (
      SELECT node, pr,
             ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rnk
      FROM ranks
    ) WHERE rnk <= 30 ORDER BY rnk
    """,
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph centrality: PageRank over the part co-purchase graph
    (parts are linked when they ship in the same order), top 30 — the
    'authority scoring' shape a corpus-curation pipeline runs over
    domain/document co-citation graphs.

    Edge build is a self-equi-join on the order key (per-order fan-out
    is bounded by lines-per-order²; at 100 TB cap pathological orders
    the same way the shingle index caps hot shingles). The iteration is
    the integer-quantized exact PageRank (operators/graph.py): integer
    ranks and in-sums, one identically-rounded double product per
    update, FIXED iteration count — so the unrolled single-threaded CTE
    oracle reproduces it bit-for-bit. The final top-30 window runs over
    the node-sized rank frame only.
    """
    from ..operators.graph import undirected_pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    ranks = undirected_pagerank(pairs, n_iters=3)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("pr").desc(), F.col("node"))
    return (
        ranks.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 30)
        .select(F.col("node").alias("part_key"), "pr", "rnk")
        .orderBy("rnk")
    )


@register(
    "price_quantity_stats",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
      FROM b GROUP BY l_returnflag
    ), d AS (
      SELECT l_returnflag, n, sx, sy,
             CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS cov_n,
             CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS var_x_n,
             CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS var_y_n
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(cov_n AS DOUBLE) / CAST(var_x_n AS DOUBLE)
             AS slope_cents_per_unit,
           (CAST(sy AS DOUBLE)
              - (CAST(cov_n AS DOUBLE) / CAST(var_x_n AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents,
           CAST(cov_n AS DOUBLE)
             / sqrt(CAST(var_x_n AS DOUBLE) * CAST(var_y_n AS DOUBLE))
             AS pearson_r
    FROM d ORDER BY l_returnflag
    """,
)
def price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS regression (price-in-cents on quantity) and
    Pearson correlation — grouped statistical modeling with the exact
    -moment discipline: quantities are integral and prices 2-decimal,
    so x, y, x², y², xy are EXACT integers; the five moment sums
    accumulate in decimal (int64 would overflow on Σy² past ~1e5 rows
    per group), the covariance/variance numerators are exact decimal
    differences, and only the final slope/intercept/r expressions touch
    doubles — each a fixed expression over exactly-derived operands, so
    both engines round identically and the result is independent of
    partitioning. One partial-aggregating shuffle keyed by the group.
    """
    x = F.col("l_quantity").cast("bigint")
    y = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
    )
    b = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", x.alias("x"), y.alias("y")
    )
    dec = "decimal(38,0)"
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    nd = F.col("n").cast(dec)
    d = m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        (nd * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_n"),
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).alias("var_x_n"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).alias("var_y_n"),
    )
    slope = F.col("cov_n").cast("double") / F.col("var_x_n").cast("double")
    return d.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        slope.alias("slope_cents_per_unit"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
        (
            F.col("cov_n").cast("double")
            / F.sqrt(
                F.col("var_x_n").cast("double") * F.col("var_y_n").cast("double")
            )
        ).alias("pearson_r"),
    ).orderBy("l_returnflag")


CHI2_QUANT = 1_000_000_000  # per-cell statistic quantization (nano-units)


@register(
    "weekday_event_chi2",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(dayofweek(ts) AS INTEGER) AS dow, event_type,
             COUNT(*) AS o
      FROM events GROUP BY dow, event_type
    ), rows_ AS (
      SELECT dow, CAST(SUM(o) AS BIGINT) AS row_tot FROM obs GROUP BY dow
    ), cols_ AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS col_tot
      FROM obs GROUP BY event_type
    ), tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid AS (
      SELECT r.dow, c.event_type, r.row_tot, c.col_tot,
             COALESCE(obs.o, 0) AS o
      FROM rows_ r
      CROSS JOIN cols_ c
      LEFT JOIN obs ON obs.dow = r.dow AND obs.event_type = c.event_type
    ),
    cells AS (
      SELECT CAST(FLOOR(
               ((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))
                * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)))
               / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  * CAST(n AS DOUBLE))
               * {CHI2_QUANT} / CAST(n AS DOUBLE)
             ) AS BIGINT) AS term_q
      FROM grid CROSS JOIN tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(term_q) AS BIGINT) AS chi2_quantized,
           CAST(SUM(term_q) AS DOUBLE) / {CHI2_QUANT} AS chi2,
           CAST((SELECT COUNT(*) FROM rows_) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM cols_) - 1 AS BIGINT) AS dof
    FROM cells
    """,
)
def weekday_event_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of weekday vs event type — the
    association screen a pipeline runs before trusting a segmentation.

    The contingency grid is the FULL cross of observed marginals — a
    missing (dow, type) combination enters as O=0 and contributes its
    expected count to the statistic (dropping empty cells would bias
    chi2 low exactly when the association is strongest). The per-cell
    term (O·n − row·col)²/(row·col·n)/n computes over double-cast
    factors (cast-then-multiply rounds once, identically in both
    engines, and never wraps — int64 products would overflow past
    ~3e9 events), is floor-quantized to nano-units, and integer-sums —
    partition- and engine-invariant. Everything after the one
    partial-aggregating shuffle is bounded by 7 × #types; the dof
    factors ride along as broadcast 1-row aggregates, so building the
    plan runs no jobs.
    """
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"), "event_type"
    ).agg(F.count(F.lit(1)).alias("o"))
    from ..operators.dedup import _persist

    obs = _persist(obs)
    rows_ = obs.groupBy("dow").agg(F.sum("o").alias("row_tot"))
    cols_ = obs.groupBy("event_type").agg(F.sum("o").alias("col_tot"))
    tot = obs.agg(F.sum("o").alias("n"))
    dims = rows_.agg(F.count(F.lit(1)).alias("n_rows_")).crossJoin(
        F.broadcast(cols_.agg(F.count(F.lit(1)).alias("n_cols_")))
    )
    grid = (
        rows_.crossJoin(cols_)
        .join(obs, ["dow", "event_type"], "left")
        .select(
            "row_tot", "col_tot", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    num = (
        F.col("o").cast("double") * F.col("n").cast("double")
        - F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
    )
    term = (
        (num * num)
        / (
            F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
            * F.col("n").cast("double")
        )
        * CHI2_QUANT
        / F.col("n").cast("double")
    )
    cells = grid.crossJoin(F.broadcast(tot)).select(
        F.floor(term).cast("bigint").alias("term_q")
    )
    return (
        cells.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("term_q").alias("chi2_quantized"),
            (F.sum("term_q").cast("double") / CHI2_QUANT).alias("chi2"),
        )
        .crossJoin(F.broadcast(dims))
        .select(
            "n_cells",
            "chi2_quantized",
            "chi2",
            ((F.col("n_rows_") - 1) * (F.col("n_cols_") - 1))
            .cast("bigint")
            .alias("dof"),
        )
    )

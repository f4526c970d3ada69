"""Relational operator suite over the TPC-H-ish driver tables.

Covers the taxonomy of SURVEY.md §2.2: scan/filter/project, broadcast and
shuffled equi-joins, semi/anti joins, partial+final aggregation, distinct
aggregation, rollup, window functions (rank, lag, sessionization), sort/top-k,
set ops, and date arithmetic. Every aggregate over doubles is rounded on both
sides so the value-hash is insensitive to last-ulp engine differences.

Scale notes (100 TB discipline):
* dimension joins (`nation`, `region`, `customer` at small SF) broadcast —
  never shuffled (`F.broadcast`);
* fact-fact joins shuffle on the join key and rely on AQE for skew;
* top-k uses rank-then-filter with a total tiebreak order, not `collect`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from . import load


def _dec(col_name: str):
    """Exact decimal view of a double column: engine-order-independent sums."""
    return F.col(col_name).cast("decimal(18,6)")


def _revenue_dec():
    return _dec("l_extendedprice") * (1 - F.col("l_discount")).cast("decimal(18,6)")

# --------------------------------------------------------------------------
# Q: pricing summary (TPC-H Q1 shape): scan + filter pushdown + hash agg.
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
         AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
         AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# Q: segment revenue per order (customer ⋈ orders ⋈ lineitem, no limit).
# --------------------------------------------------------------------------


def q_segment_order_revenue(spark, sf):
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SQL_SEGMENT_REVENUE = """
SELECT o_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
"""

# --------------------------------------------------------------------------
# Q: nation revenue (5-way join incl. region filter; TPC-H Q5 shape).
# --------------------------------------------------------------------------


def q_nation_revenue(spark, sf):
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SQL_NATION_REVENUE = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND c_nationkey = s_nationkey
GROUP BY n_name
"""

# --------------------------------------------------------------------------
# Q: top-k with deterministic integer measure + total tiebreak order.
# --------------------------------------------------------------------------


def q_topk_orders_by_items(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("n_items"), F.asc("l_orderkey"))
        .limit(20)
    )


_SQL_TOPK_ORDERS = """
SELECT l_orderkey, COUNT(*) AS n_items
FROM lineitem
GROUP BY l_orderkey
ORDER BY n_items DESC, l_orderkey ASC
LIMIT 20
"""

# --------------------------------------------------------------------------
# Q: window rank — top 3 orders per customer by price (no arithmetic on the
# sort key, so float ordering is identical across engines).
# --------------------------------------------------------------------------


def q_window_top_orders_per_customer(spark, sf):
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


_SQL_WINDOW_TOP_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank_in_cust
  FROM orders
) WHERE rank_in_cust <= 3
"""

# --------------------------------------------------------------------------
# Q: anti join — customers with no orders.
# --------------------------------------------------------------------------


def q_customers_without_orders(spark, sf):
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SQL_CUST_NO_ORDERS = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

# --------------------------------------------------------------------------
# Q: semi join — customers with at least one finished order.
# --------------------------------------------------------------------------


def q_customers_with_f_orders(spark, sf):
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


_SQL_CUST_F_ORDERS = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""

# --------------------------------------------------------------------------
# Q: distinct aggregation per priority.
# --------------------------------------------------------------------------


def q_priority_distinct_customers(spark, sf):
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_price"),
    )


_SQL_PRIORITY_DISTINCT = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
"""

# --------------------------------------------------------------------------
# Q: rollup over region/nation customer stats.
# --------------------------------------------------------------------------


def q_rollup_customer_geo(spark, sf):
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("total_balance"),
    )


_SQL_ROLLUP_GEO = """
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

# --------------------------------------------------------------------------
# Q: set op — nations with customers but no suppliers.
# --------------------------------------------------------------------------


def q_nations_customers_no_suppliers(spark, sf):
    nation = load(spark, sf, "nation")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    with_cust = nation.join(
        cust, nation.n_nationkey == cust.c_nationkey, "left_semi"
    ).select("n_name")
    with_supp = nation.join(
        supp, nation.n_nationkey == supp.s_nationkey, "left_semi"
    ).select("n_name")
    return with_cust.exceptAll(with_supp).distinct()


_SQL_NATIONS_SETOP = """
SELECT n_name FROM nation
WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
EXCEPT
SELECT n_name FROM nation
WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
"""

# --------------------------------------------------------------------------
# Q: tumbling-window event aggregation (streaming-shaped, batch-executed).
# --------------------------------------------------------------------------


def q_events_hourly(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("total_value"),
        )
    )


_SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# Q: lag window — inter-event gap stats per user (microsecond-exact ints).
# --------------------------------------------------------------------------


def q_user_event_gaps(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    return (
        ev.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(F.sum("gap_us").cast("double") / F.count("gap_us"), 2).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


_SQL_USER_EVENT_GAPS = """
SELECT user_id,
       COUNT(gap_us) AS n_gaps,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us), 2) AS avg_gap_us,
       MAX(gap_us) AS max_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap_us
  FROM events
)
GROUP BY user_id
"""

# --------------------------------------------------------------------------
# Q: sessionization — 30-minute inactivity gap splits sessions.
# --------------------------------------------------------------------------


def q_user_sessions(spark, sf):
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    new_session = F.when(
        gap_us.isNull() | (gap_us > 1_800_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = ev.withColumn("session_id", F.sum(new_session).over(wsum))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("session_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_events").alias("max_session_events"),
    )


_SQL_USER_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS session_events
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(session_events) AS max_session_events
FROM per_session GROUP BY user_id
"""

# --------------------------------------------------------------------------
# Q: string/date functions — order month + priority class projection.
# --------------------------------------------------------------------------


def q_order_month_profile(spark, sf):
    orders = load(spark, sf, "orders")
    return (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_class"),
            F.col("o_totalprice"),
        )
        .groupBy("order_month", "prio_class")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1)), 2).alias("avg_price"),
        )
    )


_SQL_ORDER_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_class,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 2) AS avg_price
FROM orders
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q: CUBE over (orderstatus, orderpriority) — all grouping-set combinations
# in one pass (partial-aggregated like any groupBy; no extra scans).
# --------------------------------------------------------------------------


def q_order_status_priority_cube(spark, sf):
    orders = load(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

# --------------------------------------------------------------------------
# Q: pivot — order counts per (month, priority) with priorities as columns.
# The pivot value list is FIXED (the 5 TPC-H priorities) so the plan is a
# single pass with no values-discovery job.
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def q_order_priority_pivot(spark, sf):
    orders = load(spark, sf, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    pivoted = (
        orders.select(month, "o_orderpriority")
        .groupBy("order_month")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = pivoted.select(
        "order_month",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c)
            for p, c in zip(_PRIORITIES, _PRIO_COLS)
        ],
    )
    return renamed


_SQL_PIVOT = "\nSELECT strftime(o_orderdate, '%Y-%m') AS order_month,\n" + ",\n".join(
    f"       CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS {c}"
    for p, c in zip(_PRIORITIES, _PRIO_COLS)
) + "\nFROM orders\nGROUP BY 1\n"

# --------------------------------------------------------------------------
# Q: exact interpolated quantiles per language (Spark `percentile` and
# DuckDB `quantile_cont` share linear-interpolation semantics; inputs are
# integers so the arithmetic is bit-identical).
# --------------------------------------------------------------------------


def q_doc_length_quantiles(spark, sf):
    docs = load(spark, sf, "documents")
    q = F.expr("percentile(n_chars, array(0.25, 0.5, 0.9, 0.99))")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.element_at(q, 1).alias("p25"),
        F.element_at(q, 2).alias("p50"),
        F.element_at(q, 3).alias("p90"),
        F.element_at(q, 4).alias("p99"),
    )


_SQL_QUANTILES = """
SELECT lang,
       COUNT(*) AS n_docs,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       quantile_cont(n_chars, 0.99) AS p99
FROM documents
GROUP BY lang
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "segment_order_revenue": q_segment_order_revenue,
    "nation_revenue": q_nation_revenue,
    "topk_orders_by_items": q_topk_orders_by_items,
    "window_top_orders_per_customer": q_window_top_orders_per_customer,
    "customers_without_orders": q_customers_without_orders,
    "customers_with_f_orders": q_customers_with_f_orders,
    "priority_distinct_customers": q_priority_distinct_customers,
    "rollup_customer_geo": q_rollup_customer_geo,
    "nations_customers_no_suppliers": q_nations_customers_no_suppliers,
    "events_hourly": q_events_hourly,
    "user_event_gaps": q_user_event_gaps,
    "user_sessions": q_user_sessions,
    "order_month_profile": q_order_month_profile,
    "order_status_priority_cube": q_order_status_priority_cube,
    "order_priority_pivot": q_order_priority_pivot,
    "doc_length_quantiles": q_doc_length_quantiles,
}

ORACLES = {
    "pricing_summary": _SQL_PRICING,
    "segment_order_revenue": _SQL_SEGMENT_REVENUE,
    "nation_revenue": _SQL_NATION_REVENUE,
    "topk_orders_by_items": _SQL_TOPK_ORDERS,
    "window_top_orders_per_customer": _SQL_WINDOW_TOP_ORDERS,
    "customers_without_orders": _SQL_CUST_NO_ORDERS,
    "customers_with_f_orders": _SQL_CUST_F_ORDERS,
    "priority_distinct_customers": _SQL_PRIORITY_DISTINCT,
    "rollup_customer_geo": _SQL_ROLLUP_GEO,
    "nations_customers_no_suppliers": _SQL_NATIONS_SETOP,
    "events_hourly": _SQL_EVENTS_HOURLY,
    "user_event_gaps": _SQL_USER_EVENT_GAPS,
    "user_sessions": _SQL_USER_SESSIONS,
    "order_month_profile": _SQL_ORDER_MONTH,
    "order_status_priority_cube": _SQL_CUBE,
    "order_priority_pivot": _SQL_PIVOT,
    "doc_length_quantiles": _SQL_QUANTILES,
}

"""Temporal join operators Spark lacks as built-ins: as-of join and range
join — expressed through scale-safe compositions of native DataFrame ops
(union + window, bucketed equi-join), oracled against DuckDB's native
``ASOF JOIN`` and inequality-join support.

Why not a naive theta-join: at 10^10 rows a ``a.ts >= b.ts`` join condition
degenerates to a broadcast-nested-loop / cartesian plan. The patterns here
keep everything equi-partitioned:

* **as-of**: tag both streams, union, one window per key ordered by time —
  the match is ``last(value, ignorenulls)`` over the unbounded-preceding
  frame. One shuffle on the key, no pair explosion, works at any skew with
  the usual salting.
* **range**: bucket both sides by the window width; every [t, t+W) interval
  intersects at most two buckets, so an equi-join on (key, bucket) with the
  exact range filter afterwards bounds candidates to 2× the matching rows.

Events carry a deterministic *virtual* timestamp inside the orders' date
range (``DATE '1995-01-01' + event_id % 2400 days``) so the temporal logic
is exercised with real variation (the tables' native ranges don't overlap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from . import load

_EPOCH = "1995-01-01"
_VDAYS = 2400
_RANGE_DAYS = 30


def _events_virtual(spark, sf):
    ev = load(spark, sf, "events")
    vts = F.date_add(
        F.lit(_EPOCH).cast("date"),
        F.pmod(F.col("event_id"), F.lit(_VDAYS)).cast("int"),
    ).cast("timestamp")
    return ev.select("event_id", "user_id", vts.alias("vts"))


def _orders_dedup(spark, sf):
    """One row per (custkey, orderdate): max orderkey — as-of needs a
    deterministic winner among same-instant rows on both engines."""
    return (
        load(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("key"), F.col("o_orderdate").alias("t")
        )
        .agg(F.max("o_orderkey").alias("ok"))
    )


# --------------------------------------------------------------------------
# Q: as-of join — for each event, the latest order of the same user with
# orderdate <= virtual event time. Union + per-key window, never a
# theta-join.
# --------------------------------------------------------------------------


def q_asof_order_before_event(spark, sf):
    ev = _events_virtual(spark, sf)
    orders = _orders_dedup(spark, sf)
    o_side = orders.select(
        "key",
        "t",
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct(F.col("t").alias("at"), F.col("ok").alias("ok")).alias("ord"),
    )
    e_side = ev.select(
        F.col("user_id").alias("key"),
        F.col("vts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None)
        .cast("struct<at:timestamp,ok:bigint>")
        .alias("ord"),
    )
    # same-instant rule: the order sorts before the event (is_event asc), so
    # an order dated exactly at the event's time matches — ASOF >= semantics
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("t"), F.asc("is_event"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = o_side.unionByName(e_side).withColumn(
        "asof", F.last("ord", ignorenulls=True).over(w)
    )
    return (
        tagged.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("t").alias("vts"),
            F.col("asof.ok").alias("asof_orderkey"),
            F.col("asof.at").alias("asof_orderdate"),
        )
    )


_SQL_ASOF = f"""
WITH co AS (
  SELECT o_custkey AS key, o_orderdate AS t, MAX(o_orderkey) AS ok
  FROM orders GROUP BY 1, 2
), ev AS (
  SELECT event_id, user_id,
         CAST(DATE '{_EPOCH}' + CAST(event_id % {_VDAYS} AS INT) AS TIMESTAMP)
           AS vts
  FROM events
)
SELECT e.event_id, e.user_id, e.vts,
       co.ok AS asof_orderkey, co.t AS asof_orderdate
FROM ev e ASOF LEFT JOIN co ON e.user_id = co.key AND e.vts >= co.t
"""

# --------------------------------------------------------------------------
# Q: range join — per event, the user's orders inside [vts, vts + 30 days):
# bucketed candidates (each interval touches <= 2 buckets of width 30d),
# exact range filter after the equi-join.
# --------------------------------------------------------------------------


def q_range_orders_near_event(spark, sf):
    ev = _events_virtual(spark, sf).withColumn(
        "vday", F.datediff(F.col("vts").cast("date"), F.lit(_EPOCH).cast("date"))
    )
    orders = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).withColumn(
        "ob",
        F.floor(
            F.datediff(F.col("t").cast("date"), F.lit(_EPOCH).cast("date"))
            / _RANGE_DAYS
        ),
    )
    cand_buckets = ev.select(
        "event_id",
        "user_id",
        "vts",
        "vday",
        F.explode(
            F.array(
                F.floor(F.col("vday") / _RANGE_DAYS),
                F.floor(F.col("vday") / _RANGE_DAYS) + 1,
            )
        ).alias("b"),
    )
    matched = cand_buckets.join(
        orders,
        (F.col("user_id") == F.col("key")) & (F.col("b") == F.col("ob")),
        "left",
    ).withColumn(
        "hit",
        (F.col("t") >= F.col("vts"))
        & (
            F.col("t")
            < F.col("vts") + F.expr(f"INTERVAL {_RANGE_DAYS} DAYS")
        ),
    )
    # sum in exact decimal, render as double (exact below 2^53) — both
    # engines' pandas bridges agree on double rendering, not on Decimal
    return matched.groupBy("event_id", "user_id").agg(
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_orders_30d"),
        F.coalesce(
            F.sum(F.when(F.col("hit"), F.col("price"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("total_30d"),
    )


_SQL_RANGE = f"""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(DATE '{_EPOCH}' + CAST(event_id % {_VDAYS} AS INT) AS TIMESTAMP)
           AS vts
  FROM events
)
SELECT e.event_id, e.user_id,
       CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orders_30d,
       CAST(CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NOT NULL
                                    THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                               END),
                          0) AS DECIMAL(38,2)) AS DOUBLE) AS total_30d
FROM ev e
LEFT JOIN orders o
  ON e.user_id = o.o_custkey
 AND o.o_orderdate >= e.vts
 AND o.o_orderdate < e.vts + INTERVAL {_RANGE_DAYS} DAY
GROUP BY e.event_id, e.user_id
"""


QUERIES = {
    "asof_order_before_event": q_asof_order_before_event,
    "range_orders_near_event": q_range_orders_near_event,
}

ORACLES = {
    "asof_order_before_event": _SQL_ASOF,
    "range_orders_near_event": _SQL_RANGE,
}

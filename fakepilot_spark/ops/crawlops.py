"""Frontier-shaped operators, oracle-checkable over the driver tables.

These express the crawl engine's core relational moves (north rule,
``BASELINE.json:6,14``) — priority-queue drain via windowed top-k, URL-seen
anti-join, per-host politeness budgets, freshness scoring — over a synthetic
frontier derived arithmetically from ``documents``, so DuckDB can verify the
exact row set. The production engine (:mod:`fakepilot_spark.crawl`) runs the
same plan shapes over real frontier tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from . import load

_HOSTS = 20


def _synth_frontier(spark, sf):
    """frontier(url, host, depth, score) derived from documents: score is a
    deterministic rational of (n_chars, doc_id) — no float ambiguity."""
    docs = load(spark, sf, "documents")
    host = F.concat(
        F.lit("host"), F.pmod(F.col("doc_id"), F.lit(_HOSTS)).cast("string")
    )
    url = F.concat(
        F.lit("https://"), host, F.lit("/doc/"), F.col("doc_id").cast("string")
    )
    depth = F.pmod(F.col("doc_id"), F.lit(7)).alias("depth")
    score = F.round(
        F.pmod(F.col("n_chars"), F.lit(97)) / (1 + F.pmod(F.col("doc_id"), F.lit(7))),
        6,
    )
    return docs.select(
        F.col("doc_id"),
        url.alias("url"),
        host.alias("host"),
        depth,
        score.alias("score"),
    )


_SQL_FRONTIER_CTE = f"""
WITH frontier AS (
  SELECT doc_id,
         'https://host' || (doc_id % {_HOSTS}) || '/doc/' || doc_id AS url,
         'host' || (doc_id % {_HOSTS}) AS host,
         doc_id % 7 AS depth,
         ROUND((n_chars % 97) / (1 + doc_id % 7), 6) AS score
  FROM documents
)
"""

# --------------------------------------------------------------------------
# Q: frontier drain — top-k per host by (score desc, url asc): the
# priority-queue micro-batch step as a window rank.
# --------------------------------------------------------------------------


def q_frontier_topk_drain(spark, sf):
    frontier = _synth_frontier(spark, sf)
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    return (
        frontier.withColumn("drain_rank", F.row_number().over(w))
        .filter(F.col("drain_rank") <= 4)
        .select("host", "url", "score", "drain_rank")
    )


_SQL_FRONTIER_DRAIN = (
    _SQL_FRONTIER_CTE
    + """
SELECT host, url, score, drain_rank FROM (
  SELECT host, url, score,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY score DESC, url ASC)
           AS drain_rank
  FROM frontier
) WHERE drain_rank <= 4
"""
)

# --------------------------------------------------------------------------
# Q: URL-seen — anti-join of candidates against the seen set (the exact
# residual check behind the bloom/cuckoo pre-filters).
# --------------------------------------------------------------------------


def q_url_seen_residual(spark, sf):
    frontier = _synth_frontier(spark, sf)
    seen = frontier.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0).select("url")
    return (
        frontier.join(seen, "url", "left_anti")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_unseen"))
    )


_SQL_URL_SEEN = (
    _SQL_FRONTIER_CTE
    + """
SELECT host, COUNT(*) AS n_unseen
FROM frontier f
WHERE NOT EXISTS (
  SELECT 1 FROM frontier s WHERE s.doc_id % 3 = 0 AND s.url = f.url
)
GROUP BY host
"""
)

# --------------------------------------------------------------------------
# Q: politeness admission — per-host token budget caps admissions per epoch;
# overflow is deferred, not dropped.
# --------------------------------------------------------------------------


def q_politeness_admission(spark, sf):
    frontier = _synth_frontier(spark, sf)
    budget = 1 + F.pmod(
        F.regexp_extract("host", r"host(\d+)", 1).cast("int"), F.lit(3)
    )
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    ranked = frontier.withColumn("pos", F.row_number().over(w)).withColumn(
        "budget", budget
    )
    return ranked.groupBy("host", "budget").agg(
        F.sum(F.when(F.col("pos") <= F.col("budget"), 1).otherwise(0)).alias(
            "n_admitted"
        ),
        F.sum(F.when(F.col("pos") > F.col("budget"), 1).otherwise(0)).alias(
            "n_deferred"
        ),
    )


_SQL_POLITENESS = (
    _SQL_FRONTIER_CTE
    + """
, ranked AS (
  SELECT host,
         1 + CAST(regexp_extract(host, 'host(\\d+)', 1) AS INT) % 3 AS budget,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY score DESC, url ASC) AS pos
  FROM frontier
)
SELECT host, budget,
       CAST(SUM(CASE WHEN pos <= budget THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN pos > budget THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
FROM ranked
GROUP BY host, budget
"""
)

# --------------------------------------------------------------------------
# Q: score decay — freshness as a rational function of event age
# (1 / (1 + age_days)), exact in integer microseconds.
# --------------------------------------------------------------------------


def q_freshness_scores(spark, sf):
    ev = load(spark, sf, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    joined = ev.crossJoin(F.broadcast(max_ts))
    age_days = (F.unix_micros(F.col("max_ts").cast("timestamp")) - F.unix_micros(F.col("ts").cast("timestamp"))) / 86_400_000_000.0
    freshness = F.round(1.0 / (1.0 + age_days), 6)
    return (
        joined.select("event_type", freshness.alias("freshness"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("freshness"), 6).alias("avg_freshness"),
        )
    )


_SQL_FRESHNESS = """
WITH m AS (SELECT MAX(ts) AS max_ts FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(ROUND(1.0 / (1.0 +
           (epoch_us(max_ts) - epoch_us(ts)) / 86400000000.0), 6)), 6)
         AS avg_freshness
FROM events, m
GROUP BY event_type
"""


QUERIES = {
    "frontier_topk_drain": q_frontier_topk_drain,
    "url_seen_residual": q_url_seen_residual,
    "politeness_admission": q_politeness_admission,
    "freshness_scores": q_freshness_scores,
}

ORACLES = {
    "frontier_topk_drain": _SQL_FRONTIER_DRAIN,
    "url_seen_residual": _SQL_URL_SEEN,
    "politeness_admission": _SQL_POLITENESS,
    "freshness_scores": _SQL_FRESHNESS,
}

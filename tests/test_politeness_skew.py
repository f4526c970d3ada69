"""Mega-host skew handling in the politeness admission rank.

At 10^10 URLs one host can hold a large share of the frontier; the two-phase
rank in ``admit_per_host`` must (a) return exactly what a direct single
per-host window would, and (b) never sort a whole mega-host in one task —
the first window partitions by (host, salt).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from fakepilot_spark.crawl.frontier import with_frontier_columns
from fakepilot_spark.crawl.politeness import admit_per_host, politeness_df


def _skewed_frontier(spark, n=3000, mega_share=0.6):
    """Frontier where one host holds ``mega_share`` of all URLs."""
    n_mega = int(n * mega_share)
    urls = [f"https://mega.example.com/review/p{i}" for i in range(n_mega)] + [
        f"https://host{i % 40}.example.com/review/p{i}" for i in range(n - n_mega)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return with_frontier_columns(df, F.pmod(F.xxhash64("url"), F.lit(5)), epoch=0)


def test_two_phase_rank_equals_single_window(spark):
    frontier = _skewed_frontier(spark).cache()
    politeness = politeness_df(spark, {"mega.example.com": 7})
    admitted = admit_per_host(frontier, politeness, default_budget=3)
    got = {r["url"] for r in admitted.collect()}

    # reference: direct single per-host window (the naive formulation)
    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    ref = (
        frontier.join(F.broadcast(politeness), "host", "left")
        .withColumn("budget", F.coalesce(F.col("budget"), F.lit(3)))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("budget"))
    )
    want = {r["url"] for r in ref.collect()}
    assert got == want
    # the mega host respected its budget
    assert sum(1 for u in got if u.startswith("https://mega.")) == 7
    frontier.unpersist()


def test_mega_host_never_sorted_in_one_task(spark):
    frontier = _skewed_frontier(spark)
    politeness = politeness_df(spark, {})
    plan = admit_per_host(frontier, politeness, default_budget=2)._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "Window ([" in ln]
    assert len(windows) == 2, plan
    # first (inner) window executed is the salt-local prune; in the plan tree
    # the host-only window is the parent, so exactly one of the two Window
    # nodes must partition by (host, salt)
    assert any("salt" in w for w in windows), plan

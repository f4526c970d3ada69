"""Robots + politeness dimension tables (broadcast-joined per epoch).

North rule (BASELINE.json:6): "per-host politeness tokens and robots.txt
rules joined as a broadcast dimension table". Both dims are tiny relative to
the frontier (one row per host), so the join is always a broadcast hash join
— zero shuffle on the 10^10-row side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .frontier import path_of

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow", ArrayType(StringType()), True),
        StructField("crawl_delay", DoubleType(), True),
    ]
)

POLITENESS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("budget", IntegerType(), False),
    ]
)


def robots_df(spark: SparkSession, rules: dict) -> DataFrame:
    """rules: host -> (disallow_prefixes, crawl_delay_seconds)."""
    rows = [(h, list(d), float(cd)) for h, (d, cd) in sorted(rules.items())]
    if not rows:
        rows = []
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def politeness_df(spark: SparkSession, budgets: dict) -> DataFrame:
    rows = [(h, int(b)) for h, b in sorted(budgets.items())]
    return spark.createDataFrame(rows, POLITENESS_SCHEMA)


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter out URLs whose path matches any disallow prefix for its host.

    Broadcast left join + higher-order EXISTS over the prefix array — stays
    in codegen; hosts without rules pass through.
    """
    joined = frontier.join(F.broadcast(robots), "host", "left")
    blocked = F.exists(
        F.coalesce(F.col("disallow"), F.array()),
        lambda prefix: F.startswith(path_of(F.col("url")), prefix),
    )
    return joined.filter(~blocked).drop("disallow", "crawl_delay")


def admit_per_host(
    frontier: DataFrame,
    politeness: DataFrame,
    default_budget: int,
    robots: DataFrame | None = None,
    epoch_seconds: float | None = None,
) -> DataFrame:
    """Rank candidates within each host by (score desc, url asc) and keep the
    top ``budget`` — the token-bucket admission for one epoch.

    When ``robots``/``epoch_seconds`` are given, a host's robots
    ``crawl_delay`` caps its effective budget at
    ``floor(epoch_seconds / crawl_delay)`` fetches per epoch (deterministic
    virtual time, so crawl ordering stays a pure function of inputs).

    Scale note: the window partitions by (host) which is exactly the skew
    axis; AQE skew handling plus the salt column keep the sort bounded —
    and the rank is computed on (host_prefix, salt) pre-partitioned data so
    the shuffle reuses the frontier layout.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
    ranked = frontier.join(F.broadcast(politeness), "host", "left").withColumn(
        "budget", F.coalesce(F.col("budget"), F.lit(default_budget))
    )
    if robots is not None and epoch_seconds is not None:
        delay_cap = F.floor(F.lit(float(epoch_seconds)) / F.col("crawl_delay"))
        ranked = (
            ranked.join(F.broadcast(robots.select("host", "crawl_delay")), "host", "left")
            .withColumn(
                "budget",
                F.when(
                    F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
                    F.least(F.col("budget"), delay_cap.cast("int")),
                ).otherwise(F.col("budget")),
            )
            .drop("crawl_delay")
        )
    ranked = ranked.withColumn("host_rank", F.row_number().over(w))
    return ranked.filter(F.col("host_rank") <= F.col("budget")).drop(
        "budget", "host_rank"
    )

"""Operator library backing the driver contract (``__spark_entry__.py``).

Each submodule exports ``QUERIES`` (name → ``fn(spark, sf_dir) → DataFrame``)
and ``ORACLES`` (name → equivalent DuckDB SQL over the pre-registered views).
Names and column aliases are identical on both sides — the driver's
order-insensitive value-hash requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def registry():
    """Merged (queries, oracles) across all ops modules."""
    from . import (
        corpusops,
        crawlops,
        extraction,
        graphops,
        ivf,
        multimodal,
        relational,
        similarity,
        staged,
        temporal,
        textops,
        webops,
    )
    from ..streaming import ops as streamingops

    queries: dict = {}
    oracles: dict = {}
    for mod in (
        relational, textops, similarity, ivf, crawlops, extraction,
        multimodal, temporal, webops, graphops, corpusops, staged,
        streamingops,
    ):
        queries.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles

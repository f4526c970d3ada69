"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: synthesize Trustpilot-style pages from the
sf0.001 ``documents`` table (native exprs), run the vectorized extraction
pipeline, return the extracted companies DataFrame.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (relational, text/dedup, similarity, frontier, extraction,
streaming); EVERY query has a DuckDB oracle: SQL-expressible operators
arithmetically over the pre-registered views, the two real-page extraction
queries via VALUES literals computed through the pure-Python parse path
(itself byte-identity-gated against the reference's valid_data.json in
tests/test_golden_extraction.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic-corpus extraction at sf0.001 (17-fixture byte-
    identity gate lives in tests/; this exercises the same UDF pipeline)."""
    from fakepilot_spark.ops.extraction import q_extract_synth_companies

    return q_extract_synth_companies(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fakepilot_spark.ops import registry

    qs, _ = registry()
    return qs


def oracle_sql() -> dict[str, str]:
    from fakepilot_spark.ops import registry

    _, oracles = registry()
    return oracles

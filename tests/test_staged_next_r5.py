"""Staged round-5 operators (ops/staged_next.py): DuckDB value parity at
the driver's bit-strict float repr, the split-stability property, and the
plan shapes the module docstring claims.

Registered at round-5 start, inside the driver's 50-entry snapshot window
(VERDICT.md round 3 finding 1; ops/__init__.py:_SNAPSHOT_ORDER).
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

NAMES = ["doc_bm25_topk", "doc_split_assign", "doc_dsir_weight"]


def _canon(df):
    """The driver's strict comparison: sorted columns, repr-exact floats,
    order-insensitive row multiset (scripts/check_queries.py --strict)."""
    cols = sorted(df.columns)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        return str(v)

    rows = sorted(
        tuple(cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def _ddb(sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def ddb():
    return _ddb(SF)


@pytest.mark.parametrize("name", NAMES)
def test_duckdb_parity_strict(spark, ddb, name):
    from fakepilot_spark.ops import staged_next

    got = _canon(staged_next.QUERIES[name](spark, SF).toPandas())
    want = _canon(ddb.execute(staged_next.ORACLES[name]).df())
    assert got[0] == want[0], f"{name}: column names diverge"
    assert len(got[1]) == len(want[1]), f"{name}: row counts diverge"
    assert got[1] == want[1], f"{name}: value multiset diverges"


@pytest.mark.parametrize("name", NAMES)
def test_duckdb_parity_strict_sf001(spark, name):
    """Same bit-strict gate at the driver's own scale factor (sf0.01)."""
    from fakepilot_spark.ops import staged_next

    con = _ddb(SF_MID)
    got = _canon(staged_next.QUERIES[name](spark, SF_MID).toPandas())
    want = _canon(con.execute(staged_next.ORACLES[name]).df())
    assert got == want, f"{name}: sf0.01 parity diverges"


def test_bm25_topk_properties(spark):
    """k rows, scores strictly ordered (desc, doc_id tiebreak), all terms
    from the fixed query actually matched somewhere."""
    from fakepilot_spark.ops.staged_next import _BM25_TOPK, q_doc_bm25_topk

    pdf = q_doc_bm25_topk(spark, SF).toPandas()
    assert len(pdf) == _BM25_TOPK
    keys = list(zip(-pdf["bm25"], pdf["doc_id"]))
    assert keys == sorted(keys)
    assert (pdf["bm25"] > 0).all()
    assert (pdf["n_terms"] >= 1).all() and (pdf["n_terms"] <= 3).all()


def test_split_assign_stable_and_complete(spark):
    """The split is a deterministic function of doc_id: per-(source, split)
    counts cover every document exactly once, and the train share is ~96%."""
    from fakepilot_spark.ops.staged_next import q_doc_split_assign
    from fakepilot_spark.ops import load

    pdf = q_doc_split_assign(spark, SF).toPandas()
    total = load(spark, SF, "documents").count()
    assert int(pdf["n_docs"].sum()) == total
    by_split = pdf.groupby("split")["n_docs"].sum()
    assert set(by_split.index) <= {"train", "val", "test"}
    assert by_split["train"] / total > 0.85


def test_dsir_weight_covers_corpus(spark):
    """One weight per document; token counts reconcile with the corpus."""
    from fakepilot_spark.ops import load
    from fakepilot_spark.ops.staged_next import q_doc_dsir_weight

    import pyspark.sql.functions as F

    pdf = q_doc_dsir_weight(spark, SF).toPandas()
    docs = load(spark, SF, "documents")
    assert len(pdf) == docs.count()
    n_toks = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()["n"]
    assert int(pdf["n_toks"].sum()) == n_toks


@pytest.mark.parametrize("name", NAMES)
def test_staged_next_plans_native(spark, name):
    """No Python rows, no cartesian joins, no unpartitioned window in any
    staged plan (the invariants test_plan_shapes pins for registry
    queries)."""
    from fakepilot_spark.ops import staged_next

    plan = staged_next.QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # broadcast scalar cross-joins are fine; a nested loop over two big
    # sides is not
    assert "Window" not in plan  # none of the three uses any window at all


def test_staged_next_module_registered():
    """Round-5 start: the staged queries entered the driver registry (with
    oracles), inside the driver's 50-entry snapshot window."""
    import __spark_entry__ as e

    qs = list(e.queries())
    oracles = e.oracle_sql()
    for name in NAMES:
        assert name in qs
        assert name in oracles
        assert qs.index(name) < 50

"""Staged round-5 operators (ops/staged.py): DuckDB value parity at the
driver's bit-strict float repr, the PII schedule/self-evidencing properties,
and the plan shapes the module docstring claims.

Registered late in round 4; in round 5 they sit inside the driver's
50-entry snapshot window (ops/__init__.py:_SNAPSHOT_ORDER).
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", ["tfidf_top_terms", "doc_pii_scrub", "source_mix_weights"]
)
def test_duckdb_parity_strict(spark, ddb, name):
    from fakepilot_spark.ops import staged

    got = _canon(staged.QUERIES[name](spark, SF).toPandas())
    want = _canon(ddb.execute(staged.ORACLES[name]).df())
    assert got[0] == want[0], f"{name}: column names diverge"
    assert len(got[1]) == len(want[1]), f"{name}: row counts diverge"
    assert got[1] == want[1], f"{name}: value multiset diverges"


@pytest.mark.parametrize(
    "name", ["tfidf_top_terms", "doc_pii_scrub", "source_mix_weights"]
)
def test_duckdb_parity_strict_sf001(spark, name):
    """Same bit-strict gate at sf0.01 — the SF the driver checks at (the
    module docstring claims parity at both SFs; round-4 ADVICE caught that
    only sf0.001 was pinned here)."""
    from fakepilot_spark.ops import staged

    sf_mid = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_mid}/{t}.parquet')"
        )
    got = _canon(staged.QUERIES[name](spark, sf_mid).toPandas())
    want = _canon(con.execute(staged.ORACLES[name]).df())
    assert got == want


def test_pii_schedule_and_self_evidence(spark):
    """Counts follow the doc_id modulo schedule exactly and the scrub leaves
    zero residual matches — the operator proves its own redaction."""
    from fakepilot_spark.ops.staged import q_doc_pii_scrub

    rows = q_doc_pii_scrub(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        d = r["doc_id"]
        assert r["n_emails"] == (1 if d % 3 == 0 else 0)
        assert r["n_phones"] == (1 if d % 5 == 0 else 0)
        assert r["n_ips"] == (1 if d % 7 == 0 else 0)
        assert r["n_residual"] == 0
        assert re.fullmatch(r"[0-9a-f]{32}", r["scrub_hash"])


def test_tfidf_ranks_and_idf_floor(spark):
    """Per-doc ranks are contiguous from 1 (≤ k), scores non-increasing
    within a doc, and a corpus-universal token (doc_freq == n_docs) scores
    exactly 0 — ln(1) has no libm ambiguity."""
    from fakepilot_spark.ops.staged import _TFIDF_K, q_tfidf_top_terms

    rows = q_tfidf_top_terms(spark, SF).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert per_doc
    n_docs = 500  # sf0.001 documents row count (TESTDATA.md)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TFIDF_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            if r["doc_freq"] == n_docs:
                assert r["score"] == 0.0


def test_staged_plan_shapes(spark):
    """No Python in either plan; the PII profile is a single shuffle-free
    scan→project (no Exchange), tfidf broadcasts the 1-row corpus count."""
    from fakepilot_spark.ops.staged import q_doc_pii_scrub, q_tfidf_top_terms

    pii_plan = q_doc_pii_scrub(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in pii_plan and "ArrowEvalPython" not in pii_plan
    assert "Exchange" not in pii_plan, "PII profile must not shuffle"

    tfidf_plan = (
        q_tfidf_top_terms(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in tfidf_plan and "ArrowEvalPython" not in tfidf_plan
    assert "BroadcastExchange" in tfidf_plan or "BroadcastNestedLoopJoin" in tfidf_plan, (
        "the 1-row corpus count must broadcast, not shuffle"
    )


def test_source_mix_temperature_flattens(spark):
    """Weights sum to 1 and alpha=0.5 compresses the mix: every source's
    weight/share ratio moves toward 1 relative to raw shares (big sources
    down-weighted, small ones up-weighted)."""
    from fakepilot_spark.ops.staged import q_source_mix_weights

    rows = q_source_mix_weights(spark, SF).collect()
    assert len(rows) >= 2
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_docs"] for r in rows) == 500
    # testdata sources are uniform (weight == share there); the invariant is
    # directional: sqrt-temperature never amplifies a big source or shrinks
    # a small one, and is the identity exactly on a uniform mix.
    big = max(rows, key=lambda r: r["share"])
    small = min(rows, key=lambda r: r["share"])
    assert big["weight"] <= big["share"]
    assert small["weight"] >= small["share"]
    if big["share"] > small["share"]:
        assert big["weight"] < big["share"]
        assert small["weight"] > small["share"]


def test_staged_module_registered():
    """Flipped at registration time (early this round, per the freeze
    discipline): the staged queries are now IN the driver registry, with
    matching oracles."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    for name in ("tfidf_top_terms", "doc_pii_scrub", "source_mix_weights"):
        assert name in qs
        assert name in os_

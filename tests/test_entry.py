"""Driver-contract smoke: entry() runs, registry is consistent.

Full value-level oracle checking lives in scripts/check_queries.py (and the
driver's own DuckDB gate); this keeps the contract wiring itself under
pytest.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_registry_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # rows-only (oracle-less) entries are the documented sketch/extraction set
    # every query is oracle-gated: SQL-expressible ops arithmetically, the
    # real-page extraction queries via VALUES literals computed through the
    # independently golden-gated pure-Python path
    assert set(oracles) == set(qs)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(600).collect()
    assert len(rows) == 500  # documents at sf0.001
    cols = set(df.columns)
    assert {"doc_id", "url", "name", "nreviews", "score", "email"} <= cols


def test_fixture_queries_rows(spark):
    qs = entrymod.queries()
    companies = qs["extract_fixture_companies"](spark, "/root/testdata/sf0.001")
    assert companies.count() == 17
    reviews = qs["extract_fixture_reviews"](spark, "/root/testdata/sf0.001")
    assert reviews.count() > 100

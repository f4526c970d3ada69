"""bench.py's query list must stay a subset of the driver registry — a
renamed or mistyped entry would otherwise only surface when the round
driver's single-shot bench run crashes."""

from __future__ import annotations


def test_bench_queries_are_registered():
    import bench
    import __spark_entry__ as e

    qs = e.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, f"bench names not in registry: {missing}"
    # no duplicates (each timed once)
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))

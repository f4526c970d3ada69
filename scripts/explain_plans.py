"""Dump formatted physical plans for the headline queries — the plan-quality
review loop (pushed filters, broadcast joins, codegen spans).

Usage: python scripts/explain_plans.py [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHECKS = {
    "pricing_summary": ["PushedFilters", "HashAggregate"],
    "nation_revenue": ["BroadcastHashJoin"],
    "segment_order_revenue": ["BroadcastHashJoin"],
    "window_top_orders_per_customer": ["Window"],
    "doc_exact_dedup": ["HashAggregate"],
    "embedding_cosine_topk": ["TakeOrderedAndProject", "BroadcastNestedLoopJoin"],
    "frontier_topk_drain": ["Window"],
    # sketch dedups: one partial-aggregated groupBy builds signatures; pair
    # expansion is generate-over-groups, never a self-join of the pipeline
    "minhash_lsh_pairs": ["HashAggregate", "Generate"],
    "simhash_near_pairs": ["HashAggregate", "Generate"],
    # as-of = union + single window per key (no nested-loop anywhere)
    "asof_order_before_event": ["Window", "Union"],
    # range join = bucketed equi-join: must be a hash join, not BNLJ
    "range_orders_near_event": ["Join"],
}

# plans that must NOT contain these fragments (scale killers)
ANTI_CHECKS = {
    "asof_order_before_event": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    "range_orders_near_event": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    "minhash_lsh_pairs": ["SortMergeJoin", "BroadcastHashJoin"],
    "simhash_near_pairs": ["SortMergeJoin", "BroadcastHashJoin"],
}


def main() -> None:
    import __spark_entry__ as e
    from fakepilot_spark.session import get_spark

    spark = get_spark(app_name="explain", cores=4, shuffle_partitions=8)
    queries, _ = e.queries(), None
    queries = e.queries()
    names = sys.argv[1:] or list(CHECKS)
    sf = "/root/testdata/sf0.001"
    failures = []
    for name in names:
        df = queries[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"{'='*20} {name} {'='*20}")
        print(plan[:4000])
        for want in CHECKS.get(name, []):
            ok = want in plan
            print(f"  [{'ok' if ok else 'MISSING'}] expects {want}")
            if not ok:
                failures.append((name, want))
        for bad in ANTI_CHECKS.get(name, []):
            ok = bad not in plan
            print(f"  [{'ok' if ok else 'PRESENT'}] forbids {bad}")
            if not ok:
                failures.append((name, f"forbidden {bad}"))
    if failures:
        print("PLAN CHECK FAILURES:", failures)
        raise SystemExit(1)
    print("all plan checks passed")


if __name__ == "__main__":
    main()

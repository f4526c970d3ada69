"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given SF dir, compares row count, column names, and an order-insensitive
canonicalized value multiset. Exit code != 0 on any mismatch.

Usage: python scripts/check_queries.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


STRICT = False  # --strict: exact float repr, emulating the driver's value hash


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if STRICT:
            # shortest round-trip repr: equal reprs => bit-equal doubles
            return repr(v)
        # canonical 12-significant-digit rendering absorbs last-ulp noise
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_frame(df) -> tuple:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return tuple(cols), rows


def main() -> int:
    global STRICT
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    only = set(argv[1:])  # any number of query names; empty = all

    import __spark_entry__ as e
    from fakepilot_spark.session import get_spark

    spark = get_spark(app_name="check-queries", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s_cols, s_rows = canon_frame(spark_pdf)
        d_cols, d_rows = canon_frame(duck_pdf)
        if s_cols != d_cols:
            failures.append((name, f"columns {s_cols} vs {d_cols}"))
            print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount {len(s_rows)} vs {len(d_rows)}"))
            print(f"FAIL  {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
        elif s_rows != d_rows:
            diff = [
                (a, b) for a, b in zip(s_rows, d_rows) if a != b
            ][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL  {name}: values differ; first diffs:")
            for a, b in diff:
                print(f"      spark={a}")
                print(f"      duck ={b}")
        else:
            print(f"OK    {name}: {len(s_rows)} rows")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

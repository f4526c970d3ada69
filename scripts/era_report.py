"""Host-weather era report over the scaling run history.

The sandbox VM's effective speed shifts on multi-hour timescales (noisy
neighbours), which moves the crawl's measured N→4N efficiency for reasons
unrelated to the plan.  This script derives the evidence table from
BENCH/runs.jsonl instead of prose claims: per time bucket, the BEST-window
8-core and 2-core CPU ms/URL (best = the era's floor, immune to one-off
stalls) and their ratio — per-core cost inflation that the same binary on
the same input pays only when 8 workers run concurrently.  A flat 2-core
floor with a rising 8-core floor is machine contention (shared memory bus),
not a plan property: on a real 4N-executor cluster each executor brings its
own socket.

Prints markdown; consumed by hand into BENCH/BASELINE.md's addendum.

Usage: python scripts/era_report.py [bucket_hours]
"""

from __future__ import annotations

import datetime
import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    bucket_h = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    rows = []
    for line in (REPO / "BENCH" / "runs.jsonl").read_text().splitlines():
        try:
            rows.append(json.loads(line))
        except ValueError:
            continue
    buckets: dict[int, dict[int, list]] = defaultdict(lambda: defaultdict(list))
    for r in rows:
        if r.get("pages") == 16000 and r.get("pair_id") and r.get("cpu_per_url_ms"):
            b = int(r["ts"] // (bucket_h * 3600))
            buckets[b][r["cpus"]].append(r)

    print(
        "| window (UTC) | runs | best 2c ms/URL | best 8c ms/URL | "
        "8c/2c floor ratio | best 8c URLs/s |"
    )
    print("|---|---|---|---|---|---|")
    for b in sorted(buckets):
        d = buckets[b]
        if 8 not in d:
            continue
        t0 = datetime.datetime.utcfromtimestamp(b * bucket_h * 3600)
        t1 = t0 + datetime.timedelta(hours=bucket_h)
        best8 = min(r["cpu_per_url_ms"] for r in d[8])
        best8u = max(r["urls_per_sec"] for r in d[8])
        best2 = min((r["cpu_per_url_ms"] for r in d.get(2, [])), default=None)
        ratio = round(best8 / best2, 2) if best2 else "—"
        n = sum(len(v) for v in d.values())
        print(
            f"| {t0:%m-%d %H:%M}–{t1:%H:%M} | {n} | {best2 or '—'} | "
            f"{best8} | {ratio} | {best8u} |"
        )


if __name__ == "__main__":
    main()

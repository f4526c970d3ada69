"""Memory-bandwidth scaling probe — the evidence the CPU burn can't give.

``scaling_bench.py``'s pure-Python burn is cache-resident: it shows whether
the hypervisor grants N runnable vCPUs, but NOT whether N concurrent
memory-heavy workers share one socket's DRAM bandwidth.  Page extraction is
memory-bound (each task streams ~270 KB pages, builds flat DOM arrays, and
moves Arrow batches), so when a noisy neighbour saturates the host's memory
bus the crawl's per-URL CPU inflates at 8 cores while a 2-core run — and the
cache-resident burn — stay fast.  This probe measures that directly:
aggregate streaming-sum bandwidth over per-process 256 MiB float64 arrays at
P = 1, 2, 8, 32 processes, reported as GB/s and as N→4N scaling efficiency.

Appends one JSON line per invocation to BENCH/membw.jsonl and prints a
markdown row, so repeated invocations build an era record next to
runs.jsonl.  Pure diagnostic: never read by scaling_bench.py, never part of
the measurement path.

Usage: python scripts/membw_probe.py [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
ARR_MB = 256
LEVELS = (1, 2, 8, 32)


def _stream(arr_mb: int) -> float:
    """Touch ``arr_mb`` MiB sequentially (numpy sum = pure read stream);
    returns bytes moved."""
    a = np.ones(arr_mb * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.time()
    s = 0.0
    reps = 4
    for _ in range(reps):
        s += float(a.sum())  # reads the whole array from DRAM each pass
    wall = time.time() - t0
    assert s > 0
    return reps * a.nbytes / wall


def measure(reps: int = 3) -> dict:
    best: dict[int, float] = {}
    for _ in range(reps):
        for procs in LEVELS:
            with mp.Pool(procs) as pool:
                t0 = time.time()
                per_proc = pool.map(_stream, [ARR_MB] * procs)
                wall = time.time() - t0
            # aggregate = total bytes / wall (pool overhead included; arrays
            # are allocated inside the window — consistent across levels)
            agg = procs * 4 * ARR_MB * 1024 * 1024 / wall
            best[procs] = max(best.get(procs, 0.0), agg)
            del per_proc
    return best


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best = measure(reps)
    rec = {
        "ts": time.time(),
        "arr_mb": ARR_MB,
        "gbps": {str(k): round(v / 1e9, 2) for k, v in best.items()},
        "eff_2to8": round((best[8] / best[2]) / 4, 3),
        "eff_8to32": round((best[32] / best[8]) / 4, 3),
    }
    out = REPO / "BENCH" / "membw.jsonl"
    out.parent.mkdir(exist_ok=True)
    with out.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    print(
        f"| {time.strftime('%m-%d %H:%M', time.gmtime(rec['ts']))} "
        f"| {rec['gbps']['1']} | {rec['gbps']['2']} | {rec['gbps']['8']} "
        f"| {rec['gbps']['32']} | {rec['eff_2to8']} | {rec['eff_8to32']} |"
    )


if __name__ == "__main__":
    main()

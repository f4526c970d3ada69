"""Run ONLY the crawl benchmark portion of bench.py at $SPARK_GRAFT_CPUS.

Emits, as one `CRAWL {json}` line:

* ``wall_sec`` / ``urls_per_sec`` — the throughput measurement;
* ``cpu_sec`` / ``cpu_per_url_ms`` / ``utilization`` — OS-accounted CPU of
  the whole Spark process tree (JVM + Python workers, RUSAGE_CHILDREN) over
  the crawl. Utilization ≈ 1 at a given core count means the plan kept every
  core busy — scaling evidence that is robust to this sandbox's fluctuating
  host speed (a capped/slowed host lowers urls/sec but cannot fake
  utilization);
* ``probe_mops`` — single-core host-speed samples taken every ~5 s DURING
  the run by a ~5%-duty-cycle thread (this VM's available CPU fluctuates
  2-4× on minute timescales; the samples stamp the run with the host
  weather it actually saw).

Usage: SPARK_GRAFT_CRAWL_PAGES=N python scripts/crawl_only.py CPUS
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from fakepilot_spark.session import get_spark  # noqa: E402


class HostProbe(threading.Thread):
    """Samples single-core speed (Mops) every ~5 s with 0.2-s burns."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.samples: list = []
        self._stop = threading.Event()

    def run(self) -> None:
        # ~1% duty cycle: the probe now runs INSIDE the run's pinned core
        # set (scaling_bench pins each pair run), so it must stay tiny at
        # local[2]
        n = 1_000_000
        while not self._stop.is_set():
            x = 0
            t0 = time.time()
            for i in range(n):
                x = (x * 48271 + i) % 2147483647
            self.samples.append(round(n / (time.time() - t0) / 1e6, 1))
            self._stop.wait(10.0)

    def stop(self) -> list:
        self._stop.set()
        return self.samples


def _solo_probe_mops() -> float:
    """Single-core burn with no Spark running — unpolluted host-speed read."""
    n = 10_000_000
    x = 0
    t0 = time.time()
    for i in range(n):
        x = (x * 48271 + i) % 2147483647
    return round(n / (time.time() - t0) / 1e6, 1)


bench.CPUS = CPUS
probe_before = _solo_probe_mops()
spark = get_spark(
    app_name=f"crawl-only-{CPUS}", cores=CPUS,
    shuffle_partitions=max(2 * CPUS, 16),
)
probe = HostProbe()
probe.start()
# crawl_bench returns a list of per-run dicts (N-run median rework);
# this script takes exactly one run per invocation
out = bench.crawl_bench(spark, float(os.environ.get("SPARK_GRAFT_SF", "0.1")))[0]
samples = probe.stop()
spark.stop()
time.sleep(0.5)

out["cpus"] = CPUS
# gate on the solo probes (in-run samples compete with the workload when
# every core is granted to Spark, so they are a trace, not a gate)
out["probe_mops"] = [probe_before, _solo_probe_mops()]
out["probe_trace"] = samples
print("CRAWL " + json.dumps(out))

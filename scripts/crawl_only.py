"""Run ONLY the crawl benchmark portion of bench.py at $SPARK_GRAFT_CPUS.
Usage: SPARK_GRAFT_CRAWL_PAGES=N python scripts/crawl_only.py CPUS
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(sys.argv[1])
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from fakepilot_spark.session import get_spark  # noqa: E402

bench.CPUS = CPUS
spark = get_spark(app_name=f"crawl-only-{CPUS}", cores=CPUS, shuffle_partitions=max(CPUS, 32))
out = bench.crawl_bench(spark, float(os.environ.get("SPARK_GRAFT_SF", "0.1")))
out["cpus"] = CPUS
print("CRAWL " + json.dumps(out))
spark.stop()

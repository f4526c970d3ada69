"""Per-step crawl-epoch timings at one parallelism level.
Usage: python scripts/profile_crawl.py CPUS N_PAGES
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)

from fakepilot_spark.corpus import synth_pages  # noqa: E402
from fakepilot_spark.crawl.engine import CrawlConfig, CrawlEngine  # noqa: E402
from fakepilot_spark.extract.udfs import make_page_extractor  # noqa: E402
from fakepilot_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"crawlprof-{CPUS}", cores=CPUS, shuffle_partitions=max(CPUS, 32))

pages = synth_pages(
    spark, N, partitions=CPUS * 6, hosts=101, skew_mega_host=True,
    reviews_per_page=25, links_per_page=4, filler_kb=250,
)

warm = make_page_extractor(nreviews=1, with_reviews=False, strict=False)
(
    synth_pages(spark, CPUS * 8, partitions=CPUS * 2)
    .select(warm("html").alias("x"))
    .write.format("noop").mode("overwrite").save()
)

seeds = [r["url"] for r in pages.select("url").where("page_id % 3 = 1").collect()]
ckpt = tempfile.mkdtemp(prefix="prof_crawl_")
cfg = CrawlConfig(
    checkpoint_dir=ckpt,
    seeds=seeds,
    max_epochs=2,
    global_batch=N,
    default_budget=N,
    nreviews=20,
    use_sketches=True,
    bloom_capacity=max(N * 4, 1 << 18),
    cuckoo_partitions=32,
    cuckoo_capacity_per_partition=max(N // 4, 1 << 14),
)
engine = CrawlEngine(spark, pages, cfg)
t0 = time.time()
summary = engine.run()
wall = time.time() - t0
shutil.rmtree(ckpt, ignore_errors=True)
print("RESULT " + json.dumps({
    "cpus": CPUS, "pages": N, "wall": round(wall, 2),
    "fetched": summary["total_fetched"],
    "urls_per_sec": round(summary["total_fetched"] / wall, 1),
    "epochs": [
        {"epoch": s["epoch"], "wall": s["wall_sec"], "steps": s["steps"],
         "batch": s["batch"], "new": s["new_urls"]}
        for s in summary["epochs"]
    ],
}))
spark.stop()

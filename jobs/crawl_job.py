"""spark-submit entry point for the crawl engine.

Cluster usage (north rule packaging, BASELINE.json:6,14):

    python scripts/build_dist.py   # -> dist/fakepilot_spark.zip
    spark-submit --py-files dist/fakepilot_spark.zip jobs/crawl_job.py \
        --pages  s3://bucket/pages_table \
        --checkpoint s3://bucket/crawl_ckpt \
        --seeds-file seeds.txt --epochs 10 --global-batch 5000000

Local smoke (synthetic corpus):

    python jobs/crawl_job.py --synthetic 5000 --checkpoint /tmp/ckpt --epochs 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic pages instead")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--seeds-file", help="one URL per line")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--global-batch", type=int, default=100_000)
    ap.add_argument("--default-budget", type=int, default=16)
    ap.add_argument("--nreviews", type=int, default=20)
    ap.add_argument("--no-sketches", action="store_true")
    ap.add_argument(
        "--pages-buckets", type=int, default=0,
        help="pages table is partitioned by pbucket=pmod(xxhash64(url), B): "
             "prune each epoch's fetch scan to the batch's buckets",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from fakepilot_spark.crawl.engine import CrawlConfig, CrawlEngine
    from fakepilot_spark.session import get_spark
    from fakepilot_spark.sources import read_pages

    spark = get_spark(app_name="fakepilot-crawl")

    if args.synthetic:
        from fakepilot_spark.corpus import synth_pages

        pages = synth_pages(spark, args.synthetic)
        seeds = [r["url"] for r in pages.select("url").limit(32).collect()]
    else:
        pages = read_pages(spark, args.pages)
        seeds = Path(args.seeds_file).read_text().split()

    cfg = CrawlConfig(
        checkpoint_dir=args.checkpoint,
        seeds=seeds,
        max_epochs=args.epochs,
        global_batch=args.global_batch,
        default_budget=args.default_budget,
        nreviews=args.nreviews,
        use_sketches=not args.no_sketches,
        pages_path=args.pages if args.pages_buckets else None,
        pages_buckets=args.pages_buckets or None,
    )
    summary = CrawlEngine(spark, pages, cfg).run()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""Isolate where 8->32 scaling loss comes from: JVM synth-gen vs Arrow
transfer vs Python parse. Usage: python scripts/profile_scaling.py CPUS N_PAGES
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)

from fakepilot_spark.corpus import synth_pages  # noqa: E402
from fakepilot_spark.extract.udfs import make_page_extractor  # noqa: E402
from fakepilot_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"profile-{CPUS}", cores=CPUS, shuffle_partitions=CPUS)


def pages():
    return synth_pages(
        spark, N, partitions=CPUS * 6, hosts=101, skew_mega_host=True,
        reviews_per_page=25, links_per_page=4, filler_kb=250,
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, warm=1, reps=2):
    for _ in range(warm):
        fn()
    best = min(_one(fn) for _ in range(reps))
    print(f"{name:28s} {best:8.3f}s  ({N / best:8.1f} pages/s)", flush=True)
    return best


def _one(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


import pandas as pd  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def blob_len(html: pd.Series) -> pd.Series:
    return html.map(len)


extract = make_page_extractor(nreviews=20, with_reviews=True, with_links=True, strict=False)

timed("gen_only(noop)", lambda: force(pages().select("html")))
timed("gen+arrow_len(pyudf)", lambda: force(pages().select(blob_len("html").alias("n"))))
timed("gen+extract", lambda: force(pages().select(extract("html").alias("x"))))
spark.stop()

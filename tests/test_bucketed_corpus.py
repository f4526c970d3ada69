"""Bucketed-corpus fetch pruning: with the pages table committed partitioned
by ``pbucket = pmod(xxhash64(url), B)``, each epoch's fetch scan must read
only the buckets its batch can hit — and the crawl output must be identical
to the unbucketed run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fakepilot_spark.corpus import synth_pages
from fakepilot_spark.crawl.engine import CrawlConfig, CrawlEngine

N_PAGES = 60
SEEDS = [
    "https://host0.example.com/review/c0",
    "https://host1.example.com/review/c1",
]
BUCKETS = 16


@pytest.fixture(scope="module")
def bucketed_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed_pages")
    df = synth_pages(
        spark, N_PAGES, partitions=4, hosts=5, skew_mega_host=False,
        reviews_per_page=2, links_per_page=3,
    )
    (
        df.withColumn(
            "pbucket", F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int")
        )
        .repartition(BUCKETS, "pbucket")
        .write.mode("overwrite")
        .partitionBy("pbucket")
        .parquet(str(d))
    )
    return str(d)


def _cfg(tmp_path, **over):
    base = dict(
        checkpoint_dir=str(tmp_path),
        seeds=SEEDS,
        max_epochs=3,
        global_batch=10,
        default_budget=3,
        nreviews=2,
        use_sketches=False,
    )
    base.update(over)
    return CrawlConfig(**base)


def test_bucketed_fetch_matches_unbucketed(spark, bucketed_dir, tmp_path_factory):
    pages = spark.read.parquet(bucketed_dir)
    plain = CrawlEngine(
        spark, pages, _cfg(tmp_path_factory.mktemp("plain"))
    )
    plain.run()
    bucketed = CrawlEngine(
        spark,
        pages,
        _cfg(
            tmp_path_factory.mktemp("bucketed"),
            pages_path=bucketed_dir,
            pages_buckets=BUCKETS,
        ),
    )
    bucketed.run()
    assert bucketed.fetched_urls_in_order() == plain.fetched_urls_in_order()


def test_fetch_scan_carries_partition_filter(spark, bucketed_dir, tmp_path_factory):
    engine = CrawlEngine(
        spark,
        spark.read.parquet(bucketed_dir),
        _cfg(
            tmp_path_factory.mktemp("prune"),
            pages_path=bucketed_dir,
            pages_buckets=BUCKETS,
        ),
    )
    batch = spark.createDataFrame([(u,) for u in SEEDS], "url string")
    corpus = engine._fetch_corpus(batch)
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pbucket" in plan, plan
    # two seed urls hit at most 2 of 16 bucket directories
    hit = {r["pbucket"] for r in
           spark.read.parquet(bucketed_dir)
           .filter(F.col("url").isin(SEEDS)).select("pbucket").collect()}
    scanned = {
        r["pbucket"]
        for r in engine._fetch_corpus(batch)
        .select(F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int").alias("pbucket"))
        .distinct()
        .collect()
    }
    assert scanned <= set(range(BUCKETS))
    assert len(scanned) <= 2 and hit <= scanned

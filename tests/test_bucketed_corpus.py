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


def test_wrong_pages_buckets_refused(spark, bucketed_dir, tmp_path_factory):
    """A pages_buckets that doesn't match the materialized layout must fail
    LOUDLY at engine init — the wrong modulus would silently drop pages from
    the fetch join (round-2 ADVICE, engine.py)."""
    with pytest.raises(ValueError, match="pages_buckets mismatch"):
        CrawlEngine(
            spark,
            spark.read.parquet(bucketed_dir),
            _cfg(
                tmp_path_factory.mktemp("wrongbk"),
                pages_path=bucketed_dir,
                pages_buckets=BUCKETS * 2,
            ),
        )


def test_unbucketed_path_with_pruning_refused(spark, tmp_path_factory):
    """Pruning enabled against a table with no pbucket=N layout would scan
    zero pages; init must refuse."""
    d = tmp_path_factory.mktemp("flat_pages")
    synth_pages(
        spark, 10, partitions=2, hosts=3, skew_mega_host=False,
        reviews_per_page=1, links_per_page=2,
    ).write.mode("overwrite").parquet(str(d))
    with pytest.raises(ValueError, match="no pbucket"):
        CrawlEngine(
            spark,
            spark.read.parquet(str(d)),
            _cfg(
                tmp_path_factory.mktemp("flatck"),
                pages_path=str(d),
                pages_buckets=8,
            ),
        )


def test_corpus_meta_file_gates_pruning(spark, tmp_path_factory):
    """materialize_corpus records the bucket modulus; an engine configured
    with a different value is refused via the metadata file."""
    from fakepilot_spark.corpus import materialize_corpus

    d = tmp_path_factory.mktemp("meta_pages") / "corpus"
    materialize_corpus(
        spark, str(d), 20, files=2, buckets=8, hosts=3,
        skew_mega_host=False, reviews_per_page=1, links_per_page=2,
    )
    assert (d / "_fps_corpus_meta.json").exists()
    with pytest.raises(ValueError, match="pages_buckets mismatch"):
        CrawlEngine(
            spark,
            spark.read.parquet(str(d)),
            _cfg(
                tmp_path_factory.mktemp("metack"),
                pages_path=str(d),
                pages_buckets=16,
            ),
        )
    # the matching modulus is accepted
    CrawlEngine(
        spark,
        spark.read.parquet(str(d)),
        _cfg(
            tmp_path_factory.mktemp("metaok"),
            pages_path=str(d),
            pages_buckets=8,
        ),
    )

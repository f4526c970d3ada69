"""The epoch-loop crawl scheduler: drain → admit → fetch → extract → expand →
commit, resumable from per-epoch manifests.

Architecture (north rule, BASELINE.json:6,14):

* frontier = priority queue as a table; drain is a window rank inside hosts
  (politeness) + an ordered global ``LIMIT`` (micro-batch), both pure
  functions of (score desc, url asc) — parallelism-invariant by construction.
* URL-seen = broadcast bloom pre-filter (definitely-new links skip the exact
  anti-join) → per-partition cuckoo filters (second-stage, partitioned by
  ``pmod(xxhash64(url), P)``) → exact left-anti residual. Bloom fragments
  tree-merge (``RDD.treeReduce``) into the one broadcastable blob; cuckoo
  state lives as a partitioned table merged distributedly per pid
  (groupBy + applyInPandas) and probed via cogroup — the driver never
  holds or ships per-partition sketch state.
* fetch = equi-join of the admitted batch against the pages corpus on ``url``
  (the sandbox's stand-in for HTTP; AQE splits the mega-host skew).
* extract = the vectorized pandas-UDF pipeline (company + reviews + links).
* commit = results (companies+reviews+links)/lineage/new-URL delta/frontier
  snapshot/sketches written under ``epoch=N`` paths; the union of new-URL
  deltas through epoch N IS the URL-seen set (one table, column-pruned on
  read); the epoch manifest JSON is written last and is the atomic commit
  point — resume replays from the highest manifest.

Iceberg surface: tables are partitioned Parquet behind stable paths (jars
absent in sandbox, SURVEY.md §8); on a real cluster the writes become
``writeTo(...).append()`` with identical layout.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..extract.udfs import make_page_extractor
from .frontier import FRONTIER_SCHEMA, score_expr, with_frontier_columns
from .politeness import admit_per_host, apply_robots, politeness_df, robots_df
from .sketches import BloomFilter, CuckooFilter

__all__ = ["CrawlConfig", "CrawlEngine"]


@dataclass
class CrawlConfig:
    checkpoint_dir: str
    seeds: list
    max_epochs: int = 8
    global_batch: int = 10_000
    default_budget: int = 4
    nreviews: int = 3
    robots_rules: dict = field(default_factory=dict)
    host_budgets: dict = field(default_factory=dict)
    use_sketches: bool = True
    epoch_seconds: float = 60.0  # virtual epoch duration for crawl-delay caps
    bloom_capacity: int = 1 << 20
    bloom_fpp: float = 0.01
    cuckoo_partitions: int = 16
    cuckoo_capacity_per_partition: int = 1 << 16
    # hash-bucketed pages corpus (url-hash partition pruning in the fetch
    # scan): path of a parquet table partitioned by
    # pbucket = pmod(xxhash64(url), pages_buckets). When set, each epoch
    # scans ONLY the buckets its batch can hit instead of the full corpus.
    pages_path: str | None = None
    pages_buckets: int | None = None


def _manifest_path(ckpt: Path, epoch: int) -> Path:
    return ckpt / "manifests" / f"epoch_{epoch:05d}.json"


class CrawlEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame, config: CrawlConfig):
        self.spark = spark
        self.pages = pages
        self.cfg = config
        self.ckpt = Path(config.checkpoint_dir)
        (self.ckpt / "manifests").mkdir(parents=True, exist_ok=True)
        self._extract = make_page_extractor(
            nreviews=config.nreviews, with_reviews=True, with_links=True, strict=False
        )
        self._robots = robots_df(spark, config.robots_rules)
        self._politeness = politeness_df(spark, config.host_budgets)
        self._expand_cache: list = []  # DataFrames pinned for one expand step
        # deferred sketch build (round-4 verdict item 3): epoch N's sketch
        # build runs on this 1-worker pool, overlapping epoch N+1's
        # drain/fetch/extract instead of sitting on N's critical path. The
        # single worker serializes builds (N's build always finishes before
        # N+1's is submitted — N+1 joins the future before its expand).
        self._sketch_pool = None
        self._sketch_future = None
        self._sketch_future_epoch: int | None = None
        if config.pages_path and config.pages_buckets:
            self._validate_pages_buckets()

    def _validate_pages_buckets(self) -> None:
        """Refuse to prune against a mismatched bucket layout.

        The fetch scan's ``pbucket.isin(...)`` filter is only correct when
        ``cfg.pages_buckets`` equals the modulus the pages table was
        MATERIALIZED with — a mismatch silently drops pages (fewer URLs
        fetched, no error). ``materialize_corpus`` records the modulus in
        ``_fps_corpus_meta.json``; absent that, fall back to the
        ``pbucket=N`` partition directory names (max index + 1 — exact
        whenever the top bucket is non-empty, which any corpus bigger than
        a few × buckets satisfies).
        """
        cfg = self.cfg
        root = Path(cfg.pages_path)
        meta = root / "_fps_corpus_meta.json"
        if meta.exists():
            actual = int(json.loads(meta.read_text())["pages_buckets"])
            src = "metadata file"
        else:
            idx = [
                int(p.name.split("=", 1)[1])
                for p in root.glob("pbucket=*")
                if p.is_dir()
            ]
            if not idx:
                raise ValueError(
                    f"pages_path {cfg.pages_path} has no pbucket=N "
                    "partition directories: bucket pruning would drop every "
                    "page. Re-materialize bucketed or set pages_buckets=None."
                )
            actual = max(idx) + 1
            src = "pbucket= directory layout"
        if actual != cfg.pages_buckets:
            raise ValueError(
                f"pages_buckets mismatch: config says {cfg.pages_buckets} "
                f"but the table at {cfg.pages_path} was materialized with "
                f"{actual} (from {src}). Bucket pruning with the wrong "
                "modulus silently drops pages."
            )

    # -- state io -----------------------------------------------------------

    def last_committed_epoch(self) -> int:
        epochs = [
            int(p.stem.split("_")[1])
            for p in (self.ckpt / "manifests").glob("epoch_*.json")
        ]
        return max(epochs, default=-1)

    def _frontier_path(self, epoch: int) -> str:
        if epoch == -1:
            # the epoch -1 pending snapshot IS the seed delta — one table
            return self._delta_path(-1)
        return str(self.ckpt / "frontier" / f"epoch={epoch}")

    def _delta_path(self, epoch: int) -> str:
        """Newly-enqueued URLs of one epoch (epoch -1 = the seed list).

        The union of deltas through epoch N IS the URL-seen set after N —
        one table serves both the frontier expansion and the seen-set reads
        (column-pruned to ``url`` by the parquet scan).
        """
        return str(self.ckpt / "new" / f"epoch={epoch}")

    def _read_seen_through(self, epoch: int) -> DataFrame:
        paths = [self._delta_path(e) for e in range(-1, epoch + 1)]
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(*paths).select("url")

    def _pending_count(self, prev_epoch: int) -> int | None:
        """Pending-frontier row count after ``prev_epoch``, from its committed
        manifest (zero-cost — no Spark job). None when unknown."""
        m = _manifest_path(self.ckpt, prev_epoch)
        if not m.exists():
            return None
        s = json.loads(m.read_text())
        if "pending_after" in s:
            return int(s["pending_after"])
        if "seeded" in s:
            return int(s["seeded"])
        return None

    def _drain_batch(
        self, admitted: DataFrame, k: int, pending_n: int | None
    ) -> DataFrame:
        """Exact (score desc, url asc) global top-``k`` micro-batch without a
        single-task sort or driver-side merge of the full frontier.

        * Fast path: when the whole pending frontier provably fits the batch
          (``pending_n <= k``, read from the previous epoch's manifest),
          every admitted row is in the batch — no ordering work at all
          (the batch is a set downstream; order never matters past the rank).
        * Otherwise two-phase, the same shape as
          ``politeness.admit_per_host``: phase 1 shuffles by a url-hash
          drain salt and keeps each salt group's local top-k (P parallel
          bounded sorts — no task ever sorts more than its hash share of the
          frontier); phase 2 ranks only the <= P*k phase-1 survivors. The
          phase-2 sort is one executor task, but its input is bounded by the
          prune and it spills to disk — unlike ``orderBy().limit(k)``
          (TakeOrderedAndProject), whose final merge materializes the whole
          multi-million-row batch in driver memory.
        """
        if pending_n is not None and pending_n <= k:
            return admitted
        from pyspark.sql import Window

        P = max(self.spark.sparkContext.defaultParallelism * 2, 8)
        w_local = Window.partitionBy("dsalt").orderBy(
            F.desc("score"), F.asc("url")
        )
        pruned = (
            admitted.withColumn(
                "dsalt", F.pmod(F.xxhash64("url"), F.lit(P)).cast("int")
            )
            .withColumn("dr", F.row_number().over(w_local))
            .filter(F.col("dr") <= k)
            .drop("dsalt", "dr")
        )
        w_global = Window.orderBy(F.desc("score"), F.asc("url"))
        return (
            pruned.withColumn("gr", F.row_number().over(w_global))
            .filter(F.col("gr") <= k)
            .drop("gr")
        )

    # -- sketches -----------------------------------------------------------

    def _cuckoo_dir(self, epoch: int) -> str:
        return str(self.ckpt / "sketches" / f"epoch={epoch}" / "cuckoo")

    def _build_sketches(
        self,
        urls: DataFrame,
        prev_bloom: bytes | None,
        epoch: int,
        include_prev_cuckoo: bool = True,
    ) -> bytes:
        """One distributed pass builds BOTH sketches; neither merge touches
        the driver with per-partition state:

        * per-pid cuckoo fragments (urls land in pid = pmod(xxhash64(url),
          P)) merge DISTRIBUTEDLY — groupBy(pid) + applyInPandas over the
          union of this epoch's fragments and the previous epoch's
          partitioned cuckoo table — and commit straight to this epoch's
          cuckoo table (one row per pid). The driver never holds cuckoo
          state, so P and capacity can scale with the corpus.
        * per-task bloom fragments tree-merge (``RDD.treeReduce``) into the
          single broadcastable pre-filter blob — the only sketch the driver
          keeps, because broadcasting it is the point.

        Returns the merged bloom blob (or-ed into ``prev_bloom``).
        """
        P = self.cfg.cuckoo_partitions
        cap = self.cfg.cuckoo_capacity_per_partition
        proto = (
            BloomFilter.from_bytes(prev_bloom)
            if prev_bloom is not None
            else BloomFilter.for_capacity(self.cfg.bloom_capacity, self.cfg.bloom_fpp)
        )
        n_bits, n_hashes = proto.n_bits, proto.n_hashes

        # pid is the LOGICAL cuckoo partition; the physical shuffle width
        # follows cluster parallelism (build() groups by pid within a task,
        # so several logical partitions may share one physical task).
        width = min(P, self.spark.sparkContext.defaultParallelism)
        hashed = urls.select(
            F.xxhash64("url").alias("h"),
            F.pmod(F.xxhash64("url"), F.lit(P)).cast("int").alias("pid"),
        ).repartition(width, "pid")

        def build(pdfs):
            acc: dict = {}
            bloom = BloomFilter(n_bits, n_hashes)
            for pdf in pdfs:
                if pdf.empty:
                    continue
                hs = pdf["h"].to_numpy().view(np.uint64)
                bloom.add_many(hs)
                for pid, grp in pdf.groupby("pid"):
                    cf = acc.get(pid)
                    if cf is None:
                        cf = acc[pid] = CuckooFilter.for_capacity(cap)
                    cf.add_many(grp["h"].to_numpy().view(np.uint64))
            rows = [(int(pid), cf.to_bytes()) for pid, cf in acc.items()]
            rows.append((-1, bloom.to_bytes()))  # pid -1 = bloom fragment
            yield pd.DataFrame({"pid": [r[0] for r in rows], "blob": [r[1] for r in rows]})

        frags = hashed.mapInPandas(build, "pid int, blob binary").persist()

        # cuckoo: fragments ∪ previous table → per-pid merge → epoch table
        # (include_prev_cuckoo=False on the rebuild-from-deltas path, where
        # the fragments already cover the full seen set)
        cuckoo_frags = frags.filter(F.col("pid") >= 0)
        prev_dir = self._cuckoo_dir(epoch - 1)
        if include_prev_cuckoo and Path(prev_dir).exists():
            cuckoo_frags = cuckoo_frags.unionByName(
                self.spark.read.parquet(prev_dir)
            )

        def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
            blobs = sorted(bytes(b) for b in pdf["blob"])  # stable order
            cf = CuckooFilter.from_bytes(blobs[0])
            for b in blobs[1:]:
                cf = cf.merge(CuckooFilter.from_bytes(b))
            return pd.DataFrame(
                {"pid": [int(pdf["pid"].iloc[0])], "blob": [cf.to_bytes()]}
            )

        (
            cuckoo_frags.groupBy("pid")
            .applyInPandas(merge_group, "pid int, blob binary")
            .write.mode("overwrite")
            .parquet(self._cuckoo_dir(epoch))
        )

        # bloom: tree-merge fragments, or into the carried-forward state
        def or_blobs(a: bytes, b: bytes) -> bytes:
            return BloomFilter.from_bytes(a).merge(BloomFilter.from_bytes(b)).to_bytes()

        merged = (
            frags.filter(F.col("pid") == -1)
            .select("blob")
            .rdd.map(lambda r: bytes(r["blob"]))
            .treeReduce(or_blobs)
        )
        frags.unpersist()
        return BloomFilter.from_bytes(merged).merge(proto).to_bytes()

    def _sketch_prefilter(
        self, links: DataFrame, bloom_blob: bytes, cuckoo_epoch: int
    ) -> DataFrame:
        """Adds ``maybe_seen``: False ⇒ provably never enqueued (bloom, then
        cuckoo, both no-false-negative) ⇒ skips the exact anti-join.

        Stage 1 is the broadcast bloom pre-filter (one blob, mapInPandas on
        the scan partitions). Stage 2 refines only the bloom-positive rows
        against the PARTITIONED cuckoo table: candidates cogroup with the
        table on pid — executor-side lookups against executor-side state, no
        driver collect and no multi-GB broadcast dict at high P.
        """
        from pyspark.sql.types import BooleanType, StructField, StructType

        sc = self.spark.sparkContext
        b_bloom = sc.broadcast(bloom_blob)
        P = self.cfg.cuckoo_partitions

        def bloom_check(pdfs):
            bf = BloomFilter.from_bytes(b_bloom.value)
            for pdf in pdfs:
                if pdf.empty:
                    pdf["maybe_seen"] = pd.Series([], dtype=bool)
                    yield pdf
                    continue
                pdf = pdf.copy()
                pdf["maybe_seen"] = bf.contains_many(
                    pdf["h"].to_numpy().view(np.uint64)
                )
                yield pdf

        hashed = links.withColumn("h", F.xxhash64("url")).withColumn(
            "pid", F.pmod(F.xxhash64("url"), F.lit(P)).cast("int")
        )
        # fresh StructType: mutating a DataFrame's cached schema in place is
        # not visible JVM-side and breaks mapInPandas resolution.
        out_schema = StructType(
            list(hashed.schema.fields) + [StructField("maybe_seen", BooleanType())]
        )
        # The bloom subtree (links explode → min-depth groupBy → mapInPandas)
        # is referenced by up to 4 branches of the single expand action
        # (candidates/passed × definitely_new/residual); pin it so it
        # executes once. _run_epoch unpersists after new_frontier.count().
        flagged = hashed.mapInPandas(bloom_check, out_schema).persist()
        self._expand_cache.append(flagged)

        cdir = self._cuckoo_dir(cuckoo_epoch)
        if not Path(cdir).exists():
            return flagged.drop("h", "pid")

        candidates = flagged.filter(F.col("maybe_seen"))
        passed = flagged.filter(~F.col("maybe_seen"))
        cuckoo_tbl = self.spark.read.parquet(cdir)

        def cuckoo_check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return left
            left = left.copy()
            if right.empty:
                left["maybe_seen"] = False
            else:
                cf = CuckooFilter.from_bytes(bytes(right["blob"].iloc[0]))
                left["maybe_seen"] = cf.contains_many(
                    left["h"].to_numpy().view(np.uint64)
                )
            return left

        refined = (
            candidates.groupBy("pid")
            .cogroup(cuckoo_tbl.groupBy("pid"))
            .applyInPandas(cuckoo_check, out_schema)
        )
        return refined.unionByName(passed).drop("h", "pid")

    # -- fetch source -------------------------------------------------------

    def _fetch_corpus(self, batch: DataFrame, buckets: list | None = None) -> DataFrame:
        """The pages table the epoch's fetch join scans.

        When the corpus is committed bucketed by url hash
        (``pbucket = pmod(xxhash64(url), pages_buckets)``), the cached batch
        yields its distinct bucket set (a metadata-sized list, precomputed by
        the drain action when available) and the scan carries a partition
        filter — only matching bucket directories are read. Otherwise the
        full ``pages`` DataFrame is used as-is.
        """
        cfg = self.cfg
        if not (cfg.pages_path and cfg.pages_buckets):
            return self.pages.select("url", "warc_ts", "html")
        if buckets is None:
            buckets = [
                r["b"]
                for r in batch.select(
                    F.pmod(F.xxhash64("url"), F.lit(cfg.pages_buckets))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
        return (
            self.spark.read.parquet(cfg.pages_path)
            .filter(F.col("pbucket").isin(buckets))
            .select("url", "warc_ts", "html")
        )

    # -- epoch step ---------------------------------------------------------

    def run(self, max_epochs: int | None = None) -> dict:
        """Run (or resume) the crawl; returns the summary of the whole run."""
        cfg = self.cfg
        limit = max_epochs if max_epochs is not None else cfg.max_epochs
        start_epoch = self.last_committed_epoch() + 1

        if start_epoch == 0:
            from .frontier import seeds_frontier

            frontier = seeds_frontier(self.spark, cfg.seeds)
            frontier.write.mode("overwrite").parquet(self._delta_path(-1))
            if cfg.use_sketches:
                # DEFERRED like every other epoch's build: the seed sketches
                # are first needed at epoch 0's expand, so the build overlaps
                # epoch 0's drain/fetch/extract instead of serializing in
                # front of the whole crawl. Crash before the build lands →
                # _resolve_bloom(-1) rebuilds from the committed seed delta.
                self._submit_sketch_build(-1, None)
            _manifest_path(self.ckpt, -1).parent.mkdir(exist_ok=True)
            _manifest_path(self.ckpt, -1).write_text(
                json.dumps({"epoch": -1, "seeded": len(cfg.seeds)})
            )
            start_epoch = 0

        summaries = []
        try:
            for epoch in range(start_epoch, limit):
                summary = self._run_epoch(epoch, last=epoch == limit - 1)
                summaries.append(summary)
                if summary["pending_after"] == 0:
                    break
        finally:
            # join any in-flight deferred build (an early `pending_after == 0`
            # exit may have submitted one). The LAST epoch never submits a
            # build: its sketches have no consumer in this run, and a resume
            # rebuilds them from the committed delta union on first need —
            # sketches are a derived artifact, the manifest contract covers
            # results/delta/frontier/lineage only.
            self._flush_sketches()
        return {
            "epochs": summaries,
            "total_fetched": sum(s["urls_fetched"] for s in summaries),
        }

    def _write_lineage(self, epoch: int, results_dir: str, lineage_dir: str) -> None:
        """Per-file lineage (partition_id, urls_fetched, frontier_epoch,
        fetch_ts), aggregated EXECUTOR-side from the committed results table
        (``input_file_name()`` groupBy). Storage-agnostic: no driver-side
        globbing of parquet footers, so the same code runs on HDFS/S3. The
        aggregate output is metadata-sized (one row per committed file), so
        the final coalesce(1) + within-partition sort is trivially bounded.
        """
        import datetime as _dt

        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        counts = (
            self.spark.read.parquet(results_dir)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("urls_fetched"))
        )
        lineage = (
            counts.coalesce(1)
            .sortWithinPartitions("file")
            .select(
                F.monotonically_increasing_id().cast("int").alias("partition_id"),
                "urls_fetched",
                F.lit(epoch).cast("int").alias("frontier_epoch"),
                F.lit(now).cast("timestamp").alias("fetch_ts"),
            )
        )
        lineage.write.mode("overwrite").parquet(lineage_dir)

    def _write_bloom(self, epoch: int, bloom: bytes | None) -> None:
        """The bloom blob is the one driver-held sketch (it exists to be
        broadcast); the cuckoo table is committed distributedly by
        :meth:`_build_sketches` under the same epoch directory.

        Written atomically (tmp + rename) and strictly AFTER the cuckoo
        table: ``bloom.bin`` present ⇒ the epoch's whole sketch set is
        complete. The deferred-build resume path relies on this marker."""
        import os

        d = self.ckpt / "sketches" / f"epoch={epoch}"
        d.mkdir(parents=True, exist_ok=True)
        if bloom is not None:
            tmp = d / "bloom.bin.tmp"
            tmp.write_bytes(bloom)
            os.replace(tmp, d / "bloom.bin")

    def _read_bloom(self, epoch: int) -> bytes | None:
        f = self.ckpt / "sketches" / f"epoch={epoch}" / "bloom.bin"
        return f.read_bytes() if f.exists() else None

    # -- deferred sketch build ---------------------------------------------

    def _submit_sketch_build(self, epoch: int, prev_bloom: bytes | None) -> None:
        """Queue epoch ``epoch``'s sketch build on the background worker.

        The build reads the COMMITTED delta parquet (never an in-memory
        DataFrame, so it has no lifetime coupling to the epoch that spawned
        it) and overlaps the next epoch's drain/fetch/extract — the next
        epoch joins the future in :meth:`_resolve_bloom` right before its
        expand phase, which is the first point that needs the sketches."""
        from concurrent.futures import ThreadPoolExecutor

        if self._sketch_pool is None:
            self._sketch_pool = ThreadPoolExecutor(
                1, thread_name_prefix="sketch-build"
            )
        delta = self._delta_path(epoch)

        def _build_deferred() -> bytes:
            urls = (
                self.spark.read.schema(FRONTIER_SCHEMA)
                .parquet(delta)
                .select("url")
            )
            blob = self._build_sketches(urls, prev_bloom, epoch)
            self._write_bloom(epoch, blob)
            return blob

        self._sketch_future = self._sketch_pool.submit(_build_deferred)
        self._sketch_future_epoch = epoch

    def _resolve_bloom(self, epoch: int) -> bytes | None:
        """Bloom blob AFTER ``epoch``: join the in-flight deferred build when
        it is the producer; otherwise read the committed blob; rebuild from
        the delta union when the blob is missing (crash after the manifest
        but before the deferred sketch write — the manifest contract covers
        results/delta/frontier/lineage, sketches are a derived artifact)."""
        if not self.cfg.use_sketches:
            return None
        fut = self._sketch_future
        if fut is not None:
            # quiesce regardless of epoch match: a stale build (retried
            # epoch) must finish before this epoch overwrites its inputs.
            blob = fut.result()
            self._sketch_future = None
            if self._sketch_future_epoch == epoch:
                return blob
        blob = self._read_bloom(epoch)
        if blob is None:
            blob = self._rebuild_sketches(epoch)
        return blob

    def _rebuild_sketches(self, epoch: int) -> bytes:
        """Sketches for ``epoch`` are missing: rebuild BOTH sketches from the
        committed delta union (the exact seen set through ``epoch``) and
        commit them under this epoch. ``include_prev_cuckoo=False`` because
        the rebuild inserts every seen URL itself — unioning the previous
        cuckoo table would double-insert every fingerprint."""
        urls = self._read_seen_through(epoch)
        bloom = self._build_sketches(
            urls, None, epoch, include_prev_cuckoo=False
        )
        self._write_bloom(epoch, bloom)
        return bloom

    def _flush_sketches(self) -> None:
        """Join any in-flight deferred build (run() exit / error paths)."""
        if self._sketch_future is not None:
            self._sketch_future.result()
            self._sketch_future = None
        if self._sketch_pool is not None:
            self._sketch_pool.shutdown(wait=True)
            self._sketch_pool = None

    def _run_epoch(self, epoch: int, last: bool = False) -> dict:
        cfg = self.cfg
        t0 = time.time()
        steps: dict = {}
        _t = time.time

        def _lap(name: str, since: float) -> float:
            now = _t()
            steps[name] = round(now - since, 3)
            return now

        t_step = t0
        pending = self.spark.read.schema(FRONTIER_SCHEMA).parquet(
            self._frontier_path(epoch - 1)
        )
        # bloom(epoch-1) may still be building on the background worker
        # (deferred sketch build) — it is first needed at the expand phase,
        # so resolution happens there; drain/fetch/extract proceed without it.
        bloom: bytes | None = None

        # 1. robots + politeness admission, then the ordered global micro-batch.
        # Fast paths (semantics-preserving): an empty robots dim filters
        # nothing; a per-host budget >= global_batch can never exclude a row
        # that survives the ordered global limit (host rank <= global rank).
        allowed = (
            apply_robots(pending, self._robots) if cfg.robots_rules else pending
        )
        has_delay = any(
            d and d > 0 for _, d in cfg.robots_rules.values()
        )
        if cfg.host_budgets or cfg.default_budget < cfg.global_batch or has_delay:
            admitted = admit_per_host(
                allowed,
                self._politeness,
                cfg.default_budget,
                robots=self._robots if has_delay else None,
                epoch_seconds=cfg.epoch_seconds,
            )
        else:
            admitted = allowed
        batch = self._drain_batch(
            admitted, cfg.global_batch, self._pending_count(epoch - 1)
        ).cache()
        # one action materializes the cache AND (for a bucketed corpus)
        # collects the batch's url-hash bucket set — no separate job for the
        # fetch-scan pruning metadata.
        if cfg.pages_path and cfg.pages_buckets:
            agg_row = batch.agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set(
                    F.pmod(F.xxhash64("url"), F.lit(cfg.pages_buckets)).cast("int")
                ).alias("bks"),
            ).first()
            batch_n, batch_buckets = int(agg_row["n"]), list(agg_row["bks"])
        else:
            batch_n, batch_buckets = batch.count(), None
        t_step = _lap("drain", t_step)

        # 2. fetch = join against the pages corpus. The batch (urls only) is
        # BROADCAST so the fat ``html`` column never shuffles — the corpus
        # side streams through scan → hash-probe → extract in one stage.
        # At 10^10 scale a multi-million-URL batch is still only a few
        # hundred MB of urls vs petabytes of pages; if the batch ever
        # outgrows broadcast, the fallback is a bucket-co-located join,
        # never an html shuffle. With a bucketed corpus (pages_path +
        # pages_buckets) the scan is further pruned to the url-hash
        # partitions the batch can actually hit — K epochs no longer cost
        # K full corpus scans.
        fetched = F.broadcast(batch.select("url", "depth")).join(
            self._fetch_corpus(batch, buckets=batch_buckets), "url", "inner"
        )

        # 3. extract (one Arrow batch per partition chunk) on the corpus scan
        # partitions — no repartition of page bytes. Extraction runs exactly
        # ONCE: the flattened results (links included) commit to the epoch's
        # results table in the same job, counts ride along as an observed
        # metric, and every downstream step re-reads the committed, column-
        # pruned parquet instead of re-evaluating (or caching) the UDF plan.
        from pyspark.sql import Observation

        extracted = fetched.select(
            "url", "depth", "warc_ts", self._extract("html").alias("x")
        )
        epoch_dir = lambda name: str(self.ckpt / name / f"epoch={epoch}")  # noqa: E731
        obs = Observation(f"results_{epoch}")
        results = extracted.select(
            "url", "depth", "warc_ts",
            F.col("x.company").alias("company"),
            F.col("x.reviews").alias("reviews"),
            F.col("x.links").alias("links"),
            F.col("x.error").alias("extract_error"),
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        # written straight off the scan partitions: extraction + write is ONE
        # stage, and the fat extracted structs (company/reviews/links) never
        # shuffle — one results file per fetch-scan task
        results.write.mode("overwrite").parquet(epoch_dir("results"))
        fetched_n = int(obs.get["n"])
        res = self.spark.read.parquet(epoch_dir("results"))
        t_step = _lap("fetch_extract_write", t_step)

        # 4. lineage: per-partition fetch accounting (north rule fields),
        # aggregated executor-side from the committed results table. It only
        # needs the committed parquet and owns a disjoint output directory,
        # so it runs CONCURRENTLY with the expand phase below (the epoch
        # pool is joined before the manifest write).
        from concurrent.futures import ThreadPoolExecutor

        # The try/finally opens IMMEDIATELY after the pool exists: an
        # exception anywhere in the expand phase below must still join the
        # in-flight lineage write, or an epoch retry could race the stale
        # thread's mode=overwrite parquet into the same epoch directory
        # (round-4 ADVICE, medium).
        epoch_pool = ThreadPoolExecutor(4)
        try:
            # 4b. lineage runs concurrently; its wall time is recorded from
            # inside the future (the old step label timed only the submit —
            # see BASELINE.md "step semantics" note).
            def _timed_lineage():
                t_l = _t()
                self._write_lineage(
                    epoch, epoch_dir("results"), epoch_dir("lineage")
                )
                steps["lineage_concurrent"] = round(_t() - t_l, 3)

            fut_lineage = epoch_pool.submit(_timed_lineage)

            # 5. expand: normalize links, min-depth dedupe, sketch
            #    prefilter, exact residual anti-join against the full seen
            #    set; the epoch's delta commits once and is the seen-set
            #    increment.
            links = (
                res.select(
                    F.explode_outer("links").alias("url"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .filter(F.col("url").startswith("http"))
                .groupBy("url")
                .agg(F.min("depth").alias("depth"))
            )
            seen = self._read_seen_through(epoch - 1)
            self._expand_cache = []
            # join the previous epoch's deferred sketch build here — it had
            # the whole drain/fetch/extract to finish, so this wait is ~0 on
            # the happy path (recorded honestly when it is not)
            t_bw = _t()
            bloom = self._resolve_bloom(epoch - 1)
            steps["sketch_wait"] = round(_t() - t_bw, 3)
            if cfg.use_sketches and bloom is not None:
                flagged = self._sketch_prefilter(links, bloom, cuckoo_epoch=epoch - 1)
                definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
                residual = (
                    flagged.filter(F.col("maybe_seen"))
                    .drop("maybe_seen")
                    .join(seen, "url", "left_anti")
                )
                new_urls = definitely_new.unionByName(residual)
            else:
                new_urls = links.join(seen, "url", "left_anti")
            # the expansion (prefilter + anti-join) is pinned; it materializes
            # exactly once INSIDE the concurrent commit jobs below (Spark's
            # per-block cache locks make later arrivals wait, never recompute),
            # so its compute overlaps the delta/frontier/sketch writes instead
            # of running as a separate serialized count pass. The row count
            # rides the delta write as an observed metric.
            new_frontier = with_frontier_columns(
                new_urls, F.col("depth"), epoch + 1
            ).persist()
            obs_delta = Observation(f"delta_{epoch}")
            t_step = _lap("expand", t_step)

            # 6. next frontier snapshot: survivors (pending minus this batch) +
            #    the newly discovered URLs; laid out by (host_prefix, salt).
            survivors = pending.join(batch.select("url"), "url", "left_anti")
            obs_front = Observation(f"frontier_{epoch}")
            next_frontier = (
                survivors.unionByName(new_frontier)
                .observe(obs_front, F.count(F.lit(1)).alias("n"))
                .repartition(
                    max(self.spark.sparkContext.defaultParallelism, 4),
                    "host_prefix",
                    "salt",
                )
            )

            # 5b+6+7 run CONCURRENTLY (on the epoch pool that already carries
            # the lineage write): the delta commit, the frontier snapshot write,
            # and the sketch build all read the pinned expansion (or
            # already-committed parquet) and touch disjoint outputs — driver
            # threads submit the jobs so the cluster is never idle between
            # them. The manifest (the atomic commit point) still writes
            # strictly after every one of them has finished.

            def _commit_delta() -> int:
                new_frontier.observe(
                    obs_delta, F.count(F.lit(1)).alias("n")
                ).write.mode("overwrite").parquet(self._delta_path(epoch))
                return int(obs_delta.get["n"])

            def _commit_frontier() -> int:
                next_frontier.write.mode("overwrite").parquet(
                    self._frontier_path(epoch)
                )
                return int(obs_front.get["n"])

            fut_delta = epoch_pool.submit(_commit_delta)
            fut_frontier = epoch_pool.submit(_commit_frontier)
            new_n = fut_delta.result()
            pending_after = fut_frontier.result()
            fut_lineage.result()
        finally:
            epoch_pool.shutdown(wait=True)
        new_frontier.unpersist()
        for cached in self._expand_cache:
            cached.unpersist()
        self._expand_cache = []
        t_step = _lap("frontier_commit", t_step)

        # 7. sketches build DEFERRED: submitted against the committed delta
        # parquet and joined by the NEXT epoch right before its expand —
        # the build overlaps that epoch's drain/fetch/extract instead of
        # extending this epoch's critical path. The manifest below commits
        # results/delta/frontier/lineage; sketches are a derived artifact
        # (bloom.bin is their completion marker, _resolve_bloom rebuilds
        # from the delta union when it is missing at resume). The LAST
        # epoch of the run skips the submit entirely — no epoch in this run
        # consumes its sketches, and a resume rebuilds on first need.
        if cfg.use_sketches and not last:
            self._submit_sketch_build(epoch, bloom)
            t_step = _lap("seen_sketches_submit", t_step)

        summary = {
            "epoch": epoch,
            "batch": batch_n,
            "urls_fetched": fetched_n,
            "urls_missing": batch_n - fetched_n,
            "new_urls": new_n,
            "pending_after": pending_after,
            "wall_sec": round(time.time() - t0, 3),
            "steps": steps,
        }
        _manifest_path(self.ckpt, epoch).write_text(json.dumps(summary))
        batch.unpersist()
        return summary

    # -- views over committed results ----------------------------------------

    def results_df(self) -> DataFrame:
        return self.spark.read.parquet(str(self.ckpt / "results"))

    def companies_df(self) -> DataFrame:
        r = self.results_df()
        return r.select("url", F.col("company.*"), "extract_error")

    def reviews_df(self) -> DataFrame:
        r = self.results_df()
        return r.select(
            "url", F.posexplode_outer("reviews").alias("review_idx", "rv")
        ).select("url", "review_idx", "rv.*")

    def fetched_urls_in_order(self) -> list:
        """Crawl order: (epoch asc, score desc, url asc) — the deterministic
        total order the oracle must match."""
        out = []
        for epoch in range(self.last_committed_epoch() + 1):
            path = self.ckpt / "results" / f"epoch={epoch}"
            if not path.exists():
                continue
            rows = (
                self.spark.read.parquet(str(path))
                .select("url")
                .collect()
            )
            out.append(sorted(r["url"] for r in rows))
        return out

"""Corpus-construction operators: exact-substring duplication coverage and
deterministic sampling (stratified rates + per-source caps).

These close the last training-data-pipeline gaps after the pair/cluster
stages in :mod:`textops` / :mod:`graphops`:

* **Duplicated-span coverage** — the MapReduce form of exact-substring
  dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better"): suffix-array substring matching approximated by
  fixed-width ``W``-token rolling windows, the duplicated-n-gram-coverage
  metric RefinedWeb/FineWeb-style pipelines gate on.  A window is
  *duplicated* when the same ``W``-gram occurs in ≥ 2 distinct documents;
  per document we report how many token positions duplicated windows cover
  (interval union, exact).

  Plan shape (all native SQL, no Python): explode windows → two
  partial-aggregated hash shuffles ((gram, doc) then gram) to find
  cross-doc grams → one equi-join of positions to the pruned duplicate-gram
  table (pruned *before* the join, so at real corpora — where duplicated
  grams are a small minority — AQE can broadcast it) → per-``doc_id``
  window for the interval union (never a global window).  At 10^10 docs
  this is the heaviest legitimate shuffle in the pipeline and it is keyed
  by a 60-bit gram hash: uniform by construction, partial-aggregated
  map-side.  The window width is the documented lever: production
  ExactSubstr uses W≈50; W=4 here keeps the metric non-degenerate on the
  31-word synthetic vocabulary.

* **Stratified hash sampling** — reproducible per-stratum downsampling
  (the per-source/per-dump rebalancing every corpus freeze needs).  The
  keep decision is ``bucket(doc) < quota(source)`` where ``bucket`` is a
  60-bit md5 hash mod ``_SAMPLE_DEN`` — deterministic (re-runs and
  engines agree bit-for-bit, which is exactly what makes it oracle-able),
  seed-free, and *monotone*: raising a stratum's quota only ever adds
  rows, so an incremental corpus grow never resamples what a previous
  freeze shipped.  Map-only — zero shuffles; the predicate survives
  pushdown to the scan.

* **Per-source cap** — "keep at most N docs per source, deterministically"
  (FineWeb-style dump balancing): two-phase salted rank (the
  ``crawl/politeness.py`` drain pattern).  Phase 1 ranks within
  ``(source, salt)`` and keeps each salt's local top-N — so a mega-source
  (10^8 docs under one key) spreads over ``_CAP_SALTS`` tasks instead of
  funnelling into one sort; phase 2 computes the exact per-source rank
  over the ≤ salts·N survivors.  The shape is pinned in
  ``tests/test_plan_shapes.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from . import load
from .textops import _hash60

# --------------------------------------------------------------------------
# Q: duplicated-span coverage (ExactSubstr approximation, Lee et al. 2022).
# --------------------------------------------------------------------------

_SPAN_W = 4  # window width in tokens (production ExactSubstr: ~50)


def q_doc_dup_span_coverage(spark, sf):
    """Per-document duplicated-window count and exact token-position
    coverage of cross-document duplicated ``_SPAN_W``-grams.

    Interval-union trick: windows are fixed-width, so after sorting a
    doc's duplicated positions the union length is
    ``sum(least(W, pos - lag(pos)))`` with the first row contributing W —
    one per-doc window pass, no interval data structure.
    """
    W = _SPAN_W
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)

    wins = (
        docs.filter(n >= W)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - (W - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        _hash60(F.concat_ws(" ", F.slice(toks, i, W))).alias(
                            "g"
                        ),
                    ),
                )
            ).alias("w"),
        )
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    )
    # cross-doc duplicated grams, pruned BEFORE the position join
    dup_grams = (
        wins.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    dup_pos = wins.join(dup_grams, "g")

    byd = Window.partitionBy("doc_id").orderBy("pos")
    cov = dup_pos.withColumn(
        "add_cov",
        F.least(
            F.lit(W),
            F.col("pos") - F.coalesce(F.lag("pos").over(byd), F.col("pos") - W),
        ),
    )
    perdoc = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.sum("add_cov").cast("bigint").alias("covered_tokens"),
    )
    base = docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.greatest(n - (W - 1), F.lit(0)).cast("bigint").alias("n_windows"),
    )
    return base.join(perdoc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_windows",
        F.coalesce("dup_windows", F.lit(0)).cast("bigint").alias("dup_windows"),
        F.coalesce("covered_tokens", F.lit(0))
        .cast("bigint")
        .alias("covered_tokens"),
    )


_SQL_DUP_SPAN = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), w0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {_SPAN_W - 1})) AS pos
  FROM toks WHERE len(t) >= {_SPAN_W}
), wins AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(array_to_string(
             t[pos:pos + {_SPAN_W - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM w0
), dup_grams AS (
  SELECT g FROM (SELECT g, doc_id FROM wins GROUP BY g, doc_id)
  GROUP BY g HAVING COUNT(*) >= 2
), cov AS (
  SELECT doc_id, pos,
         LEAST({_SPAN_W}, pos - COALESCE(
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
             pos - {_SPAN_W})) AS add_cov
  FROM wins JOIN dup_grams USING (g)
), perdoc AS (
  SELECT doc_id, COUNT(*) AS dup_windows,
         SUM(add_cov) AS covered_tokens
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(GREATEST(len(string_split(d.text, ' ')) - {_SPAN_W - 1}, 0)
            AS BIGINT) AS n_windows,
       CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(COALESCE(p.covered_tokens, 0) AS BIGINT) AS covered_tokens
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""

# --------------------------------------------------------------------------
# Q: stratified hash sampling — deterministic per-stratum keep rates.
# --------------------------------------------------------------------------

_SAMPLE_DEN = 8  # bucket space; quota(source) = (source_num % 4) + 1 of 8


def q_stratified_sample_sources(spark, sf):
    """Deterministic stratified sample: keep a doc iff its md5 bucket
    (mod 8) is below its source's quota (1-4 eighths, derived from the
    source id so the oracle reproduces it).  Map-only: no shuffle."""
    docs = load(spark, sf, "documents")
    bucket = _hash60(F.col("doc_id").cast("string")) % _SAMPLE_DEN
    quota = F.substring("source", 4, 10).cast("int") % 4 + 1
    return (
        docs.select(
            "doc_id",
            "source",
            bucket.cast("bigint").alias("bucket"),
            quota.cast("bigint").alias("quota_num"),
        )
        .filter(F.col("bucket") < F.col("quota_num"))
    )


_SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, source,
       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {_SAMPLE_DEN} AS bucket,
       CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS quota_num
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % {_SAMPLE_DEN}
      < CAST(substr(source, 4) AS INT) % 4 + 1
"""

# --------------------------------------------------------------------------
# Q: per-source cap — keep at most N docs per stratum, deterministic order.
# --------------------------------------------------------------------------

_CAP_N = 10
_CAP_SALTS = 8  # phase-1 fan-out per stratum; survivors <= _CAP_SALTS * _CAP_N


def q_source_cap_sample(spark, sf):
    """Cap every source at ``_CAP_N`` documents, chosen by md5-hash order
    (doc_id tiebreak) so the selection is reproducible and engine-neutral.

    Two-phase salted rank (the ``crawl/politeness.py`` drain pattern): a
    single ``Window.partitionBy(source)`` funnels a mega-stratum (one 10^9-doc
    CC dump among ~10^7 sources) into one task's sort.  Phase 1 ranks within
    ``(source, csalt)`` — ``csalt = xxhash64(doc_id) % _CAP_SALTS`` spreads
    every stratum over ``_CAP_SALTS`` tasks — and keeps each salt's local
    top-``_CAP_N``; the global per-source top-``_CAP_N`` is a subset of that
    union, so the exact phase-2 rank runs over ≤ ``_CAP_SALTS·_CAP_N`` rows
    per source, never the full stratum.  Result set (and the oracle) is
    identical to the single-window form.
    """
    docs = load(spark, sf, "documents")
    h = _hash60(F.col("doc_id").cast("string"))
    salted = docs.select(
        "doc_id",
        "source",
        h.alias("h"),
        F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_SALTS)).alias("csalt"),
    )
    # phase 1: per-(source, salt) local top-k prune — bounded output
    w_salt = Window.partitionBy("source", "csalt").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    pruned = (
        salted.withColumn("salt_rank", F.row_number().over(w_salt))
        .filter(F.col("salt_rank") <= _CAP_N)
        .drop("salt_rank", "csalt")
    )
    # phase 2: exact per-source rank over the <= _CAP_SALTS*_CAP_N survivors
    byh = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        pruned.select(
            "doc_id",
            "source",
            F.row_number().over(byh).cast("bigint").alias("pick_rank"),
        )
        .filter(F.col("pick_rank") <= _CAP_N)
    )


_SQL_SOURCE_CAP = f"""
SELECT doc_id, source, pick_rank
FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          ::BIGINT ASC,
                      doc_id ASC) AS BIGINT) AS pick_rank
  FROM documents
)
WHERE pick_rank <= {_CAP_N}
"""


QUERIES = {
    "doc_dup_span_coverage": q_doc_dup_span_coverage,
    "stratified_sample_sources": q_stratified_sample_sources,
    "source_cap_sample": q_source_cap_sample,
}

ORACLES = {
    "doc_dup_span_coverage": _SQL_DUP_SPAN,
    "stratified_sample_sources": _SQL_STRATIFIED_SAMPLE,
    "source_cap_sample": _SQL_SOURCE_CAP,
}

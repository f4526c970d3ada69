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

* **Eval-set decontamination** — the n-gram overlap check every LLM corpus
  freeze runs against its benchmark suites (GPT-3 appendix C, FineWeb):
  the holdout's distinct gram set broadcasts (benchmarks are tiny next to
  the corpus); training grams never shuffle.

* **Composite keep/reject filter** — the one-pass freeze decision
  combining language, quality, exact-dedup-canonical, and decontamination
  with fixed reject precedence.

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
from .textops import _STOPWORD_PATTERN, _hash60

# --------------------------------------------------------------------------
# Q: duplicated-span coverage (ExactSubstr approximation, Lee et al. 2022).
# --------------------------------------------------------------------------

# Window width in tokens.  The registered query uses W=4 (the synthetic
# documents are short — production ExactSubstr uses ~50); the algorithm is
# W-parameterized and parity-gated at W=50 too (tests/test_dup_span_w50.py),
# so the driver-checked width is a configuration, not a structural limit.
_SPAN_W = 4


def dup_span_coverage(docs, W=_SPAN_W):
    """Per-document duplicated-window count and exact token-position
    coverage of cross-document duplicated ``W``-grams.

    Interval-union trick: windows are fixed-width, so after sorting a
    doc's duplicated positions the union length is
    ``sum(least(W, pos - lag(pos)))`` with the first row contributing W —
    one per-doc window pass, no interval data structure.
    """
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


def q_doc_dup_span_coverage(spark, sf):
    return dup_span_coverage(load(spark, sf, "documents"), _SPAN_W)


def sql_dup_span(W=_SPAN_W):
    """DuckDB oracle for ``dup_span_coverage`` at window width ``W``."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), w0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {W - 1})) AS pos
  FROM toks WHERE len(t) >= {W}
), wins AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(array_to_string(
             t[pos:pos + {W - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM w0
), dup_grams AS (
  SELECT g FROM (SELECT g, doc_id FROM wins GROUP BY g, doc_id)
  GROUP BY g HAVING COUNT(*) >= 2
), cov AS (
  SELECT doc_id, pos,
         LEAST({W}, pos - COALESCE(
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
             pos - {W})) AS add_cov
  FROM wins JOIN dup_grams USING (g)
), perdoc AS (
  SELECT doc_id, COUNT(*) AS dup_windows,
         SUM(add_cov) AS covered_tokens
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       CAST(GREATEST(len(string_split(d.text, ' ')) - {W - 1}, 0)
            AS BIGINT) AS n_windows,
       CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(COALESCE(p.covered_tokens, 0) AS BIGINT) AS covered_tokens
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


_SQL_DUP_SPAN = sql_dup_span(_SPAN_W)

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


# --------------------------------------------------------------------------
# Q: eval-set n-gram decontamination (GPT-3 appendix C / FineWeb style).
# --------------------------------------------------------------------------

_DECON_W = 4  # n-gram width (production pipelines use ~13; the 31-word
# synthetic vocabulary needs 4 to be non-degenerate — measured 1.6% of
# training docs contaminated at sf0.01, 14.7% at sf0.1)
_DECON_EVAL_MOD = 97  # deterministic holdout: doc_id % 97 == 0 is "eval"


def _wgram_hashes(docs, W: int):
    """(doc_id, g) for every width-``W`` token window; ``g`` is the shared
    60-bit md5 gram hash (:func:`textops._hash60`), so engines agree."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    return docs.filter(n >= W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - (W - 1)),
                lambda i: _hash60(F.concat_ws(" ", F.slice(toks, i, W))),
            )
        ).alias("g"),
    )


def q_eval_decontaminate(spark, sf):
    """Training-set decontamination: flag every training document that
    shares any ``_DECON_W``-gram with the eval holdout (``doc_id %
    _DECON_EVAL_MOD == 0``) — the n-gram overlap check every LLM corpus
    freeze runs against its benchmark suites (GPT-3 appendix C,
    FineWeb/RefinedWeb decontamination).

    Plan shape: the eval side is a benchmark suite, orders of magnitude
    smaller than the corpus (here 1/97 of docs; in production ~10^5 eval
    docs vs 10^10 training docs), so its distinct gram set is explicitly
    ``broadcast()`` — the training corpus never shuffles its grams, it
    streams through a map-side hash join and one partial-aggregated
    per-doc count.  If a benchmark suite ever outgrew the broadcast
    threshold the same plan degrades gracefully to a shuffle join keyed
    by the uniform 60-bit gram hash.
    """
    docs = load(spark, sf, "documents")
    grams = _wgram_hashes(docs, _DECON_W)
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("g").distinct()
    hits = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("hit_grams"))
    )
    train = docs.filter(~is_eval).select("doc_id")
    hit = F.coalesce("hit_grams", F.lit(0))
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        hit.cast("bigint").alias("hit_grams"),
        (hit > 0).alias("contaminated"),
    )


_SQL_EVAL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), w0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {_DECON_W - 1})) AS pos
  FROM toks WHERE len(t) >= {_DECON_W}
), wins AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(
             t[pos:pos + {_DECON_W - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM w0
), ev AS (
  SELECT DISTINCT g FROM wins WHERE doc_id % {_DECON_EVAL_MOD} = 0
), hits AS (
  SELECT doc_id, COUNT(DISTINCT g) AS hit_grams
  FROM wins JOIN ev USING (g)
  WHERE doc_id % {_DECON_EVAL_MOD} <> 0
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.hit_grams, 0) AS BIGINT) AS hit_grams,
       COALESCE(h.hit_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_DECON_EVAL_MOD} <> 0
"""

# --------------------------------------------------------------------------
# Q: composite corpus keep/reject filter — the one-pass freeze decision.
# --------------------------------------------------------------------------

_KEEP_MIN_QUALITY = 0.1


def q_corpus_keep_filter(spark, sf):
    """FineWeb-style corpus freeze decision in one query: every *training*
    document (the eval holdout is excluded from the corpus by definition)
    gets a single ``verdict`` with fixed precedence —
    ``non_english`` → ``low_quality`` → ``exact_duplicate`` →
    ``contaminated`` → ``kept``.

    Composes the registry's own per-signal operators (same formulas as
    ``doc_langid`` / ``doc_quality`` / ``doc_fingerprint`` /
    ``eval_decontaminate`` — the oracles cross-check them):

    * language gate: stopword-density heuristic (``pred_lang``);
    * quality gate: length-blend score < ``_KEEP_MIN_QUALITY``;
    * exact dedup: keep only the min-``doc_id`` copy per whitespace-
      normalized md5 fingerprint.  Canonical choice is a partial-aggregated
      ``groupBy(fp).min(doc_id)`` joined back — never a per-fingerprint
      window, so a viral page with 10^6 exact copies costs a map-side
      combine, not one task's sort;
    * decontamination: any ``_DECON_W``-gram shared with the eval holdout
      (broadcast join — see :func:`q_eval_decontaminate`).

    The exact-duplicate branch is degenerate at sf0.01 (the synthetic
    corpus has no exact dups until sf0.1 — 8 there); the other three fire
    at every SF.
    """
    docs = load(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)

    # same formulas as textops.q_doc_quality / q_doc_langid /
    # q_doc_fingerprint (their oracles pin the shared semantics)
    n_tokens = F.size(F.split(F.col("text"), " "))
    quality = F.round(
        F.least(n_tokens / 300.0, F.lit(1.0)) * 0.7
        + F.least(F.length("text") / 1500.0, F.lit(1.0)) * 0.3,
        4,
    )
    density = F.round(
        F.regexp_count(F.col("text"), F.lit(_STOPWORD_PATTERN)) / n_tokens, 4
    )
    pred_lang = F.when(density > 0.03, F.lit("en")).otherwise(F.lit("unk"))
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))

    base = train.select(
        "doc_id",
        pred_lang.alias("pred_lang"),
        quality.alias("quality"),
        fp.alias("fp"),
    )
    first_copy = base.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    hits = (
        _wgram_hashes(train, _DECON_W)
        .join(
            F.broadcast(
                _wgram_hashes(
                    docs.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0),
                    _DECON_W,
                )
                .select("g")
                .distinct()
            ),
            "g",
        )
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )

    j = base.join(first_copy, "fp").join(hits, "doc_id", "left")
    contaminated = F.coalesce("hit", F.lit(False))
    verdict = (
        F.when(F.col("pred_lang") != "en", F.lit("non_english"))
        .when(F.col("quality") < _KEEP_MIN_QUALITY, F.lit("low_quality"))
        .when(F.col("doc_id") != F.col("first_id"), F.lit("exact_duplicate"))
        .when(contaminated, F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id",
        "pred_lang",
        "quality",
        (F.col("doc_id") == F.col("first_id")).alias("is_first_copy"),
        contaminated.alias("contaminated"),
        verdict.alias("verdict"),
        (verdict == "kept").alias("keep"),
    )


_SQL_CORPUS_KEEP_FILTER = f"""
WITH train AS (
  SELECT * FROM documents WHERE doc_id % {_DECON_EVAL_MOD} <> 0
), m AS (
  SELECT doc_id,
         CASE WHEN ROUND(len(regexp_extract_all(text,
                      '{_STOPWORD_PATTERN}'))
                    / len(string_split(text, ' ')), 4) > 0.03
              THEN 'en' ELSE 'unk' END AS pred_lang,
         ROUND(LEAST(len(string_split(text, ' ')) / 300.0, 1.0) * 0.7
               + LEAST(length(text) / 1500.0, 1.0) * 0.3, 4) AS quality,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
  FROM train
), first_copy AS (
  SELECT fp, MIN(doc_id) AS first_id FROM m GROUP BY fp
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), w0 AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {_DECON_W - 1})) AS pos
  FROM toks WHERE len(t) >= {_DECON_W}
), wins AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(
             t[pos:pos + {_DECON_W - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM w0
), ev AS (
  SELECT DISTINCT g FROM wins WHERE doc_id % {_DECON_EVAL_MOD} = 0
), hits AS (
  SELECT DISTINCT doc_id FROM wins JOIN ev USING (g)
  WHERE doc_id % {_DECON_EVAL_MOD} <> 0
)
SELECT m.doc_id, m.pred_lang, m.quality,
       m.doc_id = f.first_id AS is_first_copy,
       h.doc_id IS NOT NULL AS contaminated,
       CASE WHEN m.pred_lang <> 'en' THEN 'non_english'
            WHEN m.quality < {_KEEP_MIN_QUALITY} THEN 'low_quality'
            WHEN m.doc_id <> f.first_id THEN 'exact_duplicate'
            WHEN h.doc_id IS NOT NULL THEN 'contaminated'
            ELSE 'kept' END AS verdict,
       CASE WHEN m.pred_lang <> 'en' THEN 'non_english'
            WHEN m.quality < {_KEEP_MIN_QUALITY} THEN 'low_quality'
            WHEN m.doc_id <> f.first_id THEN 'exact_duplicate'
            WHEN h.doc_id IS NOT NULL THEN 'contaminated'
            ELSE 'kept' END = 'kept' AS keep
FROM m
JOIN first_copy f USING (fp)
LEFT JOIN hits h USING (doc_id)
"""


QUERIES = {
    "doc_dup_span_coverage": q_doc_dup_span_coverage,
    "stratified_sample_sources": q_stratified_sample_sources,
    "source_cap_sample": q_source_cap_sample,
    "eval_decontaminate": q_eval_decontaminate,
    "corpus_keep_filter": q_corpus_keep_filter,
}

ORACLES = {
    "doc_dup_span_coverage": _SQL_DUP_SPAN,
    "stratified_sample_sources": _SQL_STRATIFIED_SAMPLE,
    "source_cap_sample": _SQL_SOURCE_CAP,
    "eval_decontaminate": _SQL_EVAL_DECONTAMINATE,
    "corpus_keep_filter": _SQL_CORPUS_KEEP_FILTER,
}

"""Ranking/selection operators staged in round 4, REGISTERED at round-5
start (per the registry-freeze discipline: queries must enter the driver
contract at the start of a round to be inside the driver's snapshot window —
see VERDICT.md round 3 finding 1 and ``ops/__init__.py:_SNAPSHOT_ORDER``).
All three were bit-strict DuckDB-parity-tested at sf0.001 AND sf0.01 before
registration (tests/test_staged_next_r5.py).

Operators (all pure native Spark SQL — codegen end to end, no Python in any
plan; every floating sum is carried in BIGINT fixed-point so Spark and
DuckDB agree at the driver's bit-strict float repr regardless of summation
order):

* ``doc_bm25_topk`` — top-k documents by BM25 (k1 = 1.2, b = 0.75,
  Robertson idf as in Lucene) against a fixed 3-term query.  Scale shape:
  the token explode is filtered to the query terms BEFORE the per-(doc,
  term) tf groupBy (map-side predicate, the shuffle carries only matching
  tokens), the 3-row document-frequency table and the 1-row avgdl both
  broadcast, and the top-k is an orderBy+limit (TakeOrdered — never a
  global window).  Per-term scores are scaled to integer micro-units and
  summed exactly.

* ``doc_split_assign`` — deterministic train/val/test split accounting:
  every document is assigned by its md5 bucket (mod 100 → 96/2/2), so the
  split is stable under corpus growth (a doc never migrates between
  splits when new data arrives — the leakage-safety property an eval
  pipeline needs).  Scale shape: map-only assignment, one partial-
  aggregated groupBy (source, split) — integer counts only.

* ``doc_dsir_weight`` — DSIR-style importance weights (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling",
  public-knowledge construction): tokens hash into 64 buckets, the corpus
  bucket distribution is one 64-row aggregate joined back by broadcast,
  and each document's weight is the sum of log(target/corpus) ratios of
  its tokens (uniform target).  The per-bucket log-ratio is computed once
  (≤ 64 distinct ``ln`` arguments), scaled to integer micro-units, and
  per-doc summed exactly in int64.  Scale shape: explode → broadcast hash
  join → one doc-keyed partial-aggregated shuffle; at 10^10 docs the only
  growing cost is the doc-keyed combine, and the bucket table stays
  metadata-sized at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from . import load
from .textops import _hash60

# --------------------------------------------------------------------------
# Q: BM25 top-k documents for a fixed query.
# --------------------------------------------------------------------------

_BM25_TERMS = ("data", "batch", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
_FXP = 1_000_000  # micro-unit fixed point for cross-engine-exact sums


def q_doc_bm25_topk(spark, sf):
    docs = load(spark, sf, "documents")
    lens = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("dl")
    )
    avgdl = lens.agg(F.avg("dl").alias("avgdl"))
    hits = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok").isin(*_BM25_TERMS))
    )
    tf = hits.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("tok").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n)).withColumn(
        "idf",
        F.log(
            (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
            / (F.col("doc_freq") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )
    term = (
        tf.join(F.broadcast(idf.select("tok", "idf")), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "sc",
            F.round(
                F.col("idf")
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
                * _FXP
            ).cast("bigint"),
        )
    )
    return (
        term.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tf").alias("n_hits"),
            F.sum("sc").alias("sc_fxp"),
        )
        # Sort + limit BEFORE projecting sc_fxp away: the top-k tiebreak must
        # bind to the exact fixed-point sum, not rely on Spark resolving a
        # hidden column through the projection.
        .orderBy(F.desc("sc_fxp"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
        .select(
            "doc_id",
            "n_terms",
            "n_hits",
            (F.col("sc_fxp") / _FXP).alias("bm25"),
        )
    )


_SQL_BM25_TOPK = f"""
WITH lens AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), avgdl AS (
  SELECT AVG(dl) AS avgdl FROM lens
), hits AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok IN ('data', 'batch', 'window')
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq FROM hits GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), idf AS (
  -- 0.5e0/1.0e0: scientific notation parses as DOUBLE, keeping the whole
  -- chain in the same IEEE-754 ops Spark uses (a bare 0.5 would be DECIMAL)
  SELECT tok, ln((n_docs - doc_freq + 0.5e0) / (doc_freq + 0.5e0) + 1.0e0)
         AS idf
  FROM dfreq CROSS JOIN n
), term AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ROUND(idf.idf * (tf.tf * ({_BM25_K1}e0 + 1))
              / (tf.tf + {_BM25_K1}e0
                 * (1 - {_BM25_B}e0 + {_BM25_B}e0 * lens.dl / avgdl.avgdl))
              * {_FXP}) AS BIGINT) AS sc
  FROM tf JOIN idf USING (tok) JOIN lens USING (doc_id) CROSS JOIN avgdl
)
SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(tf) AS BIGINT) AS n_hits,
       SUM(sc) / {_FXP} AS bm25
FROM term GROUP BY doc_id
ORDER BY SUM(sc) DESC, doc_id ASC
LIMIT {_BM25_TOPK}
"""

# --------------------------------------------------------------------------
# Q: deterministic train/val/test split accounting.
# --------------------------------------------------------------------------

_SPLIT_DEN = 100  # md5 bucket space: <96 train, <98 val, else test


def q_doc_split_assign(spark, sf):
    docs = load(spark, sf, "documents")
    bucket = _hash60(F.col("doc_id").cast("string")) % _SPLIT_DEN
    split = (
        F.when(bucket < 96, F.lit("train"))
        .when(bucket < 98, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
            F.col("n_chars").cast("bigint").alias("chars"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum("chars").alias("n_chars"),
        )
    )


_SQL_SPLIT_ASSIGN = f"""
WITH assigned AS (
  SELECT source,
         CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % {_SPLIT_DEN} < 96 THEN 'train'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % {_SPLIT_DEN} < 98 THEN 'val'
           ELSE 'test'
         END AS split,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         CAST(n_chars AS BIGINT) AS chars
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(chars) AS BIGINT) AS n_chars
FROM assigned GROUP BY source, split
"""

# --------------------------------------------------------------------------
# Q: DSIR-style hashed-n-gram importance weights.
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64


def q_doc_dsir_weight(spark, sf):
    docs = load(spark, sf, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .select("doc_id", (_hash60(F.col("tok")) % _DSIR_BUCKETS).alias("bucket"))
    )
    dist = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    lr = (
        dist.crossJoin(F.broadcast(total))
        .withColumn(
            "lr_fxp",
            F.round(
                F.log(
                    (F.col("total") / F.lit(float(_DSIR_BUCKETS)))
                    / F.col("cnt")
                )
                * _FXP
            ).cast("bigint"),
        )
        .select("bucket", "lr_fxp")
    )
    return (
        toks.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("lr_fxp").alias("w_fxp"),
        )
        .select(
            "doc_id", "n_toks", (F.col("w_fxp") / _FXP).alias("dsir_weight")
        )
    )


_SQL_DSIR_WEIGHT = f"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
), dist AS (
  SELECT bucket, COUNT(*) AS cnt FROM toks GROUP BY bucket
), total AS (
  SELECT COUNT(*) AS total FROM toks
), lr AS (
  SELECT bucket,
         CAST(ROUND(ln((total / {_DSIR_BUCKETS}e0) / cnt)
              * {_FXP}) AS BIGINT) AS lr_fxp
  FROM dist CROSS JOIN total
)
SELECT doc_id, COUNT(*) AS n_toks, SUM(lr_fxp) / {_FXP} AS dsir_weight
FROM toks JOIN lr USING (bucket)
GROUP BY doc_id
"""


QUERIES = {
    "doc_bm25_topk": q_doc_bm25_topk,
    "doc_split_assign": q_doc_split_assign,
    "doc_dsir_weight": q_doc_dsir_weight,
}

ORACLES = {
    "doc_bm25_topk": _SQL_BM25_TOPK,
    "doc_split_assign": _SQL_SPLIT_ASSIGN,
    "doc_dsir_weight": _SQL_DSIR_WEIGHT,
}

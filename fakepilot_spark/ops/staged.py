"""Corpus-statistics operators staged late in round 4, registered at the
start of the current work block (before the driver's round-end snapshot, per
the registry-freeze discipline: queries that enter the contract late get no
CORRECTNESS row — see VERDICT.md round 3, finding 1). All three were
DuckDB-parity-tested at sf0.001 and sf0.01 before registration
(tests/test_staged_r5.py).

Operators (both pure native Spark SQL — codegen end to end, no Python in
any plan):

* ``tfidf_top_terms`` — per-document top-k terms by tf·idf over the
  ``documents`` corpus.  Scale shape: one explode feeding two partial-agg
  shuffles (per-(doc,tok) tf and per-tok document frequency), a key-shuffle
  join on ``tok``, a broadcast 1-row corpus count, and a per-document
  window (strata bounded by per-doc vocabulary, so no mega-partition risk).
  The idf uses ``ln`` with the score ROUNDed to 4 decimals; the distinct
  argument set of the log is tiny (one per distinct doc_freq) and the
  rounding absorbs any last-ulp libm disagreement between the JVM and
  DuckDB — verified bit-strict in tests/test_staged_r5.py.

* ``doc_pii_scrub`` — PII detection + redaction profile: per document the
  email / phone / IPv4 match counts, the scrubbed text's length and md5,
  and a residual-match count (must be 0 — the scrub is self-evidencing).
  The testdata corpus is digit-free word soup, so the operator first
  synthesizes a deterministic PII-bearing suffix from ``doc_id`` arithmetic
  (the established ``webops._synth_raw_urls`` pattern, mirrored bit-for-bit
  by the DuckDB oracle); at production scale the same expressions run on
  the raw ``text`` column.  Scale shape: a single narrow scan→project — no
  shuffle, no UDF, whole-stage codegen over native ``regexp_count`` /
  ``regexp_replace``.

* ``source_mix_weights`` — temperature-resampled (alpha = 0.5) per-source
  training-mix weights; see its docstring for the sqrt determinism note.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from . import load

# --------------------------------------------------------------------------
# Q: per-document TF-IDF top terms.
# --------------------------------------------------------------------------

_TFIDF_K = 3


def q_tfidf_top_terms(spark, sf, k: int = _TFIDF_K):
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfq = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("doc_freq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf", "doc_freq", "score")
    )


_SQL_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tfs AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), dfq AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tfs.doc_id, tfs.tok, tfs.tf, dfq.doc_freq,
         ROUND(tfs.tf * ln(n.n_docs / dfq.doc_freq), 4) AS score
  FROM tfs JOIN dfq USING (tok) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS INT) AS rank, tok, tf, doc_freq, score FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""

# --------------------------------------------------------------------------
# Q: PII detection + redaction profile.
# --------------------------------------------------------------------------

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\+\\d[\\d ]{5,}\\d"
_PII_IP = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


def _synth_pii_body():
    """Deterministic PII-bearing text from ``doc_id`` arithmetic only
    (mirrored bit-for-bit by the SQL CTE below): every 3rd doc an email,
    every 5th a phone, every 7th an IPv4, appended to the real text."""
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 5 == 0,
        F.concat(
            F.lit(" call +1 555 "),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 7 == 0,
        F.concat(F.lit(" from 10."), (d % 256).cast("string"), F.lit(".0.7")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


def q_doc_pii_scrub(spark, sf):
    docs = load(spark, sf, "documents")
    body = _synth_pii_body()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    residual = (
        F.regexp_count(scrubbed, F.lit(_PII_EMAIL))
        + F.regexp_count(scrubbed, F.lit(_PII_PHONE))
        + F.regexp_count(scrubbed, F.lit(_PII_IP))
    )
    return docs.select(
        "doc_id",
        F.regexp_count(body, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(body, F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(body, F.lit(_PII_IP)).alias("n_ips"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrub_hash"),
        residual.alias("n_residual"),
    )


# %-formatting, not f-strings: the regexes carry {m,n} quantifier braces.
_SQL_PII_SCRUB = """
WITH body_t AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id %% 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id %% 5 = 0
                 THEN ' call +1 555 ' || lpad(CAST(doc_id %% 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id %% 7 = 0
                 THEN ' from 10.' || CAST(doc_id %% 256 AS VARCHAR) || '.0.7'
                 ELSE '' END AS body
  FROM documents
), scrub_t AS (
  SELECT doc_id, body,
         regexp_replace(regexp_replace(regexp_replace(
             body, '%(email)s', '<EMAIL>', 'g'),
             '%(phone)s', '<PHONE>', 'g'),
             '%(ip)s', '<IP>', 'g') AS scrubbed
  FROM body_t
)
SELECT doc_id,
       len(regexp_extract_all(body, '%(email)s')) AS n_emails,
       len(regexp_extract_all(body, '%(phone)s')) AS n_phones,
       len(regexp_extract_all(body, '%(ip)s')) AS n_ips,
       length(scrubbed) AS scrubbed_len,
       md5(scrubbed) AS scrub_hash,
       len(regexp_extract_all(scrubbed, '%(email)s'))
       + len(regexp_extract_all(scrubbed, '%(phone)s'))
       + len(regexp_extract_all(scrubbed, '%(ip)s')) AS n_residual
FROM scrub_t
""" % {"email": _PII_EMAIL, "phone": _PII_PHONE, "ip": _PII_IP}


# --------------------------------------------------------------------------
# Q: temperature-resampled source mixing weights (training-mix balancing).
# --------------------------------------------------------------------------


def q_source_mix_weights(spark, sf):
    """Per-source sampling weights w_s ∝ share_s^0.5, the standard
    temperature resampling that up-weights small domains in a training mix.
    alpha is fixed at 0.5 so the power is ``sqrt`` — IEEE-754 requires
    correctly-rounded sqrt, so Spark and DuckDB agree bit-for-bit (a general
    ``pow`` is not correctly-rounded and could diverge in the last ulp).

    Scale shape: one partial-agg shuffle on ``source`` (~10^4 strata, never
    skew-bound because the agg output is one row per source), then two 1-row
    broadcasts (corpus total, normalizer) — no further shuffle.
    """
    docs = load(spark, sf, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n = docs.agg(F.count(F.lit(1)).alias("n_total"))
    sq = per.crossJoin(F.broadcast(n)).withColumn(
        "sq", F.sqrt(F.col("n_docs") / F.col("n_total"))
    )
    z = sq.agg(F.sum("sq").alias("z"))
    return sq.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
        F.round(F.col("sq") / F.col("z"), 6).alias("weight"),
        F.round(F.col("sq") / F.col("z") * F.col("n_total"), 0)
        .cast("bigint")
        .alias("target_docs"),
    )


_SQL_SOURCE_MIX = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), n AS (
  SELECT COUNT(*) AS n_total FROM documents
), sq AS (
  SELECT source, n_docs, n_total, sqrt(n_docs / n_total) AS sq
  FROM per CROSS JOIN n
), z AS (
  SELECT SUM(sq) AS z FROM sq
)
SELECT source, n_docs,
       ROUND(n_docs / n_total, 6) AS share,
       ROUND(sq / z.z, 6) AS weight,
       CAST(ROUND(sq / z.z * n_total, 0) AS BIGINT) AS target_docs
FROM sq CROSS JOIN z
"""


QUERIES = {
    "tfidf_top_terms": q_tfidf_top_terms,
    "doc_pii_scrub": q_doc_pii_scrub,
    "source_mix_weights": q_source_mix_weights,
}

ORACLES = {
    "tfidf_top_terms": _SQL_TFIDF_TOPK,
    "doc_pii_scrub": _SQL_PII_SCRUB,
    "source_mix_weights": _SQL_SOURCE_MIX,
}

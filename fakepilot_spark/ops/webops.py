"""Web-corpus pipeline operators: URL canonicalization, repetition-quality
profiling, and GROUPING SETS aggregation.

These extend the training-data-pipeline surface (SURVEY.md §2.4) with three
operators any crawl-to-corpus pipeline needs before the dedup/similarity
stages run:

* **URL canonicalization** — the normalization pass in front of the crawl
  engine's URL-seen set (``crawl/engine.py``): scheme/host case-folding,
  default-port stripping, fragment removal, tracking-parameter (``utm_*``)
  removal, trailing-slash collapse.  Messy variants are synthesized
  deterministically from ``documents`` (same pattern as
  ``crawlops._synth_frontier``) so DuckDB can verify the exact row set.
  All string surgery is native ``regexp_replace``/``regexp_extract`` —
  whole-stage codegen, no Python.  The only shuffle is the final groupBy on
  the canonical key, which is exactly the shuffle the URL-seen dedupe needs
  anyway; at 10^10 URLs this is a plain hash aggregate.

* **Repetition-quality profile** — the Gopher-style intra-document
  repetition filters (top-unigram mass fraction, duplicate-bigram mass
  fraction) published in Rae et al. 2021 (public paper); the standard
  pre-training quality gate that complements the *cross*-document dedup in
  :mod:`textops`.  Both metrics are integer counts with the keep-decision
  made by integer cross-multiplication, so the oracle comparison is exact
  with no float rounding.  Every shuffle is keyed by ``doc_id`` (explode →
  count per (doc, gram) → re-aggregate per doc): partial aggregation
  applies, no global ordering, no skew beyond a single document's vocabulary
  — scales linearly in corpus size.

* **GROUPING SETS** — the general primitive behind the existing CUBE /
  ROLLUP operators (``relational.py``): an explicit set list with
  ``grouping_id`` disambiguation, still one pass / one shuffle (Spark
  expands the sets map-side before the aggregate exchange).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from . import load

# --------------------------------------------------------------------------
# Q: URL canonicalization — normalize messy variants, group by canonical.
# --------------------------------------------------------------------------

_N_HOSTS = 16
_N_PATHS = 40
_N_REFS = 4


def _synth_raw_urls(spark, sf):
    """Deterministic messy URLs from ``documents`` (doc_id arithmetic only,
    mirroring the DuckDB CTE bit-for-bit): mixed-case scheme/host, default
    :443 port, utm_ tracking params, #fragments, trailing slashes."""
    d = F.col("doc_id")
    scheme = (
        F.when(d % 3 == 0, F.lit("https"))
        .when(d % 3 == 1, F.lit("HTTPS"))
        .otherwise(F.lit("Https"))
    )
    host = F.concat(
        F.when(d % 2 == 0, F.lit("Host")).otherwise(F.lit("host")),
        (d % _N_HOSTS).cast("string"),
        F.lit(".Example.COM"),
    )
    port = F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/review/r"),
        (d % _N_PATHS).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("?utm_source=feed&ref="), (d % _N_REFS).cast("string")),
        )
        .when(d % 3 == 1, F.concat(F.lit("?ref="), (d % _N_REFS).cast("string")))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 2 == 1, F.lit("#reviews")).otherwise(F.lit(""))
    raw = F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    return load(spark, sf, "documents").select(d.alias("doc_id"), raw.alias("raw_url"))


def q_url_canonicalize(spark, sf):
    """Canonical-URL dedup groups: the normalization in front of URL-seen.

    Five native-regex rewrites (fragment, utm_*, case-fold scheme://host,
    default port, trailing slash), then one hash aggregate on the canonical
    key.  Mirrors what ``crawl/engine.py`` would run on frontier expansion
    output before the bloom/cuckoo membership test.
    """
    raw = _synth_raw_urls(spark, sf)
    u = F.regexp_replace(F.col("raw_url"), r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"utm_[a-z_]+=[^&]*&", "")  # utm followed by more
    u = F.regexp_replace(u, r"[?&]utm_[a-z_]+=[^&]*$", "")  # trailing utm
    prefix = F.regexp_extract(u, r"^[a-zA-Z]+://[^/?#]+", 0)
    rest = u.substr(F.length(prefix) + F.lit(1), F.length(u))
    cprefix = F.regexp_replace(F.lower(prefix), r":443$", "")
    crest = F.regexp_replace(F.regexp_replace(rest, r"/\?", "?"), r"/$", "")
    canonical = F.concat(cprefix, crest)
    return (
        raw.select(F.col("doc_id"), canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


_SQL_RAW_URL_CTE = f"""
WITH raw AS (
  SELECT doc_id,
         (CASE doc_id % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS'
               ELSE 'Https' END)
         || '://'
         || (CASE WHEN doc_id % 2 = 0 THEN 'Host' ELSE 'host' END)
         || (doc_id % {_N_HOSTS}) || '.Example.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
         || '/review/r' || (doc_id % {_N_PATHS})
         || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
         || (CASE doc_id % 3
               WHEN 0 THEN '?utm_source=feed&ref=' || (doc_id % {_N_REFS})
               WHEN 1 THEN '?ref=' || (doc_id % {_N_REFS})
               ELSE '' END)
         || (CASE WHEN doc_id % 2 = 1 THEN '#reviews' ELSE '' END)
           AS raw_url
  FROM documents
)
"""

_SQL_URL_CANONICALIZE = (
    _SQL_RAW_URL_CTE
    + r"""
, stripped AS (
  -- 'g' on every replace: Spark's regexp_replace is always-global, DuckDB's
  -- default is first-match-only; without the flag a URL carrying two utm_*
  -- params would canonicalize differently in the two engines
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(
             raw_url, '#.*$', '', 'g'), 'utm_[a-z_]+=[^&]*&', '', 'g'),
             '[?&]utm_[a-z_]+=[^&]*$', '', 'g') AS u
  FROM raw
), split AS (
  SELECT doc_id, u,
         regexp_extract(u, '^[a-zA-Z]+://[^/?#]+') AS prefix
  FROM stripped
), canon AS (
  SELECT doc_id,
         regexp_replace(lower(prefix), ':443$', '', 'g')
         || regexp_replace(regexp_replace(
              substring(u, length(prefix) + 1), '/\?', '?', 'g'), '/$', '', 'g')
           AS canonical_url
  FROM split
)
SELECT canonical_url,
       COUNT(*) AS n_variants,
       MIN(doc_id) AS min_doc_id
FROM canon
GROUP BY canonical_url
"""
)

# --------------------------------------------------------------------------
# Q: repetition-quality profile (Gopher-style intra-doc repetition gates).
# --------------------------------------------------------------------------

# keep thresholds as exact rationals (integer cross-multiplication):
# top unigram <= 1/5 of token mass, duplicate bigram mass <= 1/4.
_TOP_TOK_DEN = 5
_DUP_BG_DEN = 4


def q_doc_repetition_profile(spark, sf):
    """Per-document repetition metrics + keep flag (Rae et al. 2021 §A1.1
    style): max single-token mass and mass of bigrams occurring >= 2 times.

    Plan: explode → count per (doc_id, gram) → re-aggregate per doc_id —
    two partial-aggregated hash shuffles keyed by doc_id(+gram), then a
    doc_id-keyed join.  No windows, no sorts, no Python; integer outputs so
    the DuckDB comparison is exact.
    """
    docs = load(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    uni = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("top_tok_count"),
            F.sum("count").alias("n_tokens"),
        )
    )
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
        "ELSE array() END"
    )
    bi = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("count") >= 2, F.col("count")).otherwise(0)).alias(
                "dup_bigram_occ"
            ),
            F.sum("count").alias("n_bigrams"),
        )
    )
    joined = uni.join(bi, "doc_id", "left").select(
        "doc_id",
        "top_tok_count",
        "n_tokens",
        F.coalesce("dup_bigram_occ", F.lit(0)).alias("dup_bigram_occ"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
    )
    keep = (
        F.col("top_tok_count") * _TOP_TOK_DEN <= F.col("n_tokens")
    ) & (F.col("dup_bigram_occ") * _DUP_BG_DEN <= F.col("n_bigrams"))
    return joined.withColumn("keep", keep)


_SQL_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), uni AS (
  SELECT doc_id, MAX(c) AS top_tok_count, CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(l) AS tok FROM toks)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
), bi AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS dup_bigram_occ,
         CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i + 1])) AS bg
      FROM toks
    ) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT uni.doc_id, top_tok_count, n_tokens,
       COALESCE(dup_bigram_occ, 0) AS dup_bigram_occ,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       (top_tok_count * {_TOP_TOK_DEN} <= n_tokens
        AND COALESCE(dup_bigram_occ, 0) * {_DUP_BG_DEN}
            <= COALESCE(n_bigrams, 0)) AS keep
FROM uni LEFT JOIN bi USING (doc_id)
"""

# --------------------------------------------------------------------------
# Q: GROUPING SETS — explicit set list with grouping_id, one-pass aggregate.
# --------------------------------------------------------------------------


def q_grouping_sets_revenue(spark, sf):
    """((status, priority), (status), ()) in one shuffle; ``gid``
    disambiguates subtotal rows from genuine NULL groups.  Decimal-exact
    money sum (same convention as ``relational.q_order_status_priority_cube``).
    """
    orders = load(spark, sf, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


_SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


QUERIES = {
    "url_canonicalize": q_url_canonicalize,
    "doc_repetition_profile": q_doc_repetition_profile,
    "grouping_sets_revenue": q_grouping_sets_revenue,
}

ORACLES = {
    "url_canonicalize": _SQL_URL_CANONICALIZE,
    "doc_repetition_profile": _SQL_REPETITION,
    "grouping_sets_revenue": _SQL_GROUPING_SETS,
}

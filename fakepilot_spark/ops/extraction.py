"""Extraction queries for the driver contract.

``extract_synth_companies`` / ``extract_synth_reviews`` are the strongest
correctness checks in the suite: pages are synthesized natively from
``documents.doc_id`` (see :mod:`fakepilot_spark.corpus` value rules), parsed
and extracted by the real pandas-UDF pipeline, and the DuckDB oracle predicts
every extracted value **arithmetically** — no HTML involved. A parser or
extractor regression breaks the value-hash immediately.

``extract_fixture_*`` run the same pipeline over the 17 real Trustpilot
fixture pages, value-gated at the driver by VALUES oracles computed through
the pure-Python parse path (see the fixture-oracle note below) and in pytest
by tests/test_spark_extraction.py against valid_data.json.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..corpus import with_synth_page
from ..extract.udfs import make_page_extractor
from ..sources import fixture_pages_df
from . import load

_HOSTS = 50  # un-skewed host spread for the oracle query


def _synth_extracted(spark, sf, nreviews: int):
    docs = load(spark, sf, "documents").select(F.col("doc_id").alias("id"))
    pages = with_synth_page(
        docs, id_col="id", hosts=_HOSTS, skew_mega_host=False,
        reviews_per_page=3, links_per_page=2,
    )
    extract = make_page_extractor(nreviews=nreviews, with_reviews=True, strict=True)
    return pages.select(
        F.col("id").alias("doc_id"), "url", extract("html").alias("x")
    )


def q_extract_synth_companies(spark, sf):
    out = _synth_extracted(spark, sf, nreviews=1)
    return out.select(
        "doc_id",
        "url",
        F.col("x.company.name").alias("name"),
        F.col("x.company.nreviews").alias("nreviews"),
        F.col("x.company.score").alias("score"),
        F.array_join(F.col("x.company.categories"), "|").alias("categories_csv"),
        F.col("x.company.phone").alias("phone"),
        F.col("x.company.email").alias("email"),
        F.col("x.company.address").alias("address"),
        F.col("x.company.is_claimed").alias("is_claimed"),
        F.col("x.company.rating_distribution")[1].alias("pct_1"),
        F.col("x.company.rating_distribution")[5].alias("pct_5"),
    )


_SQL_SYNTH_COMPANIES = f"""
SELECT doc_id,
       'https://host' || (doc_id % {_HOSTS}) || '.example.com/review/c' || doc_id AS url,
       'Company ' || doc_id AS name,
       CASE WHEN doc_id % 97 = 0 THEN NULL ELSE 100 + doc_id % 900 END AS nreviews,
       CASE WHEN doc_id % 97 = 0 THEN NULL
            ELSE (10 + doc_id % 40) / 10.0 END AS score,
       'Category ' || (doc_id % 7) || '|' || 'Category ' || ((doc_id + 3) % 7)
         AS categories_csv,
       CASE WHEN doc_id % 5 = 0 THEN NULL
            ELSE '+1-555-' || (1000 + doc_id % 9000) END AS phone,
       'info@c' || doc_id || '.example.com' AS email,
       'Street ' || (doc_id % 100) || ' Springfield' AS address,
       doc_id % 2 = 0 AS is_claimed,
       ((doc_id * 11 + 1 * 1234) % 10000) / 100.0 AS pct_1,
       ((doc_id * 11 + 5 * 1234) % 10000) / 100.0 AS pct_5
FROM documents
"""


def q_extract_synth_reviews(spark, sf):
    out = _synth_extracted(spark, sf, nreviews=3)
    reviews = out.select(
        "doc_id", F.posexplode(F.col("x.reviews")).alias("i", "r")
    )
    return reviews.select(
        "doc_id",
        "i",
        F.col("r.author_name").alias("author_name"),
        F.col("r.author_id").alias("author_id"),
        F.col("r.is_verified").alias("is_verified"),
        F.col("r.star_rating").alias("star_rating"),
        F.col("r.date").alias("review_date"),
        F.col("r.title").alias("title"),
        F.col("r.content").alias("content"),
        F.col("r.nreviews").alias("author_nreviews"),
        F.col("r.country").alias("country"),
        F.col("r.date_experience").alias("date_experience"),
    )


_SQL_SYNTH_REVIEWS = """
SELECT doc_id,
       CAST(i AS INT) AS i,
       'Reviewer ' || ((doc_id * 31 + i) % 1000) AS author_name,
       'u' || doc_id || 'x' || i AS author_id,
       (doc_id + i) % 2 = 0 AS is_verified,
       CAST(1 + (doc_id + i) % 5 AS DOUBLE) AS star_rating,
       TIMESTAMP '2025-01-01 00:00:00'
         + INTERVAL (doc_id * 131 + i * 17) MINUTE AS review_date,
       'Title ' || ((doc_id + i) % 50) AS title,
       CASE WHEN (doc_id + i) % 7 = 0 THEN ''
            ELSE 'Review body ' || doc_id || ' part ' || i END AS content,
       CAST(1 + (doc_id + i) % 30 AS INT) AS author_nreviews,
       (['US','FR','ES','NO','DK'])[CAST((doc_id + i) % 5 AS INT) + 1] AS country,
       TIMESTAMP '2025-01-01 00:00:00'
         + INTERVAL ((doc_id + i) % 365) DAY AS date_experience
FROM documents, range(3) t(i)
"""


def q_extract_fixture_companies(spark, sf):
    pages = fixture_pages_df(spark)
    extract = make_page_extractor(nreviews=1, with_reviews=False, strict=True)
    out = pages.select("url", extract("html").alias("x"))
    return out.select(
        "url",
        F.col("x.company.name").alias("name"),
        F.col("x.company.nreviews").alias("nreviews"),
        F.col("x.company.score").alias("score"),
        F.col("x.company.email").alias("email"),
        F.col("x.company.is_claimed").alias("is_claimed"),
    )


def q_extract_fixture_reviews(spark, sf):
    pages = fixture_pages_df(spark)
    extract = make_page_extractor(nreviews=100, with_reviews=True, strict=True)
    out = pages.select("url", extract("html").alias("x"))
    return out.select("url", F.posexplode("x.reviews").alias("i", "r")).select(
        "url",
        "i",
        F.col("r.author_name").alias("author_name"),
        F.col("r.star_rating").alias("star_rating"),
        F.col("r.content").alias("content"),
        F.col("r.date").alias("review_date"),
    )


QUERIES = {
    "extract_synth_companies": q_extract_synth_companies,
    "extract_synth_reviews": q_extract_synth_reviews,
    "extract_fixture_companies": q_extract_fixture_companies,
    "extract_fixture_reviews": q_extract_fixture_reviews,
}

# --------------------------------------------------------------------------
# Fixture VALUES oracles: real-page HTML extraction has no SQL equivalent,
# but the expected rows do — they are computed through the PURE-PYTHON
# parse+fields path (no Spark, no Arrow, no UDF plumbing), which is itself
# byte-identity-gated against the reference's own valid_data.json
# (tests/test_golden_extraction.py). The driver's hash compare of the Spark
# pipeline against these literals therefore value-checks the whole
# JVM/Arrow/pandas-UDF data path against an independently-gated
# implementation of the same semantics.
# --------------------------------------------------------------------------


def _sql_lit(v) -> str:
    import datetime as _dt

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    return "'" + str(v).replace("'", "''") + "'"


def _fixture_expected():
    """(company_rows, review_rows) via the pure-Python extraction path, in
    the exact column order of the two fixture queries."""
    import zipfile

    from ..extract.fields import company_record, review_records
    from ..htmlmini import parse
    from ..sources import FIXTURE_ZIP, fixture_url

    companies, reviews = [], []
    with zipfile.ZipFile(FIXTURE_ZIP) as zf:
        for info in sorted(zf.infolist(), key=lambda i: i.filename):
            dom = parse(zf.read(info.filename))
            url = fixture_url(info.filename)
            c = company_record(dom)
            companies.append(
                (url, c["name"], c["nreviews"], c["score"], c["email"],
                 c["is_claimed"])
            )
            for i, r in enumerate(review_records(dom, 100)):
                reviews.append(
                    (url, i, r["author_name"], r["star_rating"], r["content"],
                     r["date"])
                )
    return companies, reviews


def _values_sql(rows, cols, types) -> str:
    typed = ", ".join(
        f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types)
    )
    values = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    return (
        f"SELECT {typed} FROM (VALUES\n{values}\n) AS t({', '.join(cols)})"
    )


def _sql_fixture_companies() -> str:
    companies, _ = _fixture_expected()
    return _values_sql(
        companies,
        ["url", "name", "nreviews", "score", "email", "is_claimed"],
        ["VARCHAR", "VARCHAR", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN"],
    )


def _sql_fixture_reviews() -> str:
    _, reviews = _fixture_expected()
    return _values_sql(
        reviews,
        ["url", "i", "author_name", "star_rating", "content", "review_date"],
        ["VARCHAR", "INTEGER", "VARCHAR", "DOUBLE", "VARCHAR", "TIMESTAMP"],
    )


ORACLES = {
    "extract_synth_companies": _SQL_SYNTH_COMPANIES,
    "extract_synth_reviews": _SQL_SYNTH_REVIEWS,
    "extract_fixture_companies": _sql_fixture_companies(),
    "extract_fixture_reviews": _sql_fixture_reviews(),
}


# --------------------------------------------------------------------------
# Q: search-result card extraction over synthetic search pages — the
# north-star "company search-result cards" surface (SURVEY.md §2.3), value-
# checked arithmetically by the oracle.
# --------------------------------------------------------------------------

_CARDS = 8
_UNIVERSE = 100_000


def q_extract_search_cards(spark, sf):
    from ..corpus import with_synth_search_page
    from ..extract.udfs import make_search_extractor

    docs = load(spark, sf, "documents").select(F.col("doc_id").alias("id"))
    pages = with_synth_search_page(docs, cards_per_page=_CARDS, universe=_UNIVERSE)
    extract = make_search_extractor()
    out = pages.select(F.col("id").alias("query_id"), extract("html").alias("cards"))
    return out.select(
        "query_id", F.posexplode("cards").alias("card_idx", "c")
    ).select(
        "query_id",
        "card_idx",
        F.col("c.name").alias("name"),
        F.col("c.company_url").alias("company_url"),
        F.col("c.score").alias("score"),
        F.col("c.nreviews").alias("nreviews"),
        F.col("c.location").alias("location"),
        F.col("c.category").alias("category"),
    )


_SQL_SEARCH_CARDS = f"""
WITH cards AS (
  SELECT doc_id AS query_id,
         CAST(j AS INT) AS card_idx,
         (doc_id * 53 + j * 17) % {_UNIVERSE} AS c
  FROM documents, range({_CARDS}) t(j)
)
SELECT query_id, card_idx,
       'Company ' || c AS name,
       '/review/c' || c AS company_url,
       (10 + c % 40) / 10.0 AS score,
       CAST(1000 + c % 9000 AS INT) AS nreviews,
       'City ' || (c % 50) AS location,
       'Category ' || (c % 7) AS category
FROM cards
"""

QUERIES["extract_search_cards"] = q_extract_search_cards
ORACLES["extract_search_cards"] = _SQL_SEARCH_CARDS

"""Vectorized (Arrow-batched) extraction UDFs.

The JVM hands the Python worker one Arrow batch of ``html`` blobs at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory); each
blob is parsed once and every field extracted from that single DOM — the
reference's per-document cost, amortized per batch, with zero per-row
JVM↔Python round trips (input hint, ``BASELINE.json:15``).

Two modes:

* ``strict=True`` — any malformed page raises, exactly like the reference
  (used by the golden-gate tests).
* ``strict=False`` — per-page failures are captured in the ``error`` field so
  one bad page among 10^10 never kills a stage (the crawl-scale default).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

from ..htmlmini import parse
from .fields import company_record, link_hrefs, review_records
from .schemas import PAGE_EXTRACT_STRUCT

__all__ = ["make_page_extractor"]


def _extract_batch(html: pd.Series, nreviews, with_reviews, with_links, strict):
    import gc

    # The DOM is acyclic (no parent pointers) → refcounting reclaims
    # everything; generational GC only adds cache-thrashing scans over
    # millions of short-lived nodes. Disable it for the batch.
    gc_was_enabled = gc.isenabled()
    gc.disable()
    companies, reviews, links, errors = [], [], [], []
    for blob in html:
        company = review_list = link_list = error = None
        try:
            dom = parse(blob)
            raw = company_record(dom)
            raw["company_url"] = raw.pop("url")
            company = raw
            if with_reviews:
                review_list = review_records(dom, nreviews)
            if with_links:
                # only absolute links are frontier candidates (the crawl
                # engine and the single-threaded oracle both apply exactly
                # this filter); dropping relative hrefs here keeps thousands
                # of dead strings per page out of the Arrow result batch.
                link_list = [h for h in link_hrefs(dom) if h.startswith("http")]
        except Exception as exc:  # noqa: BLE001 - converted to data, not control flow
            if strict:
                raise
            company = review_list = link_list = None
            error = f"{type(exc).__name__}: {exc}"
        companies.append(company)
        reviews.append(review_list)
        links.append(link_list)
        errors.append(error)
    if gc_was_enabled:
        gc.enable()
    return pd.DataFrame(
        {"company": companies, "reviews": reviews, "links": links, "error": errors}
    )


def make_page_extractor(
    nreviews: int = 100,
    with_reviews: bool = True,
    with_links: bool = False,
    strict: bool = False,
):
    """Build a pandas UDF ``html:binary -> struct<company, reviews, links, error>``.

    ``with_links=True`` returns ABSOLUTE anchor hrefs only (those starting
    with ``http``): links feed the crawl frontier, and both the engine and
    the single-threaded oracle apply exactly this filter. Consumers that
    need every raw href (relative ones included) should use
    :func:`fakepilot_spark.extract.fields.link_hrefs` on a parsed page
    instead.

    Usage::

        extract = make_page_extractor(nreviews=100, with_links=True)
        out = pages.select("url", extract("html").alias("x"))
        companies = out.select("url", "x.company.*")
        reviews = out.select("url", F.posexplode("x.reviews"))
    """

    @pandas_udf(PAGE_EXTRACT_STRUCT)
    def extract(html: pd.Series) -> pd.DataFrame:
        return _extract_batch(html, nreviews, with_reviews, with_links, strict)

    return extract


def make_search_extractor(limit: int | None = None):
    """pandas UDF ``html:binary -> array<struct>`` of search-result cards."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from .search import search_card_records

    schema = ArrayType(
        StructType(
            [
                StructField("name", StringType(), True),
                StructField("company_url", StringType(), True),
                StructField("score", DoubleType(), True),
                StructField("nreviews", IntegerType(), True),
                StructField("location", StringType(), True),
                StructField("category", StringType(), True),
            ]
        )
    )

    @pandas_udf(schema)
    def extract_cards(html: pd.Series) -> pd.Series:
        # same batch-loop shape as _extract_batch: one pass over the Arrow
        # batch with generational GC off for the parse-heavy span (the DOM
        # is acyclic — refcounting reclaims it; gen-GC only thrashes).
        import gc

        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            cards = [search_card_records(blob, limit=limit) for blob in html]
        finally:
            if gc_was_enabled:
                gc.enable()
        return pd.Series(cards, index=html.index, dtype=object)

    return extract_cards

"""Deterministic synthetic Trustpilot-style page corpus — built with native
Spark expressions only (whole-stage codegen end to end; no Python in the data
path), so corpus generation scales to any row count a cluster can enumerate
with ``spark.range``.

Pages carry the exact DOM markers the extraction semantics key on (see
FIXTURES.md §1.2 and the reference markers at
/root/reference/src/fakepilot/xray.py + __init__.py), with every field value a
pure arithmetic function of the page id. That makes the extraction UDF
oracle-checkable: a SQL engine can predict the extracted values from the id
without parsing HTML.

Value rules (id = page id, i = review index; all integer arithmetic):

==================  =========================================================
field               rule
==================  =========================================================
host_id             id % hosts  (or mega-host skew: id%3==0 → host 0)
url                 'https://host{host_id}.example.com/review/c{id}'
name                'Company {id}'                       (comment-split in h1)
nreviews            NULL if id%97==0 (closed page) else 100 + id%900
score               NULL if id%97==0 else (10 + id%40)/10.0
categories          ['Category {id%7}', 'Category {(id+3)%7}']
phone               NULL if id%5==0 else '+1-555-{1000 + id%9000}'
email               'info@c{id}.example.com'
address             'Street {id%100} Springfield'
is_claimed          id%2 == 0
star pct (s=1..5)   ((id*11 + s*1234) % 10000)/100.0    (two-decimal exact)
review author_name  'Reviewer {(id*31+i)%1000}'
review author_id    'u{id}x{i}'
review is_verified  (id+i)%2 == 0
review star_rating  (1 + (id+i)%5) as double
review date         ts'2025-01-01' + (id*131 + i*17) minutes
review title        'Title {(id+i)%50}'
review content      '' if (id+i)%7==0 else 'Review body {id} part {i}'
review nreviews     1 + (id+i)%30
review country      ['US','FR','ES','NO','DK'][(id+i)%5]
review date_exp     ts'2025-01-01' + ((id+i)%365) days
link k              url of page ((id + 1 + k*977) * 48271) % n_pages
==================  =========================================================
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["with_synth_page", "synth_pages", "REVIEW_COUNTRIES"]

REVIEW_COUNTRIES = ("US", "FR", "ES", "NO", "DK")

_BASE_TS = "2025-01-01 00:00:00"
_STAR_WORDS = ("one", "two", "three", "four", "five")


def _host_id(pid: Column, hosts: int, skew: bool) -> Column:
    if skew:
        # Mega-host fan-out (trustpilot.com analogue): one host owns ~1/3 of
        # all URLs — this is what exercises salting + AQE skew handling.
        return F.when(pid % 3 == 0, F.lit(0)).otherwise(1 + F.pmod(pid * 2654435761, F.lit(hosts - 1)))
    return F.pmod(pid, F.lit(hosts))


def _url_of(pid: Column, hosts: int, skew: bool) -> Column:
    return F.concat(
        F.lit("https://host"),
        _host_id(pid, hosts, skew).cast("string"),
        F.lit(".example.com/review/c"),
        pid.cast("string"),
    )


def _review_card(pid: Column, i: Column) -> Column:
    """One review card (markers per xray.py:216-339 / FIXTURES.md §1.2)."""
    base = F.lit(_BASE_TS).cast("timestamp")
    review_ts = F.timestamp_add("MINUTE", (pid * 131 + i * 17).cast("int"), base)
    exp_ts = F.timestamp_add("DAY", F.pmod(pid + i, F.lit(365)).cast("int"), base)
    star = (1 + F.pmod(pid + i, F.lit(5))).cast("string")
    content_block = F.when(
        F.pmod(pid + i, F.lit(7)) == 0, F.lit("")
    ).otherwise(
        F.concat(
            F.lit('<p data-service-review-text-typography="true">Review body '),
            pid.cast("string"),
            F.lit(" part "),
            i.cast("string"),
            F.lit("</p>"),
        )
    )
    verified_block = F.when(
        F.pmod(pid + i, F.lit(2)) == 0,
        F.lit('<span data-review-label-tooltip-trigger-typography="true">Verified</span>'),
    ).otherwise(F.lit(""))
    country = F.element_at(
        F.array(*[F.lit(c) for c in REVIEW_COUNTRIES]),
        (F.pmod(pid + i, F.lit(5)) + 1).cast("int"),
    )
    return F.concat(
        F.lit('<article data-service-review-card-paper="true">'),
        F.lit('<span data-consumer-name-typography="true">Reviewer '),
        F.pmod(pid * 31 + i, F.lit(1000)).cast("string"),
        F.lit('</span><a data-consumer-profile-link="true" href="/users/u'),
        pid.cast("string"),
        F.lit("x"),
        i.cast("string"),
        F.lit('">profile</a><span data-consumer-reviews-count="'),
        (1 + F.pmod(pid + i, F.lit(30))).cast("string"),
        F.lit('">reviews</span><div data-consumer-country-typography="true">'),
        country,
        F.lit('</div><div data-service-review-rating="'),
        star,
        F.lit('">stars</div>'),
        verified_block,
        F.lit('<time datetime="'),
        F.date_format(review_ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        F.lit('" data-service-review-date-time-ago="true">ago</time>'),
        F.lit('<h2 data-service-review-title-typography="true">Title '),
        F.pmod(pid + i, F.lit(50)).cast("string"),
        F.lit("</h2>"),
        content_block,
        F.lit('<p data-service-review-date-of-experience-typography="true">'),
        F.lit("Date of experience<!-- -->: "),
        F.date_format(exp_ts, "MMMM d, yyyy"),
        F.lit("</p></article>"),
    )


def _star_sidebar(pid: Column) -> Column:
    blocks = [
        F.lit('<div class="styles_businessInfoSideBar__s1">'),
    ]
    for s, word in enumerate(_STAR_WORDS, start=1):
        pct_cents = F.pmod(pid * 11 + s * 1234, F.lit(10000))
        # exact two-decimal rendering: '<int part>.<2-digit cents>'
        pct_str = F.concat(
            ((pct_cents - F.pmod(pct_cents, F.lit(100))) / 100).cast("long").cast("string"),
            F.lit("."),
            F.lpad(F.pmod(pct_cents, F.lit(100)).cast("string"), 2, "0"),
        )
        blocks.append(
            F.concat(
                F.lit(f'<div data-star-rating="{word}">'),
                F.lit('<div class="rating-distribution-row_barValue__b" style="width:'),
                pct_str,
                F.lit('%"></div></div>'),
            )
        )
    blocks.append(F.lit("</div>"))
    return F.concat(*blocks)


def _contact_section(pid: Column) -> Column:
    phone_li = F.when(F.pmod(pid, F.lit(5)) == 0, F.lit("")).otherwise(
        F.concat(
            F.lit('<li class="styles_itemRow__p"><span>+1-555-'),
            (1000 + F.pmod(pid, F.lit(9000))).cast("string"),
            F.lit("</span></li>"),
        )
    )
    return F.concat(
        F.lit("<ul>"),
        phone_li,
        F.lit('<li class="styles_itemRow__e"><span>info@c'),
        pid.cast("string"),
        F.lit('.example.com</span></li>'),
        F.lit('<li class="styles_itemRow__a"><span>Street '),
        F.pmod(pid, F.lit(100)).cast("string"),
        F.lit(' Springfield</span></li>'),
        # Last row is the company-URL row: the reference drops it
        # (xray.py:102-105) — present so that quirk is exercised.
        F.lit('<li class="styles_itemRow__u"><span>c'),
        pid.cast("string"),
        F.lit(".example.com</span></li></ul>"),
    )


def _links_footer(pid: Column, links_per_page: int, n_pages: Column, hosts: int, skew: bool) -> Column:
    anchors = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(links_per_page - 1)),
            lambda k: F.concat(
                F.lit('<a href="'),
                _url_of(F.pmod((pid + 1 + k * 977) * 48271, n_pages), hosts, skew),
                F.lit('">more</a>'),
            ),
        ),
        "",
    )
    return F.concat(F.lit("<footer>"), anchors, F.lit("</footer>"))


def _filler_block(pid: Column, filler_kb: int) -> Column:
    """Realistic tag-soup ballast: real Trustpilot pages are 300 KB–1 MB
    (SURVEY.md §0), mostly markup the extractor must scan past. One repeated
    ~200-byte unit of nested tags + entities, id-salted so pages differ."""
    if filler_kb <= 0:
        return F.lit("")
    unit = (
        '<div class="styles_cell__x9"><span class="typography_bm">lorem ipsum '
        "dolor sit amet consectetur&nbsp;adipiscing elit sed do</span>"
        '<a href="/categories/x" rel="nofollow">category link</a>'
        "<!-- --><p>12&nbsp;345 people reviewed this</p></div>"
    )
    reps = max(1, (filler_kb * 1024) // len(unit))
    return F.concat(
        F.lit('<div id="ballast-'),
        pid.cast("string"),
        F.lit('">'),
        F.repeat(F.lit(unit), reps),
        F.lit("</div>"),
    )


def _page_html(
    pid: Column,
    n_pages: Column,
    hosts: int,
    skew: bool,
    reviews_per_page: int,
    links_per_page: int,
    filler_kb: int = 0,
) -> Column:
    rating_block = F.when(F.pmod(pid, F.lit(97)) == 0, F.lit("")).otherwise(
        F.concat(
            # comment-split count tag on odd ids, single-text on even: both
            # reference branches (xray.py:63-67) stay exercised.
            F.when(
                F.pmod(pid, F.lit(2)) == 1,
                F.concat(
                    F.lit('<p data-reviews-count-typography="true">'),
                    (100 + F.pmod(pid, F.lit(900))).cast("string"),
                    F.lit("<!-- --> <span>total reviews</span></p>"),
                ),
            ).otherwise(
                F.concat(
                    F.lit('<p data-reviews-count-typography="true">'),
                    (100 + F.pmod(pid, F.lit(900))).cast("string"),
                    F.lit(" total</p>"),
                )
            ),
            F.lit('<span data-rating-typography="true">'),
            # exact '<tens>.<ones>' rendering of score*10 = 10 + id%40
            (
                lambda v: F.concat(
                    ((v - F.pmod(v, F.lit(10))) / 10).cast("long").cast("string"),
                    F.lit("."),
                    F.pmod(v, F.lit(10)).cast("string"),
                )
            )(10 + F.pmod(pid, F.lit(40))),
            F.lit("</span>"),
        )
    )
    claimed_block = F.when(
        F.pmod(pid, F.lit(2)) == 0, F.lit("<span>Claimed profile</span>")
    ).otherwise(F.lit(""))
    categories_block = F.concat(
        F.lit('<span data-business-unit-info-category-typography="true"><a>Category '),
        F.pmod(pid, F.lit(7)).cast("string"),
        F.lit('</a></span><span data-business-unit-info-category-typography="true"><a>Category '),
        F.pmod(pid + 3, F.lit(7)).cast("string"),
        F.lit("</a></span>"),
    )
    cards = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(reviews_per_page - 1)),
            lambda i: _review_card(pid, i),
        ),
        "",
    )
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>c</title></head><body>"),
        F.lit('<a class="link_internal__logo" href="/"><img src="/logo.svg"/></a>'),
        F.lit('<h1 class="title_displayName__h">Company '),
        pid.cast("string"),
        F.lit("<!-- --> </h1>"),
        rating_block,
        categories_block,
        claimed_block,
        _star_sidebar(pid),
        _filler_block(pid, filler_kb),
        _contact_section(pid),
        F.lit('<section class="styles_reviewListContainer__r">'),
        cards,
        F.lit("</section>"),
        _links_footer(pid, links_per_page, n_pages, hosts, skew),
        F.lit("</body></html>"),
    )


def with_synth_page(
    df: DataFrame,
    id_col: str = "id",
    n_pages: int | None = None,
    hosts: int = 50,
    skew_mega_host: bool = False,
    reviews_per_page: int = 3,
    links_per_page: int = 4,
    filler_kb: int = 0,
) -> DataFrame:
    """Append ``url, warc_ts, html(binary), text, lang`` derived from an id
    column. ``n_pages`` bounds the link-target id space (defaults to a
    self-join-free constant of 10^6 — pass the real count for closed graphs).
    """
    pid = F.col(id_col).cast("long")
    n = F.lit(n_pages if n_pages is not None else 1_000_000).cast("long")
    html_str = _page_html(
        pid, n, hosts, skew_mega_host, reviews_per_page, links_per_page, filler_kb
    )
    return (
        df.withColumn("url", _url_of(pid, hosts, skew_mega_host))
        .withColumn(
            "warc_ts",
            F.timestamp_add(
                "MINUTE", F.pmod(pid, F.lit(525600)).cast("int"),
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
            ),
        )
        .withColumn("html", F.encode(html_str, "utf-8"))
        .withColumn("text", F.concat(F.lit("Company "), pid.cast("string"), F.lit(" synthetic page")))
        .withColumn("lang", F.element_at(F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("no")), (F.pmod(pid, F.lit(4)) + 1).cast("int")))
    )


def synth_pages(
    spark,
    n_pages: int,
    partitions: int | None = None,
    hosts: int = 101,
    skew_mega_host: bool = True,
    reviews_per_page: int = 3,
    links_per_page: int = 4,
    filler_kb: int = 0,
) -> DataFrame:
    """A fully synthetic crawl corpus of ``n_pages`` pages (PAGE_SCHEMA shape
    plus a ``page_id`` column). Generation is embarrassingly parallel."""
    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    out = with_synth_page(
        base,
        n_pages=n_pages,
        hosts=hosts,
        skew_mega_host=skew_mega_host,
        reviews_per_page=reviews_per_page,
        links_per_page=links_per_page,
        filler_kb=filler_kb,
    )
    return out.withColumnRenamed("id", "page_id")


def materialize_corpus(
    spark,
    path: str,
    n_pages: int,
    files: int = 192,
    buckets: int | None = None,
    **page_kwargs,
) -> DataFrame:
    """Write the synthetic corpus ONCE as a committed Parquet pages table and
    return a reader over it.

    This is the faithful sandbox analogue of the north rule's Iceberg pages
    table (``BASELINE.json:15``): the crawl's fetch join scans committed
    columnar files (column pruning + page-cache-warm re-reads) instead of
    re-generating rows JVM-side on every scan, so the timed crawl measures
    scan → join → extract, not string synthesis. Generation is deterministic
    in ``n_pages`` + ``page_kwargs``; an existing committed table (\\_SUCCESS
    present) is reused as-is.
    """
    from pathlib import Path as _P

    p = _P(path)
    if not (p / "_SUCCESS").exists():
        # uncompressed: the id-salted ballast would otherwise snappy-compress
        # ~300:1, which no real WARC corpus does — stored plain, the scan
        # volume (and the input-split math below) reflects real page bytes.
        df = synth_pages(spark, n_pages, partitions=files, **page_kwargs)
        if buckets:
            # url-hash-bucketed layout: one directory per
            # pbucket = pmod(xxhash64(url), buckets) so the crawl's fetch
            # scan can prune to the buckets an epoch batch actually hits.
            import pyspark.sql.functions as _F

            (
                df.withColumn(
                    "pbucket",
                    _F.pmod(_F.xxhash64("url"), _F.lit(buckets)).cast("int"),
                )
                .repartition(buckets, "pbucket")
                .write.mode("overwrite")
                .option("compression", "none")
                .partitionBy("pbucket")
                .parquet(str(p))
            )
            # record the bucket modulus next to the data (underscore files
            # are invisible to Spark's file index): CrawlEngine refuses to
            # partition-prune with a pages_buckets that doesn't match it,
            # because a wrong modulus silently drops pages from the fetch.
            import json as _json

            (p / "_fps_corpus_meta.json").write_text(
                _json.dumps({"pages_buckets": buckets, "n_pages": n_pages})
            )
        else:
            df.write.mode("overwrite").option("compression", "none").parquet(
                str(p)
            )
    return spark.read.parquet(str(p))


# -- search-result pages (self-defined surface, SURVEY.md §2.3) --------------
#
# Search page q lists CARDS result cards; card j points at company
# c = (q*53 + j*17) % universe and reuses the company-page value rules:
#   name 'Company {c}', href '/review/c{c}', score (10 + c%40)/10,
#   nreviews 1000 + c%9000 (comma-separated in markup when c is even),
#   location 'City {c%50}', category 'Category {c%7}'.


def _search_card(qid: Column, j: Column, universe: Column) -> Column:
    c = F.pmod(qid * 53 + j * 17, universe)
    nrev = 1000 + F.pmod(c, F.lit(9000))
    nrev_plain = nrev.cast("string")
    nrev_sep = F.concat(
        ((nrev - F.pmod(nrev, F.lit(1000))) / 1000).cast("long").cast("string"),
        F.lit(","),
        F.lpad(F.pmod(nrev, F.lit(1000)).cast("string"), 3, "0"),
    )
    score10 = 10 + F.pmod(c, F.lit(40))
    score_str = F.concat(
        ((score10 - F.pmod(score10, F.lit(10))) / 10).cast("long").cast("string"),
        F.lit("."),
        F.pmod(score10, F.lit(10)).cast("string"),
    )
    return F.concat(
        F.lit('<div data-search-result-card="true">'),
        F.lit('<p data-search-result-name-typography="true">Company '),
        c.cast("string"),
        F.lit('<!-- --> </p><a data-search-result-link="true" href="/review/c'),
        c.cast("string"),
        F.lit('">visit</a><span data-search-result-score-typography="true">'),
        score_str,
        F.lit('</span><span data-search-result-reviews-count="'),
        F.when(F.pmod(c, F.lit(2)) == 0, nrev_sep).otherwise(nrev_plain),
        F.lit('">reviews</span><span data-search-result-location-typography="true">City '),
        F.pmod(c, F.lit(50)).cast("string"),
        F.lit('</span><span data-search-result-category-typography="true">Category '),
        F.pmod(c, F.lit(7)).cast("string"),
        F.lit("</span></div>"),
    )


def with_synth_search_page(
    df: DataFrame, id_col: str = "id", cards_per_page: int = 8, universe: int = 100_000
) -> DataFrame:
    """Append ``url`` + ``html`` (binary) search-result pages derived from an
    id column; card values follow the module-level rules (oracle-checkable)."""
    qid = F.col(id_col).cast("long")
    uni = F.lit(universe).cast("long")
    cards = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(cards_per_page - 1)),
            lambda j: _search_card(qid, j, uni),
        ),
        "",
    )
    html_str = F.concat(
        F.lit("<!DOCTYPE html><html><body><h1>Search results</h1>"),
        F.lit('<section class="styles_searchResultsList__q1">'),
        cards,
        F.lit("</section><footer>"),
        # decoy card OUTSIDE the container: list scoping must exclude it
        _search_card(qid, F.lit(99), uni),
        F.lit("</footer></body></html>"),
    )
    return df.withColumn(
        "url",
        F.concat(F.lit("https://www.trustpilot.com/search?query=q"), qid.cast("string")),
    ).withColumn("html", F.encode(html_str, "utf-8"))

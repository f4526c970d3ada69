"""Round-3: close the line-coverage gaps the reference's >=95% bar exposes
(scripts/coverage_gate.py). Pure-Python only — these run under the settrace
tracer, exercising exactly the code the Spark UDF workers execute.

Targets: htmlmini's tolerant malformed-markup fallbacks (differential vs the
stdlib backend, which IS the spec), the traversal/index paths the golden
fixtures never hit, the cache-bound branches, `link_hrefs`, and the
search-card extractor.
"""

from __future__ import annotations

import re

import pytest

from fakepilot_spark import htmlmini
from fakepilot_spark.extract.fields import link_hrefs
from fakepilot_spark.extract.search import search_card_records
from fakepilot_spark.htmlmini import parse, parse_fast, parse_stdlib

from .test_htmlmini import _dom_sig


# -- malformed / fallback tokenizer paths (stdlib backend = spec) ------------

MALFORMED = [
    "<div foo",  # start tag unterminated at EOF
    "<a b=c",  # unquoted attr, EOF
    "<a b=c/>after",  # sloppy self-close via fallback
    "<a b = 'v' href=/u>x</a>",  # spaced '=' rejects the fast regex
    "</",  # bare end-tag opener at EOF
    "</ p>x",  # bogus end tag (space)
    "</p junk>x",  # end tag with trailing junk
    "<b><i>x</b>after",  # mismatched close unwinds the stack
    "<!-- never closed",  # unterminated comment
    "<![CDATA[never closed",  # unterminated marked section
    "<![CDATA[x]]><p>y</p>",
    "<!bogus stuff>x",  # bogus decl -> comment (stdlib routing)
    "<!doctype html><p>x</p>",
    "<!unterminated",  # decl at EOF
    "<?php echo 1",  # unterminated processing instruction
    "<?pi?><p>x</p>",
    "a < b > c",  # lone '<' emits text
    "tail <",  # lone '<' at EOF
    "<script>never ends",  # rawtext unterminated
    "<script>a</script><p>b</p>",
    '<a t="&amp;x" u=\'&lt;\'>e</a>',  # charrefs in attr values (both quotes)
    "<" + "a" * 300 + " href='x'>big</" + "a" * 300 + ">",  # >256-char token skips the start-token cache
    "<p/>selfclosed",
    "<ul><li>a<li>b</ul>",  # implied closes stay open (stdlib semantics)
    # round-4 branch-coverage additions (scripts/coverage_gate.py --list-misses)
    "<a b=c ~>tail",  # junk after attrs: tag truncates at endpos, junk = data
    "<div % >x",  # junk right after the name
    "<a b='v' ^junk>t</a>",  # quoted attr then junk -> truncate path
    "<a b=1/",  # '/' after attr at EOF -> incomplete (goahead recovery)
    "<a b=1=",  # '=' after attr at EOF -> incomplete
    "<a b=1 c",  # stray letter at EOF -> incomplete
    "</@bogus>x",  # end tag with no name -> bogus comment emission
    "</>x",  # '</>' emits nothing at all
    "<a\tb=c>x</a>",  # tab inside tag: unsafe for the fast-token cache
    '<a b="v<w">x</a>',  # '<' inside attr value: unsafe for the fast token
    "<a b c=2>x</a>",  # valueless attr mid-list (rest empty -> "")
    "<a b='1'c=2/>x",  # no-space attrs: fast lane refuses, tolerant '/>'
    "<a b='1'c=2>x</a>",  # same, plain '>' close in the tolerant lane
    '<a b=">x more',  # value opens a quote, never closes: incomplete ('=')
    "<a/",  # bare '/' at EOF: incomplete
    "<a b='1',x",  # comma then letter at EOF: incomplete (stray letter)
    "<a b='1',1>x",  # comma then junk: tag truncates, rest becomes data
    "<![if gte IE]>ms<![endif]>",  # MS conditional marked section
    "<![",  # marked-section opener at EOF (scan_name mid-buffer)
    "<![CDATA",  # keyword ends exactly at EOF
    "<a b='1'c/>x",  # no-space attrs, tolerant '/>' self-close
    "<a b='&amp;1'c=2>x",  # charref attr value in the tolerant lane
    "<a b='1'b='2'c=3>x",  # duplicate attr key: first wins (stdlib)
    "<a\x00>x",  # NUL stops the tag name: TRUNCATED tag emitted raw as data
    "<a\x00 b=c>x",  # same, with attr-looking residue
    "<a\x00b='&amp;'>x",  # truncated span is NOT charref-decoded
]


@pytest.mark.parametrize("markup", MALFORMED)
def test_malformed_markup_matches_stdlib(markup):
    assert _dom_sig(parse_fast(markup)) == _dom_sig(parse_stdlib(markup)), markup


# -- traversal / index paths -------------------------------------------------

DOC = (
    "<html><body>"
    "<div id='a' class='x y'><p class='x'>one</p><p>two</p></div>"
    "<div id='b' class='x'><span>one</span><script>raw one</script></div>"
    "<a href='/r'>link</a><a>nohref</a>"
    "</body></html>"
)


def test_descendants_preorder():
    dom = parse(DOC)
    div = dom.find(attrs={"id": "a"})
    kinds = [getattr(n, "name", "#text") for n in div.descendants]
    assert kinds == ["p", "#text", "p", "#text"]


def test_find_string_with_limit_scoped():
    dom = parse(DOC)
    # duplicate text "one" exists as normal text AND rawtext; the doc index
    # merges value groups across kinds (document-ordered)
    hits_all = dom.find_all(string="one")
    assert len(hits_all) == 2
    sub = dom.find(attrs={"id": "b"})
    assert len(sub.find_all(string="one", limit=1)) == 1
    assert dom.find(string=re.compile("raw")).text == "raw one"


def test_find_callable_name_with_class_filter():
    dom = parse(DOC)
    hits = dom.find_all(lambda t: t.name == "p", class_="x")
    assert len(hits) == 1 and hits[0].string == "one"


def test_find_name_plus_attrs_picks_smaller_candidate_list():
    dom = parse(DOC)
    hit = dom.find("div", attrs={"id": "b"})
    assert hit["id"] == "b"
    assert dom.find("div", attrs={"id": "zzz"}) is None
    assert dom.find("nosuchtag") is None


def test_parser_env_override(monkeypatch):
    monkeypatch.setenv("FAKEPILOT_PARSER", "stdlib")
    assert _dom_sig(parse(DOC)) == _dom_sig(parse_stdlib(DOC))


def test_long_text_segment_bypasses_cache():
    big = "x" * 10_000
    dom = parse(f"<p>{big}&amp;tail</p>")
    assert dom.find("p").string == big + "&tail"


def test_bounded_caches_reset_when_full():
    """Each tokenizer cache clears itself past 100k entries — fill with
    dummies and confirm the next parse both trips the reset and still
    produces a correct DOM."""
    filler = {("pad", i): None for i in range(100_001)}
    for cache in (
        htmlmini._TEXT_CACHE,
        htmlmini._STRNODE_CACHE,
        htmlmini._ATTR_BLOB_CACHE,
        htmlmini._START_TOKEN_CACHE,
    ):
        cache.update(filler)
    dom = parse("<div id='fresh'>text &amp; more</div>")
    assert dom.find("div")["id"] == "fresh"
    assert dom.find("div").string == "text & more"
    assert len(htmlmini._START_TOKEN_CACHE) < 100_001
    assert len(htmlmini._TEXT_CACHE) < 100_001


def test_attr_blob_garbage_stops_cleanly():
    dom = parse("<div a='1' === b='2'>x</div>")
    assert _dom_sig(parse_fast("<div a='1' === b='2'>x</div>")) == _dom_sig(
        parse_stdlib("<div a='1' === b='2'>x</div>")
    )
    assert dom.find("div") is not None


# -- extract surface ---------------------------------------------------------


def test_link_hrefs_document_order():
    dom = parse(DOC)
    assert link_hrefs(dom) == ["/r"]  # href-less anchors skipped


def _card(i, score="3.5", extras=True):
    mid = (
        f'<span data-search-result-score-typography="true">{score}</span>'
        f'<span data-search-result-reviews-count="1,23{i}">reviews</span>'
        f'<span data-search-result-location-typography="true">City {i}</span>'
        f'<span data-search-result-category-typography="true">Category {i}</span>'
        if extras
        else ""
    )
    return (
        '<div data-search-result-card="true">'
        f'<p data-search-result-name-typography="true">Company {i}<!-- --> </p>'
        f'<a data-search-result-link="true" href="/review/c{i}">visit</a>'
        f"{mid}</div>"
    )


def test_search_cards_scoped_to_result_list():
    page = (
        "<html><body>"
        '<section class="styles_searchResultsList__q1">'
        + _card(0)
        + _card(1, score="4,1")
        + "</section>"
        + _card(99)  # decoy outside the list (corpus.py plants one too)
        + "</body></html>"
    )
    cards = search_card_records(page)
    assert [c["name"] for c in cards] == ["Company 0", "Company 1"]
    assert cards[0]["company_url"] == "/review/c0"
    assert cards[0]["nreviews"] == 1230  # thousands separator stripped
    assert cards[1]["score"] == 4.1  # comma decimal
    assert search_card_records(page, limit=1) == cards[:1]


def test_search_cards_whole_page_fallback_and_missing_fields():
    page = "<html><body>" + _card(7, extras=False) + "</body></html>"
    (card,) = search_card_records(page)
    assert card["name"] == "Company 7"
    assert card["score"] is None and card["nreviews"] is None
    assert card["location"] is None and card["category"] is None
    assert search_card_records("<p>no cards here</p>") == []


# -- date fast paths (fields._parse_iso_millis / _parse_month_day_year) ------

import datetime as _dt

import pytest
from hypothesis import given, strategies as st

from fakepilot_spark.extract.fields import (
    _ISO_MILLIS,
    _MONTH_DAY_YEAR,
    _parse_iso_millis,
    _parse_month_day_year,
)


@given(
    st.datetimes(
        # strftime pads the year platform-dependently below 1000; both paths
        # reject 3-digit years identically, but the round-trip needs 4 digits
        min_value=_dt.datetime(1000, 1, 1),
        max_value=_dt.datetime(9999, 12, 31),
    )
)
def test_iso_millis_fast_path_matches_strptime(dt):
    v = dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"
    assert _parse_iso_millis(v) == _dt.datetime.strptime(v, _ISO_MILLIS)


@pytest.mark.parametrize(
    "v",
    [
        "2023-07-04T12:34:56.1Z",       # short fraction (%f accepts 1-6)
        "2023-07-04T12:34:56.123456Z",  # full microseconds
        "0001-01-01T00:00:00.000Z",     # min year
    ],
)
def test_iso_millis_accepts_what_strptime_accepts(v):
    assert _parse_iso_millis(v) == _dt.datetime.strptime(v, _ISO_MILLIS)


@pytest.mark.parametrize(
    "v",
    [
        "2023-+6-04T12:34:56.000Z",   # signed month (int() would take it)
        "2023-07-04T12:34:56.000",    # missing Z
        "2023-07-04 12:34:56.000Z",   # wrong separator
        "garbage",
    ],
)
def test_iso_millis_rejects_what_strptime_rejects(v):
    with pytest.raises(ValueError):
        _parse_iso_millis(v)


@pytest.mark.parametrize(
    "v",
    ["July 4, 2023", "July 04, 2023", "february 1, 0099", "December 31, 9999"],
)
def test_month_day_year_matches_strptime(v):
    # 'february' exercises the case-insensitive strptime fallback
    assert _parse_month_day_year(v) == _dt.datetime.strptime(v, _MONTH_DAY_YEAR)


@pytest.mark.parametrize(
    "v",
    [
        "July 4 2023",        # missing comma
        "July 4, 2023 ",      # trailing space (int() would strip it)
        "July 004, 2023",     # 3-digit day (%d takes at most 2)
        "Smarch 4, 2023",     # unknown month
    ],
)
def test_month_day_year_rejects_what_strptime_rejects(v):
    with pytest.raises(ValueError):
        _parse_month_day_year(v)


@pytest.mark.parametrize(
    "v",
    [
        "2023-07-04T12:34:56.1234567Z",  # 7-digit fraction (%f caps at 6)
        "2023-07-04T12:34:56.12aZ",      # non-digit fraction
        "2023-07-04T12:34:56.Z",         # empty fraction (%f needs >= 1)
    ],
)
def test_iso_millis_bad_fraction_falls_back_like_strptime(v):
    # passes the positional prefix checks, fails the fraction gate -> the
    # strptime fallback must raise exactly as the reference's strptime does
    with pytest.raises(ValueError):
        _parse_iso_millis(v)


# -- rating-distribution / entry-point branches ------------------------------


def test_rating_distribution_partial_star_rows():
    from fakepilot_spark.extract.fields import _rating_distribution

    html = (
        "<div class='styles_businessInfoSideBar__z'>"
        "<div data-star-rating='two'>"
        "<div class='rating-distribution-row_barValue__q' style='width:12%'>"
        "</div></div></div>"
    )
    dist = _rating_distribution(parse(html))
    # present row parsed, absent star words stay None (row lookup misses)
    assert dist == {1: None, 2: 12.0, 3: None, 4: None, 5: None}


def test_extract_page_without_reviews():
    import zipfile

    from fakepilot_spark.extract.fields import extract_page

    with zipfile.ZipFile("/root/repo/tests/data/text_files.zip") as zf:
        html = zf.read("www.granada.no.txt").decode("utf-8")
    record = extract_page(html, with_reviews=False)
    assert "reviews" not in record and record["name"]


# -- doc-index traversal branches (round-4 branch gate) -----------------------

SPAN_DOC = (
    "<html><body>"
    "<div id='a' class='x'><p>one</p></div>"
    "<div id='b' class='x'><p>one</p></div>"
    "<a href='/r'>link</a>"
    "</body></html>"
)


def test_subtree_find_prunes_hits_after_span_end():
    dom = parse(SPAN_DOC)
    first = dom.find(attrs={"id": "a"})
    # the second "one" and the href posting sit AFTER the subtree span:
    # the index walks must break at hi, not scan to document end
    assert len(first.find_all(string="one")) == 1
    assert first.find_all(attrs={"href": "/r"}) == []
    assert len(dom.find_all(string="one")) == 2


def test_multi_attr_candidates_and_mismatches():
    dom = parse(DOC)
    # two attr keys: candidate list = the rarer key's postings; the <a href>
    # node lacks 'id' entirely (got-None reject) and the second key's
    # posting list is not shorter (keeps the first candidate list)
    assert dom.find_all(attrs={"href": "/r", "id": "a"}) == []
    # multi-valued 'class' key inside _match_attrs, match and mismatch
    assert dom.find(attrs={"class": "x", "id": "a"})["id"] == "a"
    assert dom.find_all(attrs={"class": "zzz", "id": "a"}) == []
    # name-driven scan with an attrs mismatch on the candidate
    assert dom.find_all("a", attrs={"href": "/nope"}) == []
    # class-driven scan with an attrs mismatch
    assert dom.find_all(class_="x", attrs={"id": "zzz"}) == []


def test_exact_string_matcher_non_regex():
    from fakepilot_spark.htmlmini import _match_str

    assert _match_str("one", "one")
    assert not _match_str("one", "two")


def test_equal_long_texts_are_distinct_index_groups():
    # long segments bypass the intern cache -> equal VALUES arrive as
    # distinct objects and the id()-keyed text groups must merge them
    big = "y" * 10_000
    dom = parse(f"<p>{big}</p><div>{big}</div>")
    assert len(dom.find_all(string=big)) == 2


@pytest.mark.parametrize(
    "markup",
    [
        "<![ spaced]]>x",     # no name token at the section start
        "<![bogus kw]]>x",    # name token but unknown status keyword
    ],
)
def test_marked_section_asserts_like_stdlib(markup):
    # html.parser itself raises AssertionError here; bs4-on-stdlib (the
    # reference's configuration) propagates it, so both backends must crash
    # identically rather than recover
    with pytest.raises(AssertionError):
        parse_stdlib(markup)
    with pytest.raises(AssertionError):
        parse_fast(markup)


def test_find_callable_with_attrs_mismatch():
    dom = parse(DOC)
    # callable-name scan path with a failing attrs filter
    assert dom.find_all(lambda t: t.name == "a", attrs={"href": "/nope"}) == []
    # regex attr values route through the generic posting-list scan (no
    # value-index fast path), inside and outside a subtree span
    assert dom.find_all("a", attrs={"href": re.compile("nope")}) == []
    first = dom.find(attrs={"id": "a"})
    assert first.find_all(attrs={"href": re.compile(".")}) == []
    # name mismatch on an attr-selected candidate, and the limit early-out
    # inside the generic posting-list scan
    assert dom.find_all("div", attrs={"href": re.compile(".")}) == []
    # the limit early-out inside the generic posting-list scan
    # (find() islices instead of passing limit, so request it explicitly)
    assert dom.find_all(attrs={"id": re.compile(".")}, limit=1)[0]["id"] == "a"

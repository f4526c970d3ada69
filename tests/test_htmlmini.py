"""Unit tests for the bs4-semantics subset htmlmini must honor.

Each case pins a behavior the extraction layer depends on (citations to the
reference usage site in /root/reference/src/fakepilot/).
"""

import re

from fakepilot_spark.htmlmini import parse


def test_comment_splits_text_nodes():
    # xray.py:43-45 — next(tag.strings) must stop before the comment split.
    dom = parse("<h1 class='title_displayName'>Sumeria<!-- --> </h1>")
    tag = dom.find(class_=re.compile("title_displayName"))
    assert list(tag.strings) == ["Sumeria", " "]
    assert next(tag.strings) == "Sumeria"


def test_string_none_when_multiple_children():
    dom = parse("<p id='x'>16,327<!-- --> <span>total</span></p>")
    tag = dom.find(attrs={"id": "x"})
    assert tag.string is None
    assert next(tag.strings) == "16,327"


def test_string_recurses_single_child_chain():
    # xray.py:120-128 — categories are li > a > text chains.
    dom = parse("<li id='c'><a href='/x'>Bank</a></li>")
    assert dom.find(attrs={"id": "c"}).string == "Bank"


def test_entity_decoding_nbsp():
    # xray.py:70 strips \xa0 thousand separators produced by &nbsp;.
    dom = parse("<span id='n'>16&nbsp;327</span>")
    assert dom.find(attrs={"id": "n"}).string == "16\xa0327"


def test_class_regex_multivalued():
    # bs4 matches the regex against each whitespace-split class token.
    dom = parse("<div class='card styles_reviewListContainer__kkBNk wide'>x</div>")
    assert dom.find(class_=re.compile("styles_reviewListContainer")) is not None
    assert dom.find(class_=re.compile("^wide$")) is not None
    assert dom.find(class_=re.compile("absent")) is None


def test_find_all_limit_early_exit():
    # __init__.py:38-40 — limit=nreviews.
    dom = parse("".join(f"<div data-service-review-card-paper>{i}</div>" for i in range(10)))
    cards = dom.find_all(
        lambda t: t.has_attr("data-service-review-card-paper"), limit=3
    )
    assert [c.string for c in cards] == ["0", "1", "2"]


def test_name_and_class_filter():
    # xray.py:95 — find_all("li", class_=re.compile(...)).
    dom = parse(
        "<ul><li class='styles_itemRow__a'>A</li>"
        "<div class='styles_itemRow__b'>not-li</div>"
        "<li class='other'>B</li></ul>"
    )
    rows = dom.find_all("li", class_=re.compile("styles_itemRow"))
    assert [r.string for r in rows] == ["A"]


def test_string_search_matches_text_nodes():
    # xray.py:131-137 — find(string=re.compile("Claimed profile")).
    dom = parse("<div><span>Claimed profile</span><span>other</span></div>")
    assert dom.find(string=re.compile("Claimed profile")) is not None
    assert dom.find(string=re.compile("Unclaimed zzz")) is None


def test_strings_excludes_script_style_and_comments():
    dom = parse(
        "<div id='d'>a<script>var x='hidden';</script>b<style>.c{}</style>"
        "<!--note-->c</div>"
    )
    assert "".join(dom.find(attrs={"id": "d"}).strings) == "abc"


def test_attr_names_lowercased_and_bare_attrs_empty():
    dom = parse("<time dateTime='2024-01-01' data-flag>t</time>")
    t = dom.find("time")
    assert t["datetime"] == "2024-01-01"
    assert t.has_attr("data-flag") and t["data-flag"] == ""


def test_void_elements_do_not_nest():
    dom = parse("<p id='p'>a<br>b<img src='x'>c</p>")
    tag = dom.find(attrs={"id": "p"})
    assert list(tag.strings) == ["a", "b", "c"]
    assert tag.string is None


def test_mismatched_end_tag_recovery():
    dom = parse("<div id='o'><span>a</b></span>b</div>")
    assert "".join(dom.find(attrs={"id": "o"}).strings) == "ab"


def test_attr_entities_decoded():
    dom = parse('<a id="l" href="/u?a=1&amp;b=2">x</a>')
    assert dom.find(attrs={"id": "l"})["href"] == "/u?a=1&b=2"


def test_duplicate_attr_first_wins():
    dom = parse("<div id='first' id='second'>x</div>")
    assert dom.find("div")["id"] == "first"


def test_bytes_input():
    dom = parse("<p>café</p>".encode("utf-8"))
    assert dom.find("p").string == "café"


def _dom_sig(root):
    from fakepilot_spark.htmlmini import StrNode, Tag

    out, stack = [], [root]
    while stack:
        node = stack.pop()
        if type(node) is Tag:
            out.append(("T", node.name, tuple(sorted(node.attrs.items())), len(node.contents)))
            stack.extend(reversed(node.contents))
        else:
            out.append(("S", node.kind, node.text))
    return out


def test_fast_and_stdlib_backends_agree_on_fixtures():
    """Differential gate: the fast tokenizer must produce the exact same DOM
    as the stdlib event backend on every real fixture page."""
    import zipfile
    from pathlib import Path

    from fakepilot_spark.htmlmini import parse_fast, parse_stdlib

    zip_path = Path(__file__).parent / "data" / "text_files.zip"
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            blob = zf.read(name)
            assert _dom_sig(parse_stdlib(blob)) == _dom_sig(parse_fast(blob)), name


def test_fast_backend_edge_cases():
    from fakepilot_spark.htmlmini import parse_fast, parse_stdlib

    cases = [
        "<p>a &lt; b &amp;&nbsp;c</p>",
        "<div class='a  b' data-x>text</div>",
        "<script>if (a<b && c>d) {}</script><p>after</p>",
        "<style>.x{content:'</'}</style>ok",
        "plain < text > stays",
        "<p>1<br/>2<br>3</p>",
        '<a href="/u?a=1&amp;b=2">x</a>',
        "<!DOCTYPE html><!-- c --><p>x</p>",
        "<p>unclosed <span attr='v",
        "<div foo='a>b'>quoted gt</div>",
        "<ul><li>a</li ><li>b</li></ul>",
        "<P CLASS='Upper'>case</P>",
        "<input value='v' checked><p>next</p>",
        "<?pi data?><p>x</p>",
        "<![CDATA[raw]]><p>x</p>",
        "<p>text &#65; &#x42; done</p>",
        "<div id='a' id='b'>dup</div>",
    ]
    for markup in cases:
        assert _dom_sig(parse_stdlib(markup)) == _dom_sig(parse_fast(markup)), markup


def test_matcher_memo_semantics():
    """The cross-document matcher memo must key by VALUE (pattern+flags /
    plain string), so semantically equal matchers share entries and every
    bs4 matching rule still holds through the cache."""
    import re

    from fakepilot_spark import htmlmini
    from fakepilot_spark.htmlmini import parse

    dom = parse(
        "<div class='styles_row__a x'>one</div>"
        "<div class='other'>two</div>"
        "<p class='styles_row__b'>three</p>"
        "<span id='target7'>four</span>"
        "<a rel='nofollow noopener'>five</a>"
    )
    # regex class_: two distinct-but-equal compiled objects share the memo
    hits1 = [t.name for t in dom.find_all(class_=re.compile("styles_row"))]
    hits2 = [t.name for t in dom.find_all(class_=re.compile("styles_row"))]
    assert hits1 == hits2 == ["div", "p"]
    # plain-string class_ must match a single token (bs4 multi-valued rule)
    assert dom.find(class_="x").name == "div"
    # ...and the whole normalized string
    assert dom.find(class_="styles_row__a x").name == "div"
    assert dom.find(class_="styles_row__a") is not None
    # class_=True: any tag carrying a class attribute
    assert len(dom.find_all(class_=True)) == 3
    # duck-typed .search matchers (bs4 accepts anything regex-shaped) have
    # no value key, so they bypass the memo and must still work
    class _Contains:
        def __init__(self, needle):
            self.needle = needle

        def search(self, s):
            return self if self.needle in s else None

    assert dom.find(class_=_Contains("other")).string == "two"
    assert dom.find(string=_Contains("thre")) is not None
    # regex on a non-multi-valued attr (single-string compare path)
    assert dom.find(attrs={"id": re.compile(r"target\d")}).name == "span"
    # regex on a multi-valued attr other than class
    assert dom.find(attrs={"rel": re.compile("^noopener$")}).name == "a"
    # string= regex searches go through the memo too
    assert dom.find(string=re.compile("thre")) is not None
    assert dom.find(string="four") is not None
    # flags are part of the key: IGNORECASE and plain must not collide
    assert dom.find(class_=re.compile("STYLES_ROW")) is None
    assert dom.find(class_=re.compile("STYLES_ROW", re.I)) is not None


def test_matcher_memo_bounded(monkeypatch):
    """Past the size bound the memo clears (never evicts) and matching is
    still correct."""
    import re

    from fakepilot_spark import htmlmini
    from fakepilot_spark.htmlmini import parse

    dom = parse("<div class='a b'>x</div><p class='c'>y</p>")
    monkeypatch.setattr(htmlmini, "_MATCH_MEMO_MAX", 0)
    monkeypatch.setattr(htmlmini, "_MATCH_MEMO", {})
    assert dom.find(class_=re.compile("^b$")).name == "div"
    assert dom.find(string=re.compile("^y$")) is not None
    assert htmlmini._MATCH_MEMO  # repopulated after each clear


def test_fuzz_fast_and_stdlib_backends_agree():
    """Property gate: on arbitrary markup-ish soup assembled from the
    constructs the tokenizer special-cases (tags, entities, comments,
    rawtext, declarations, PIs, stray brackets, truncation), the fast
    tokenizer and the stdlib event backend must produce identical DOMs."""
    from hypothesis import given, settings, strategies as st

    from fakepilot_spark.htmlmini import parse_fast, parse_stdlib

    name = st.sampled_from(["div", "p", "span", "b", "li", "br", "script", "style"])
    attr = st.sampled_from(
        ["", " class='a b'", ' id="x"', " data-x", " href='/u?a=1&amp;b=2'",
         ' title="q>t"', " CLASS='Up per'"]
    )
    piece = st.one_of(
        st.tuples(name, attr).map(lambda t: f"<{t[0]}{t[1]}>"),
        name.map(lambda n: f"</{n}>"),
        st.sampled_from(
            ["text", " a &lt; b ", "&#65;&#x42;", "1 < 2", "x > y", "<",
             ">", "</", "<!", "<!-- c -->", "<!-- unterminated",
             "<!DOCTYPE html>", "<![CDATA[raw]]>", "<?pi data?>", "\n",
             "plain &amp; more", "<i/>", "< notatag>"]
        ),
    )
    soup = st.lists(piece, min_size=0, max_size=30).map("".join)

    def outcome(backend, markup):
        # html.parser itself raises AssertionError on some marked-section
        # soup (bs4-on-stdlib propagates it) — identical raises are parity
        try:
            return ("dom", _dom_sig(backend(markup)))
        except AssertionError as e:
            return ("raise", str(e))

    @settings(max_examples=300, deadline=None)
    @given(soup)
    def inner(markup):
        assert outcome(parse_stdlib, markup) == outcome(parse_fast, markup), markup
        # truncation exercises every EOF recovery branch
        cut = len(markup) * 2 // 3
        assert outcome(parse_stdlib, markup[:cut]) == outcome(
            parse_fast, markup[:cut]
        ), markup[:cut]

    inner()

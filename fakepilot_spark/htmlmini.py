"""htmlmini — a tiny, dependency-free HTML DOM with BeautifulSoup-compatible
query semantics for the subset the fakepilot reference uses.

The reference (`/root/reference/src/fakepilot/xray.py:174-187`) parses pages
with BeautifulSoup on lxml (fallback stdlib ``html.parser``). Neither bs4 nor
lxml is available in this environment, and at 100 TB scale we want a lean,
slot-based DOM built once per page inside an Arrow batch anyway. This module
reimplements — from scratch, against publicly documented bs4 behavior — only
the query surface the extraction semantics depend on:

* ``find`` / ``find_all`` with: tag-name match, callable tag predicate,
  ``class_`` regex/str (multi-valued: each whitespace-split token is tried,
  then the space-joined whole — bs4 ``_matches`` documented behavior),
  ``attrs`` dict equality / presence, ``string=`` regex over text nodes,
  and ``limit=`` early exit (reference relies on it at
  ``/root/reference/src/fakepilot/__init__.py:38-40``).
* ``.string`` — bs4 rule: exactly one child; a string child is returned
  directly, a tag child is recursed into, anything else → None.
* ``.strings`` — all *plain* text descendants in document order; comments,
  script/style payloads and declarations are excluded (bs4 filters by exact
  ``NavigableString`` type; script/style text is typed ``Script``/
  ``Stylesheet`` and comments ``Comment``, so none of them are yielded).
  Comments still *split* adjacent text into separate nodes — the reference
  depends on that for ``<!-- -->``-separated React SSR text
  (``/root/reference/src/fakepilot/xray.py:43-45,249-263``).
* attribute access: ``attrs`` dict (names lowercased, entities decoded,
  first duplicate wins — matching lxml), ``get``, ``has_attr``.

Physical layout: every node is appended to ONE flat pre-order array at parse
time; each tag records its subtree span ``[pos+1, end)``. Document-order
scans — the only traversal bs4 semantics need — are tight index loops over
that array instead of recursive generators, which makes whole-page scans on
real 0.3–1 MB pages ~3-5× faster (this is the hot path of the crawl's
pandas-UDF extraction stage).

Parsing uses ``html.parser.HTMLParser`` with ``convert_charrefs=True`` so
character references (incl. ``&nbsp;`` → ``\xa0``) decode into the same text
node, matching lxml. Void elements never take children; mismatched end tags
pop to the nearest matching open tag and are otherwise ignored (libxml2-style
recovery, sufficient for the well-formed SSR markup this engine targets).
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["Tag", "StrNode", "parse", "TEXT", "COMMENT", "RAWTEXT", "DECL"]

TEXT = 0  # a plain text node (bs4 NavigableString)
COMMENT = 1  # <!-- ... -->
RAWTEXT = 2  # script/style/template payload (bs4 Script/Stylesheet)
DECL = 3  # doctype / processing instruction / CDATA

_VOID = frozenset(
    (
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    )
)

_RAW_PARENTS = frozenset(("script", "style", "template"))

_MULTI_VALUED = frozenset(("class", "rel", "rev", "accept-charset", "headers"))


class StrNode:
    """A string node: text content plus a kind discriminator."""

    __slots__ = ("text", "kind")

    def __init__(self, text: str, kind: int) -> None:
        self.text = text
        self.kind = kind

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"StrNode({self.text!r}, kind={self.kind})"


class Tag:
    """An element node with bs4-compatible query helpers.

    ``_flat`` is the document's shared pre-order node array; this tag sits at
    index ``pos`` and its descendants occupy ``_flat[pos+1:end]``.
    """

    __slots__ = ("name", "attrs", "contents", "_flat", "pos", "end", "_ctoks")

    def __init__(self, name: str, attrs: dict, flat: list | None = None) -> None:
        self.name = name
        self.attrs = attrs
        self.contents: list = []
        self._flat = flat if flat is not None else [self]
        self.pos = 0
        self.end = 0
        self._ctoks = None

    # -- attribute access ---------------------------------------------------

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __getitem__(self, key: str):
        return self.attrs[key]

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    @property
    def class_tokens(self) -> list | None:
        """Whitespace-split ``class`` tokens (bs4 multi-valued view), cached."""
        toks = self._ctoks
        if toks is None:
            raw = self.attrs.get("class")
            if raw is None:
                return None
            toks = self._ctoks = raw.split()
        return toks

    # -- traversal ----------------------------------------------------------

    @property
    def descendants(self):
        """Pre-order iterator over every descendant node (tags + strings)."""
        flat = self._flat
        for idx in range(self.pos + 1, self.end):
            yield flat[idx]

    @property
    def strings(self):
        """Plain-text descendants in document order (comments/raw excluded)."""
        flat = self._flat
        for idx in range(self.pos + 1, self.end):
            node = flat[idx]
            if type(node) is StrNode and node.kind == TEXT:
                yield node.text

    @property
    def string(self):
        """bs4 ``.string``: defined only for single-child chains."""
        node = self
        while True:
            if len(node.contents) != 1:
                return None
            child = node.contents[0]
            if type(child) is StrNode:
                return child.text
            node = child

    # -- queries ------------------------------------------------------------

    def find(self, name=None, attrs=None, class_=None, string=None):
        for hit in self._search(name, attrs, class_, string, 1):
            return hit
        return None

    def find_all(self, name=None, attrs=None, class_=None, string=None, limit=None):
        return list(self._search(name, attrs, class_, string, limit))

    def _search(self, name, attrs, class_, string, limit):
        flat = self._flat
        lo, hi = self.pos + 1, self.end
        n = 0
        if string is not None and name is None and not attrs and class_ is None:
            # text-node search (reference: find(string=re.compile(...)),
            # /root/reference/src/fakepilot/xray.py:131-137). bs4 matches any
            # NavigableString instance, which includes comment/raw subtypes.
            for idx in range(lo, hi):
                node = flat[idx]
                if type(node) is StrNode and _match_str(string, node.text):
                    yield node
                    n += 1
                    if limit is not None and n >= limit:
                        return
            return
        callable_name = name is not None and callable(name) and not isinstance(name, str)
        for idx in range(lo, hi):
            node = flat[idx]
            if type(node) is not Tag:
                continue
            if name is not None:
                if callable_name:
                    if not name(node):
                        continue
                elif node.name != name:
                    continue
            if class_ is not None:
                tokens = node.class_tokens
                if tokens is None:
                    continue
                if not _match_multi(class_, tokens):
                    continue
            if attrs and not _match_attrs(node, attrs):
                continue
            yield node
            n += 1
            if limit is not None and n >= limit:
                return

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} {self.attrs!r} children={len(self.contents)}>"


def _match_str(matcher, text: str) -> bool:
    if hasattr(matcher, "search"):
        return matcher.search(text) is not None
    return text == matcher


def _match_attr_value(matcher, value) -> bool:
    if matcher is True:
        return True
    if hasattr(matcher, "search"):
        return matcher.search(value) is not None
    return value == matcher


def _match_multi(matcher, tokens: list) -> bool:
    # bs4 multi-valued attribute rule: any individual token, then the
    # normalized whole string.
    for t in tokens:
        if _match_attr_value(matcher, t):
            return True
    return _match_attr_value(matcher, " ".join(tokens))


def _match_attrs(tag: Tag, attrs: dict) -> bool:
    tag_attrs = tag.attrs
    for key, want in attrs.items():
        got = tag_attrs.get(key)
        if got is None:
            return False
        if key in _MULTI_VALUED:
            if not _match_multi(want, got.split()):
                return False
        elif not _match_attr_value(want, got):
            return False
    return True


class _TreeBuilder(HTMLParser):
    """Event-driven DOM assembly with lxml-compatible recovery rules."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.flat: list = []
        self.root = Tag("[document]", {}, self.flat)
        self.flat.append(self.root)
        self._stack = [self.root]

    # html.parser lowercases tag/attr names and decodes attr entities for us.

    def updatepos(self, i, j):  # line/col tracking is dead weight here
        return j

    def handle_starttag(self, name, attrs):
        d = {}
        for key, value in attrs:
            if key not in d:  # first duplicate wins, as in lxml
                d[key] = "" if value is None else value
        node = Tag(name, d, self.flat)
        node.pos = len(self.flat)
        self.flat.append(node)
        self._stack[-1].contents.append(node)
        if name not in _VOID:
            self._stack.append(node)
        else:
            node.end = node.pos + 1

    def handle_endtag(self, name):
        if name in _VOID:
            return
        stack = self._stack
        for i in range(len(stack) - 1, 0, -1):
            if stack[i].name == name:
                close_at = len(self.flat)
                for node in stack[i:]:
                    node.end = close_at
                del stack[i:]
                return
        # Unmatched end tag: drop it (lxml recovery).

    def handle_data(self, data):
        parent = self._stack[-1]
        kind = RAWTEXT if parent.name in _RAW_PARENTS else TEXT
        contents = parent.contents
        if contents:
            last = contents[-1]
            if type(last) is StrNode and last.kind == kind:
                # lxml yields one text node per uninterrupted run; merge
                # parser-internal buffer splits back together.
                last.text += data
                return
        node = StrNode(data, kind)
        self.flat.append(node)
        contents.append(node)

    def _append_str(self, data: str, kind: int) -> None:
        node = StrNode(data, kind)
        self.flat.append(node)
        self._stack[-1].contents.append(node)

    def handle_comment(self, data):
        self._append_str(data, COMMENT)

    def handle_decl(self, decl):
        self._append_str(decl, DECL)

    def unknown_decl(self, data):
        self._append_str(data, DECL)

    def handle_pi(self, data):
        self._append_str(data, DECL)

    def finish(self) -> Tag:
        self.close()
        close_at = len(self.flat)
        for node in self._stack:
            node.end = close_at
        return self.root


def parse(markup) -> Tag:
    """Parse HTML (str or utf-8 bytes) into a document ``Tag``.

    Bytes are decoded as utf-8 **with universal-newline translation**
    (``\r\n``/``\r`` → ``\n``): the reference contract is a *text-mode* file
    object (``/root/reference/tests/test_xray.py:77``), so byte-identical
    extraction from a binary ``html`` column requires the same translation.
    """
    if isinstance(markup, (bytes, bytearray, memoryview)):
        markup = bytes(markup).decode("utf-8", errors="replace")
        if "\r" in markup:
            markup = markup.replace("\r\n", "\n").replace("\r", "\n")
    builder = _TreeBuilder()
    builder.feed(markup)
    return builder.finish()

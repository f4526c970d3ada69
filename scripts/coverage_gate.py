"""Line + branch coverage gate for the extraction surface.

The reference gates on >=95% BRANCH coverage via coverage.py
(/root/reference/pyproject.toml:64, noxfile.py:51-135). This sandbox ships
no coverage tooling and installs are not allowed, so this script implements
the closest honest equivalent with the stdlib, over the pure-Python
extraction tests (``test_htmlmini.py``, ``test_golden_extraction.py``,
``test_coverage_extras.py`` — the same code paths the Spark UDFs execute in
worker processes):

* **lines** — a ``sys.settrace`` line tracer measured against the exact
  executable-line set from each module's compiled code objects
  (``co_lines``), gated at >=95% per file;
* **branches** (round-3 verdict stretch item) — the tracer also records
  line-transition ARCS ``(prev_line -> line)`` per frame (plus frame-exit
  arcs), and an AST pass enumerates every ``if``/``while``/``for`` branch
  point with its two outcomes: *taken* (an arc from the test's line span
  into the body) and *not-taken* (an arc from the test's line span to
  anywhere outside test+body, or a frame exit off the test line).  Branch
  coverage = outcomes hit / (2 x points), gated at >=95% per file.  Python
  3.11 has neither ``sys.monitoring`` BRANCH events nor bytecode branch
  tables, so one-line bodies (``if x: y()``) produce no distinguishing
  line event — those points are excluded and REPORTED, not silently
  counted as covered.

Usage: python scripts/coverage_gate.py [--list-misses]
Exit code 0 iff every gated file meets THRESHOLD on BOTH measures.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

THRESHOLD = 95.0
_EXIT = -1  # pseudo-destination for frame returns

# the extraction surface: what the reference's own suite covers
TARGETS = [
    REPO / "fakepilot_spark" / "htmlmini.py",
    REPO / "fakepilot_spark" / "extract" / "fields.py",
    REPO / "fakepilot_spark" / "extract" / "search.py",
]

TEST_ARGS = [
    str(REPO / "tests" / "test_htmlmini.py"),
    str(REPO / "tests" / "test_golden_extraction.py"),
    str(REPO / "tests" / "test_coverage_extras.py"),
    "-q",
    "-p",
    "no:cacheprovider",
]


def _excluded_lines(src: str) -> set[int]:
    """Lines under a ``# pragma: no cover`` statement header (coverage.py's
    own convention), spanning the full statement/def block."""
    src_lines = src.splitlines()
    excluded: set[int] = set()
    for node in ast.walk(ast.parse(src)):
        if not hasattr(node, "lineno"):
            continue
        header = src_lines[node.lineno - 1]
        if "pragma: no cover" in header:
            excluded.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
    return excluded


def executable_lines(path: Path) -> set[int]:
    """Every line that can emit a 'line' trace event: the union of
    ``co_lines`` over the module's code object tree — the same universe
    coverage.py uses."""
    src = path.read_text()
    code = compile(src, str(path), "exec")
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, lineno in co.co_lines():
            if lineno is not None and lineno > 0:
                lines.add(lineno)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines - _excluded_lines(src)


class BranchPoint:
    """One conditional statement: test-line span + body span/entry lines."""

    __slots__ = ("line", "kind", "test_span", "body_entry", "body_span")

    def __init__(self, line, kind, test_span, body_entry, body_span):
        self.line = line
        self.kind = kind
        self.test_span = test_span
        self.body_entry = body_entry
        self.body_span = body_span


def branch_points(path: Path) -> tuple[list[BranchPoint], int]:
    """Enumerate if/while/for branch points (the same statement kinds
    coverage.py counts). Returns (measurable points, skipped one-liners)."""
    src = path.read_text()
    src_lines = src.splitlines()
    excluded = _excluded_lines(src)
    points: list[BranchPoint] = []
    skipped = 0
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, (ast.If, ast.While)):
            # constant test (while True / if False): only one outcome can
            # exist — coverage.py likewise exempts these
            if isinstance(node.test, ast.Constant):
                continue
            test_end = node.test.end_lineno or node.test.lineno
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            test_end = node.iter.end_lineno or node.iter.lineno
        else:
            continue
        if node.lineno in excluded:
            continue
        # coverage.py's own partial-branch convention: a statement whose
        # header carries `# pragma: no branch` is exempt from requiring
        # both outcomes (used for conditions unreachable-by-construction,
        # each documented at the site)
        if "pragma: no branch" in src_lines[node.lineno - 1]:
            continue
        body_first = node.body[0]
        if body_first.lineno <= test_end:
            # one-line body: no line event distinguishes the outcomes
            skipped += 1
            continue
        test_span = set(range(node.lineno, test_end + 1))
        body_span = set(
            range(body_first.lineno, (node.body[-1].end_lineno or 0) + 1)
        )
        # entry line(s) of the body's first statement: a decorated def's
        # first event fires on the decorator line
        entry = {body_first.lineno}
        for deco in getattr(body_first, "decorator_list", []):
            entry.add(deco.lineno)
        points.append(
            BranchPoint(
                node.lineno,
                type(node).__name__.lower(),
                test_span,
                entry,
                body_span,
            )
        )
    return points, skipped


def branch_outcomes(
    points: list[BranchPoint], arcs: set[tuple[int, int]]
) -> tuple[int, list[tuple[BranchPoint, str]]]:
    """Count taken outcomes per point from the traced arc set."""
    hit = 0
    misses: list[tuple[BranchPoint, str]] = []
    for p in points:
        from_test = [(s, d) for (s, d) in arcs if s in p.test_span]
        taken = any(d in p.body_entry for _, d in from_test)
        not_taken = any(
            d == _EXIT or (d not in p.body_span and d not in p.test_span)
            for _, d in from_test
        )
        hit += taken + not_taken
        if not taken:
            misses.append((p, "never true"))
        if not not_taken:
            misses.append((p, "never false/exhausted"))
    return hit, misses


def main() -> int:
    import pytest

    targets = {str(p): p for p in TARGETS}
    hit: dict[str, set[int]] = {k: set() for k in targets}
    arcs: dict[str, set[tuple[int, int]]] = {k: set() for k in targets}
    prev: dict[int, int] = {}  # id(frame) -> last executed line

    def local_trace(frame, event, arg):
        fid = id(frame)
        fname = frame.f_code.co_filename
        if event == "line":
            line = frame.f_lineno
            hit[fname].add(line)
            last = prev.get(fid)
            if last is not None and last != line:
                arcs[fname].add((last, line))
            prev[fid] = line
        elif event == "return":
            last = prev.pop(fid, None)
            if last is not None:
                arcs[fname].add((last, _EXIT))
        return local_trace

    def global_trace(frame, event, arg):
        if frame.f_code.co_filename in targets:
            return local_trace
        return None

    sys.settrace(global_trace)
    try:
        rc = pytest.main(TEST_ARGS)
    finally:
        sys.settrace(None)
    if rc != 0:
        print(f"FAIL: test run exited {rc}; coverage not evaluated")
        return 2

    list_misses = "--list-misses" in sys.argv
    failed = False
    print(
        f"\n{'file':<40} {'lines':>6} {'hit':>5} {'cover':>7} "
        f"{'branch':>7} {'outcomes':>9} {'skip':>4}"
    )
    for fname, path in targets.items():
        want = executable_lines(path)
        got = hit[fname] & want
        pct = 100.0 * len(got) / len(want) if want else 100.0
        points, skipped = branch_points(path)
        bhit, bmisses = branch_outcomes(points, arcs[fname])
        btotal = 2 * len(points)
        bpct = 100.0 * bhit / btotal if btotal else 100.0
        rel = path.relative_to(REPO)
        ok = pct >= THRESHOLD and bpct >= THRESHOLD
        print(
            f"{str(rel):<40} {len(want):>6} {len(got):>5} {pct:>6.2f}% "
            f"{bpct:>6.2f}% {bhit:>4}/{btotal:<4} {skipped:>4} "
            f"{'ok' if ok else 'LOW'}"
        )
        if not ok:
            failed = True
        if list_misses:
            misses = sorted(want - got)
            if misses:
                print(f"  missed lines: {_ranges(misses)}")
            for p, why in bmisses:
                print(f"  branch {p.kind}@{p.line}: {why}")
    print(
        f"\ngate: >= {THRESHOLD}% lines AND >= {THRESHOLD}% branch outcomes "
        f"per file -> {'FAIL' if failed else 'PASS'}"
    )
    return 1 if failed else 0


def _ranges(lines: list[int]) -> str:
    out, start, prev_n = [], None, None
    for n in lines:
        if start is None:
            start = prev_n = n
        elif n == prev_n + 1:
            prev_n = n
        else:
            out.append(f"{start}-{prev_n}" if prev_n != start else str(start))
            start = prev_n = n
    if start is not None:
        out.append(f"{start}-{prev_n}" if prev_n != start else str(start))
    return ", ".join(out)


if __name__ == "__main__":
    sys.exit(main())

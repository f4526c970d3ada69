"""Line-coverage gate for the extraction surface (round-2 verdict task 8).

The reference gates on >=95% BRANCH coverage via coverage.py
(/root/reference/pyproject.toml:64, noxfile.py:51-135). This sandbox ships
no coverage tooling and installs are not allowed, so this script implements
the closest honest equivalent with the stdlib: a ``sys.settrace`` line
tracer over the pure-Python extraction tests (``test_htmlmini.py``,
``test_golden_extraction.py`` — the same code paths the Spark UDFs execute
in worker processes), measured against the exact executable-line set from
each module's compiled code objects (``co_lines``), gated at >=95% per
file.

Line (not branch) granularity is the documented delta vs the reference's
bar; every uncovered line is printed so gaps are enumerable.

Usage: python scripts/coverage_gate.py [--list-misses]
Exit code 0 iff every gated file meets THRESHOLD.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

THRESHOLD = 95.0

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


def executable_lines(path: Path) -> set[int]:
    """Every line that can emit a 'line' trace event: the union of
    ``co_lines`` over the module's code object tree — the same universe
    coverage.py uses. Statements marked ``# pragma: no cover`` (coverage.py's
    own convention) are excluded, spanning the full statement/def block."""
    import ast

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
    src_lines = src.splitlines()
    excluded: set[int] = set()
    for node in ast.walk(ast.parse(src)):
        if not hasattr(node, "lineno"):
            continue
        header = src_lines[node.lineno - 1]
        if "pragma: no cover" in header:
            excluded.update(range(node.lineno, (node.end_lineno or node.lineno) + 1))
    return lines - excluded


def main() -> int:
    import pytest

    targets = {str(p): p for p in TARGETS}
    hit: dict[str, set[int]] = {k: set() for k in targets}

    def local_trace(frame, event, arg):
        if event == "line":
            hit[frame.f_code.co_filename].add(frame.f_lineno)
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
    print(f"\n{'file':<44} {'lines':>6} {'hit':>6} {'cover':>7}")
    for fname, path in targets.items():
        want = executable_lines(path)
        got = hit[fname] & want
        pct = 100.0 * len(got) / len(want) if want else 100.0
        rel = path.relative_to(REPO)
        mark = "ok " if pct >= THRESHOLD else "LOW"
        print(f"{str(rel):<44} {len(want):>6} {len(got):>6} {pct:>6.2f}% {mark}")
        if pct < THRESHOLD:
            failed = True
        if list_misses:
            misses = sorted(want - got)
            if misses:
                print(f"  missed: {_ranges(misses)}")
    print(f"\ngate: >= {THRESHOLD}% lines per file -> {'FAIL' if failed else 'PASS'}")
    return 1 if failed else 0


def _ranges(lines: list[int]) -> str:
    out, start, prev = [], None, None
    for n in lines:
        if start is None:
            start = prev = n
        elif n == prev + 1:
            prev = n
        else:
            out.append(f"{start}-{prev}" if prev != start else str(start))
            start = prev = n
    if start is not None:
        out.append(f"{start}-{prev}" if prev != start else str(start))
    return ", ".join(out)


if __name__ == "__main__":
    sys.exit(main())

"""Dup-span coverage at production window width (round-4 verdict item 5).

The registered query runs W=4 (short synthetic docs); production ExactSubstr
(Lee et al. 2022) uses W≈50.  This gate proves the W-parameterized
implementation is exact at W=50 too: DuckDB value parity on sf0.001 (284
docs have ≥50 tokens there) plus a constructed long-span corpus where the
expected interval union is hand-computable.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        return str(v)

    rows = sorted(
        tuple(cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


@pytest.mark.parametrize("w", [50])
def test_duckdb_parity_at_w50(spark, w):
    from fakepilot_spark.ops.corpusops import dup_span_coverage, sql_dup_span

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = _canon(dup_span_coverage(docs, w).toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = _canon(con.execute(sql_dup_span(w)).df())
    assert got == want
    # non-degenerate at this width: some duplicated windows exist
    dup_idx = got[0].index("dup_windows")
    assert sum(int(r[dup_idx]) for r in got[1]) > 0


def test_w50_constructed_long_span(spark):
    """Two 120-token docs sharing tokens 1..80; a third unrelated doc.
    W=50 → shared 50-gram window starts 1..31 in both docs, so
    dup_windows=31 and the interval union covers positions 1..80."""
    from fakepilot_spark.ops.corpusops import dup_span_coverage

    shared = " ".join(f"s{i}" for i in range(80))
    a = shared + " " + " ".join(f"a{i}" for i in range(40))
    b = shared + " " + " ".join(f"b{i}" for i in range(40))
    c = " ".join(f"c{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dup_span_coverage(docs, 50).collect()
    }
    for d in (1, 2):
        assert out[d]["n_tokens"] == 120
        assert out[d]["n_windows"] == 71
        assert out[d]["dup_windows"] == 31
        assert out[d]["covered_tokens"] == 80
    assert out[3]["dup_windows"] == 0
    assert out[3]["covered_tokens"] == 0

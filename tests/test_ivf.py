"""IVF approximate-nearest-neighbour: Spark vs DuckDB oracle parity.

The set-membership stages (cell assignment, probe selection) run in exact
integer space, so the Spark pipeline and the SQL oracle must agree on the
full row set — not just statistically. sf0.001 (500 vectors, 32 cells) and
sf0.1 (2 000 vectors, 64 cells) exercise two derived cell counts.
"""

from __future__ import annotations

import duckdb
import pytest

from fakepilot_spark.ops.ivf import (
    _NPROBE,
    _SQL_IVF_TOPK,
    _cells_for,
    q_embedding_ivf_topk,
)

SF001 = "/root/testdata/sf0.001"
SF1 = "/root/testdata/sf0.1"


def test_cells_formula():
    assert _cells_for(1) == 4
    assert _cells_for(500) == 32   # sf0.001 / sf0.01
    assert _cells_for(2_000) == 64  # sf0.1
    assert _cells_for(10**9) == 1024  # clamped: broadcast stays metadata-sized


def _oracle(sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    return con.execute(_SQL_IVF_TOPK).fetchall()


@pytest.mark.parametrize("sf", [SF001, SF1])
def test_ivf_topk_matches_oracle(spark, sf):
    got = [
        (r.vec_id, r.cell_id, r.cosine)
        for r in q_embedding_ivf_topk(spark, sf).collect()
    ]
    want = [tuple(r) for r in _oracle(sf)]
    assert got == want
    assert len(got) == 10


def test_ivf_prunes_to_probed_cells(spark):
    """The rerank must only ever see vectors from the nprobe probed cells —
    the point of the IVF structure (candidates ≈ nprobe/k of the corpus)."""
    rows = q_embedding_ivf_topk(spark, SF001).collect()
    cells_hit = {r.cell_id for r in rows}
    assert len(cells_hit) <= _NPROBE

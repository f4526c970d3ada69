"""IVF approximate-nearest-neighbour: Spark vs DuckDB oracle parity.

The set-membership stages (cell assignment, probe selection) run in exact
integer space, so the Spark pipeline and the SQL oracle must agree on the
full row set — not just statistically. sf0.001 (500 vectors, 32 cells) and
sf0.1 (2 000 vectors, 64 cells) exercise two derived cell counts.
"""

from __future__ import annotations

import duckdb
import pytest

import numpy as np

from fakepilot_spark.ops.ivf import (
    _NPROBE,
    _SQL_IVF_TOPK,
    _cells_for,
    _scaled_int,
    _train_quantizer,
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


def test_kmeans_training_moves_centroids():
    """The quantizer is trained, not just the first-`cells` seed: Lloyd
    iterations must actually relocate centroids toward cluster means, and
    re-running is deterministic (pure integer arithmetic, no RNG)."""
    rng = np.random.default_rng(7)
    S = _scaled_int(rng.normal(size=(128, 64)).astype(np.float32) * 0.3)
    ids = np.arange(8, dtype=np.int64)
    C0 = S[:8]
    C1 = _train_quantizer(S, C0, ids)
    assert not np.array_equal(C0, C1)
    assert np.array_equal(C1, _train_quantizer(S, C0, ids))


def test_ivf_recall_vs_brute_force(spark):
    """nprobe is the recall/latency lever: recall vs the exact brute-force
    top-10 must be non-trivial at the default (2 of 32 cells ≈ 6% of the
    corpus — on near-uniform synthetic vectors neighbours scatter, so the
    floor is modest), grow monotonically with more probes, and reach 1.0
    at nprobe = cells (a full probe IS the exact scan)."""
    from fakepilot_spark.ops.similarity import q_embedding_cosine_topk

    brute = {r.vec_id for r in q_embedding_cosine_topk(spark, SF001).collect()}

    def recall(nprobe: int) -> float:
        got = {
            r.vec_id
            for r in q_embedding_ivf_topk(spark, SF001, nprobe=nprobe).collect()
        }
        return len(got & brute) / len(brute)

    r_default, r_half, r_full = recall(_NPROBE), recall(16), recall(32)
    assert r_default >= 0.3
    assert r_default <= r_half <= r_full
    assert r_full == 1.0


def test_ivf_prunes_to_probed_cells(spark):
    """The rerank must only ever see vectors from the nprobe probed cells —
    the point of the IVF structure (candidates ≈ nprobe/k of the corpus)."""
    rows = q_embedding_ivf_topk(spark, SF001).collect()
    cells_hit = {r.cell_id for r in rows}
    assert len(cells_hit) <= _NPROBE

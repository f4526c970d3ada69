"""Round-3: LSH levers derive from corpus size (VERDICT task 6).

* the hyperplane count for embedding LSH and the simhash signature width
  are computed from the corpus row count, not hard-coded;
* the derived embedding lever demonstrably keeps candidate-pair growth
  subquadratic between sf0.01 and sf0.1;
* the wide-signature simhash path (the >262k-doc regime) is parity-checked
  against the same parameterized DuckDB oracle generator the driver uses
  for the narrow path.
"""

from __future__ import annotations

import duckdb
import pytest

from fakepilot_spark.ops.similarity import (
    _MAX_PLANES,
    _MIN_PLANES,
    _planes_for,
    q_embedding_lsh_buckets,
)
from fakepilot_spark.ops.textops import (
    _LSH_BANDS,
    _minhash_bands_for,
    _simhash_params_for,
    _sql_minhash_pairs,
    _sql_simhash_pairs,
    q_minhash_lsh_pairs,
    q_simhash_near_pairs,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def test_planes_formula():
    # clamp floor at the test-corpus sizes round 2 shipped with …
    assert _planes_for(1) == _MIN_PLANES
    assert _planes_for(500) == 8  # sf0.001/sf0.01 → identical to round-2 buckets
    # … grows with the corpus …
    assert _planes_for(2_000) == 10  # sf0.1
    assert _planes_for(1_000_000) == 19
    # … and clamps at 20 planes (1M buckets) at web scale
    assert _planes_for(10**9) == _MAX_PLANES


def test_simhash_params_formula():
    assert _simhash_params_for(500) == (64, 4)
    assert _simhash_params_for(262_144) == (64, 4)
    assert _simhash_params_for(262_145) == (128, 8)
    assert _simhash_params_for(10**9) == (128, 8)


def test_minhash_bands_formula():
    # narrow (recall-leaning) regime covers every driver SF …
    assert _minhash_bands_for(500) == _LSH_BANDS
    assert _minhash_bands_for(1 << 20) == _LSH_BANDS
    # … and the derivation halves the band count (8 rows per band, squared
    # per-band key space) once corpus size crosses the collision knee
    assert _minhash_bands_for((1 << 20) + 1) == 4
    assert _minhash_bands_for(10**9) == 4


def test_minhash_wide_bands_match_oracle(spark):
    """The 4-band / 8-row regime (what _minhash_bands_for derives past ~1M
    docs) must agree with the parameterized DuckDB generator exactly, just
    as the narrow path does at the driver gate."""
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in q_minhash_lsh_pairs(spark, SF001, bands=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF001}/documents.parquet'"
    )
    want = sorted(
        (a, b) for a, b in con.execute(_sql_minhash_pairs(4)).fetchall()
    )
    assert got == want
    assert len(got) > 0  # the precision-leaning cut keeps the planted dups


def test_minhash_derived_defaults_match_pinned(spark):
    """At test-corpus size the derivation must reproduce the narrow regime
    the driver oracle is generated for."""
    derived = q_minhash_lsh_pairs(spark, SF001)
    pinned = q_minhash_lsh_pairs(spark, SF001, bands=_LSH_BANDS)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, pinned.collect())
    )


def _candidate_pairs(spark, sf: str) -> int:
    """Σ c·(c-1)/2 over LSH buckets — the rerank workload the plane count
    must keep subquadratic."""
    rows = q_embedding_lsh_buckets(spark, sf).select("n_vectors").collect()
    return sum(r.n_vectors * (r.n_vectors - 1) // 2 for r in rows)


def test_embedding_candidates_grow_subquadratically(spark):
    small = _candidate_pairs(spark, SF01)  # 500 vectors, derived 8 planes
    big = _candidate_pairs(spark, SF1)  # 2 000 vectors, derived 10 planes
    assert small > 0 and big > 0
    rows_ratio = 2_000 / 500
    # quadratic growth would be rows_ratio² = 16×; measured ≈ 4.4×.
    assert big / small < rows_ratio**2 / 2


def test_simhash_wide_signature_matches_oracle(spark):
    """The 128-bit / 8-band regime (what _simhash_params_for derives past
    262k docs) must agree with the parameterized DuckDB generator exactly,
    just as the narrow path does at the driver gate."""
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in q_simhash_near_pairs(spark, SF001, bands=8, sig_bits=128).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF001}/documents.parquet'"
    )
    want = sorted(
        (a, b, h)
        for a, b, h in con.execute(_sql_simhash_pairs(8, 128)).fetchall()
    )
    assert got == want
    assert len(got) > 0  # the wide cut still finds the planted near-dups


def test_simhash_derived_defaults_match_pinned(spark):
    """At test-corpus size the derivation must reproduce the narrow regime
    the driver oracle is generated for."""
    derived = q_simhash_near_pairs(spark, SF001)
    pinned = q_simhash_near_pairs(spark, SF001, bands=4, sig_bits=64)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, pinned.collect())
    )

"""Near-dup sketch properties: band parametrization behaves as the scale
notes claim (tuning bands trades candidate volume for recall without losing
any pair the coarser scheme guarantees).

Value-level equality vs DuckDB is covered by scripts/check_queries.py and the
driver gate; these tests pin the banding *structure*.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _pairs(df, cols=("doc_a", "doc_b")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_simhash_band_count_preserves_near_pairs(spark):
    """4 bands x 16 bits and 8 bands x 8 bits both guarantee recall at
    hamming <= 3 (pigeonhole needs bands >= 4), so the FINAL filtered pair
    set is identical — only the candidate volume differs."""
    from fakepilot_spark.ops.textops import q_simhash_near_pairs

    p4 = _pairs(q_simhash_near_pairs(spark, SF, bands=4))
    p8 = _pairs(q_simhash_near_pairs(spark, SF, bands=8))
    assert p4 == p8
    assert len(p4) > 0  # corpus contains planted near-duplicates


def test_minhash_more_bands_is_superset(spark):
    """Splitting each 4-row band into two 2-row bands can only ADD candidate
    pairs (a 4-row band match implies both 2-row halves match)."""
    from fakepilot_spark.ops.textops import q_minhash_lsh_pairs

    p8 = _pairs(q_minhash_lsh_pairs(spark, SF, bands=8))
    p16 = _pairs(q_minhash_lsh_pairs(spark, SF, bands=16))
    assert p8 <= p16
    assert len(p8) > 0

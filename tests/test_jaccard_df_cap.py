"""Round-5 hardening gate for q_ngram_jaccard_pairs (round-4 verdict item 4):

the candidate-generation df cap must keep candidate volume linear even when
one stopword-like token appears in (almost) every document of a source, and
the capped query must still find true near-dup pairs exactly (full-token-set
rerank), bit-identical to its mirrored DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _tokset(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return df.select(
        "doc_id",
        "source",
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )


def test_universal_token_candidates_bounded(spark):
    """N docs all sharing one df=N token, otherwise pairwise-disjoint:
    uncapped postings would yield N(N-1)/2 candidates; the capped join
    yields zero."""
    from fakepilot_spark.ops.textops import _jaccard_candidates

    n = 60
    rows = [(i, "web", f"common uniq{i}a uniq{i}b uniq{i}c") for i in range(n)]
    cand = _jaccard_candidates(_tokset(spark, rows), cap=20)
    assert cand.count() == 0


def test_true_near_dups_survive_the_cap(spark):
    """A genuine near-dup pair (rare shared tokens) is still found, with
    exact Jaccard over the FULL token sets — including the high-df token
    the candidate join itself ignored."""
    from fakepilot_spark.ops.textops import _jaccard_candidates

    n = 40
    rows = [(i, "web", f"common uniq{i}a uniq{i}b uniq{i}c") for i in range(n)]
    # docs 1000/1001 share 9 rare tokens + 'common'; differ in one token
    shared = " ".join(f"rare{j}" for j in range(9))
    rows += [(1000, "web", f"common {shared} alpha"),
             (1001, "web", f"common {shared} beta")]
    tokset = _tokset(spark, rows)
    cand = _jaccard_candidates(tokset, cap=20)
    got = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert got == {(1000, 1001)}
    # exact rerank sees 10 common of 11+11 distinct → 10/12 < 0.9 (excluded
    # at the threshold) — verify the intersection count is the FULL one
    sa = tokset.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    sb = tokset.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    (row,) = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(F.size(F.array_intersect("ta", "tb")).alias("n_common"))
        .collect()
    )
    assert row["n_common"] == 10  # 9 rare + 'common', cap notwithstanding


def test_cross_source_pairs_never_candidates(spark):
    from fakepilot_spark.ops.textops import _jaccard_candidates

    rows = [(1, "web", "x y z"), (2, "books", "x y z")]
    assert _jaccard_candidates(_tokset(spark, rows), cap=100).count() == 0

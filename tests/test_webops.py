"""Web-pipeline operators: URL canonicalization, repetition profile,
grouping sets.

Value-level equality vs DuckDB is covered by scripts/check_queries.py and
the driver gate; these tests pin the semantic invariants the oracle SQL
alone can't express (canonical-form properties, pure-Python recomputation
of the repetition metrics, grouping_id bit order).
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from fakepilot_spark.ops.webops import (
    _DUP_BG_DEN,
    _TOP_TOK_DEN,
    q_doc_repetition_profile,
    q_grouping_sets_revenue,
    q_url_canonicalize,
)

SF_DIR = "/root/testdata/sf0.001"


def test_canonical_urls_are_normal_form(spark):
    rows = q_url_canonicalize(spark, SF_DIR).collect()
    assert rows, "no canonical groups produced"
    total_variants = 0
    for r in rows:
        u = r["canonical_url"]
        prefix = u.split("/review/")[0]
        assert prefix == prefix.lower(), u  # scheme+host case-folded
        assert "#" not in u and "utm_" not in u, u  # fragment/tracking gone
        assert ":443" not in u, u  # default port stripped
        assert not u.endswith("/"), u  # trailing slash collapsed
        assert "/?" not in u, u
        total_variants += r["n_variants"]
    # every raw URL lands in exactly one canonical group
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total_variants == n_docs
    # normalization genuinely merges variants (mixed case/port/utm collapse)
    assert len(rows) < n_docs


def test_repetition_profile_matches_pure_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in q_doc_repetition_profile(spark, SF_DIR).collect()
        if r["doc_id"] in docs
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        uni = Counter(toks)
        bi = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        r = got[doc_id]
        assert r["top_tok_count"] == max(uni.values())
        assert r["n_tokens"] == len(toks)
        assert r["dup_bigram_occ"] == sum(c for c in bi.values() if c >= 2)
        assert r["n_bigrams"] == len(toks) - 1
        expected_keep = (
            max(uni.values()) * _TOP_TOK_DEN <= len(toks)
            and sum(c for c in bi.values() if c >= 2) * _DUP_BG_DEN
            <= len(toks) - 1
        )
        assert r["keep"] == expected_keep


def test_grouping_sets_partitions_total(spark):
    rows = q_grouping_sets_revenue(spark, SF_DIR).collect()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid bit order: (status, priority) -> 0; (status) -> priority bit = 1;
    # () -> both bits = 3
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1
    grand = by_gid[3][0]["n_orders"]
    assert grand == sum(r["n_orders"] for r in by_gid[0])
    assert grand == sum(r["n_orders"] for r in by_gid[1])
    # subtotal rows carry NULL in the rolled-up column only
    assert all(r["o_orderpriority"] is None and r["o_orderstatus"] is not None
               for r in by_gid[1])

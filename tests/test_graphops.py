"""Graph operators: connected-component dedup clusters and host PageRank.

Value-level equality vs DuckDB is covered by scripts/check_queries.py and
the driver gate; these tests pin the invariants the oracle SQL alone can't
express — union-find ground truth for the cluster assignment, exact
integer-arithmetic recomputation of the PageRank iteration, and the
multi-round structure (chains) that exercises pointer jumping.
"""

from __future__ import annotations

from fakepilot_spark.ops.graphops import (
    _CHAIN_LT,
    _CHAIN_MOD,
    _EDGE_ADD,
    _EDGE_MUL,
    _HUB_MOD,
    _PR_DAMP_DEN,
    _PR_DAMP_NUM,
    _PR_HOSTS,
    _PR_ITERS,
    _PR_TOTAL,
    _STAR_ADD,
    _STAR_MOD,
    _STAR_MUL,
    q_dedup_clusters,
    q_host_pagerank,
)

SF_DIR = "/root/testdata/sf0.001"


def _doc_ids(spark):
    return [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]


def _synth_edges(doc_ids):
    max_id = max(doc_ids)
    edges = []
    for d in doc_ids:
        if d % _CHAIN_MOD < _CHAIN_LT and d + 1 <= max_id:
            edges.append((d, d + 1))
        v = (d * _STAR_MUL + _STAR_ADD) % (max_id + 1)
        if d % _STAR_MOD == 0 and v != d:
            edges.append((d, v))
    return edges


def test_dedup_clusters_match_union_find(spark):
    doc_ids = _doc_ids(spark)
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in _synth_edges(doc_ids):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical root = min id of the component
    expected = {}
    for d in doc_ids:
        root = find(d)
        expected.setdefault(root, []).append(d)
    truth = {d: min(members) for members in expected.values() for d in members}

    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in q_dedup_clusters(spark, SF_DIR).collect()
    }
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        assert got[d] == (truth[d], truth[d] == d), d
    # the synthetic graph genuinely exercises multi-round propagation:
    # at least one component spans >= 4 nodes (a full chain)
    sizes = {}
    for d in doc_ids:
        sizes[truth[d]] = sizes.get(truth[d], 0) + 1
    assert max(sizes.values()) >= 4
    # and singletons survive as their own canonical cluster
    assert any(n == 1 for n in sizes.values())


def test_host_pagerank_matches_integer_recomputation(spark):
    doc_ids = _doc_ids(spark)
    raw = [
        (d % _PR_HOSTS, (d * _EDGE_MUL + _EDGE_ADD) % _PR_HOSTS)
        for d in doc_ids
    ] + [(d % _PR_HOSTS, d % _HUB_MOD) for d in doc_ids]
    edges = sorted({(u, v) for u, v in raw if u != v})
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outd = {}
    for u, _ in edges:
        outd[u] = outd.get(u, 0) + 1
    init = _PR_TOTAL // len(nodes)
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * init // _PR_DAMP_DEN
    rank = {h: init for h in nodes}
    for _ in range(_PR_ITERS):
        inflow = {h: 0 for h in nodes}
        for u, v in edges:
            inflow[v] += rank[u] // outd[u]
        rank = {
            h: base + _PR_DAMP_NUM * inflow[h] // _PR_DAMP_DEN for h in nodes
        }

    got = {
        r["host"]: r["rank_int"]
        for r in q_host_pagerank(spark, SF_DIR).collect()
    }
    assert got == {f"host{h}": r for h, r in rank.items()}
    # mass sanity: damping leaks dangling/rounding mass but never creates it,
    # and every host keeps at least the teleport base
    assert sum(got.values()) <= _PR_TOTAL
    assert all(v >= base for v in got.values())
    # the graph must be non-trivial: ranks genuinely differentiate hosts
    assert len(set(got.values())) > 1

"""Graph operators over the crawl/dedup surface: connected-component
cluster assignment and fixed-point PageRank host ranking.

These close two gaps a web-corpus pipeline hits right after the pair-finding
stages in :mod:`textops` / :mod:`similarity`:

* **Dedup clusters** — LSH banding (minhash/simhash/embedding) emits near-dup
  *pairs*; keeping one document per duplicate *group* requires the connected
  components of that pair graph.  Implemented as min-label propagation with
  pointer jumping (each round: one edge-keyed shuffle join + one label-keyed
  self-join), the standard O(log n)-round MapReduce CC shape.  Convergence is
  detected with a monotone invariant (the label sum strictly decreases until
  the fixpoint), so each round costs exactly one action.  Labels are node ids
  throughout, so the result — every node labelled with the *minimum* doc_id
  of its component — is integer-exact and order-independent, and DuckDB can
  verify it with a recursive-CTE transitive closure.

  Scale notes (10^10 nodes): every round's state is one (node, comp) row per
  node, hash-partitioned by node — no global structure.  Pointer jumping
  keeps rounds logarithmic even for path-shaped graphs; real LSH dup groups
  are near-cliques (diameter ≤ 2-3), so 2-3 rounds dominate in practice.
  Each round persists its labels and unpersists the previous round's (lineage
  stays O(1)); a production run would additionally checkpoint to durable
  storage every ~5 rounds, noted where the persist happens.

* **Host PageRank** — the crawl tier's frontier prioritization signal
  (complementing per-URL freshness in :mod:`crawlops`): rank hosts by the
  link graph, damping 0.85, K fixed iterations.  All mass arithmetic is
  BIGINT fixed-point (total mass 10^12) with integer division, so the sum
  order cannot perturb the result — Spark and DuckDB agree bit-for-bit with
  no float rounding.  Each iteration is one shuffle join (ranks × edges,
  keyed by host — AQE broadcasts the rank side while it is small) plus one
  partial-aggregated groupBy; the K-iteration plan is left lazy over a
  persisted edge/degree table, which is the right shape at host-graph scale
  (10^8 hosts ≪ 10^10 URLs).

The edge lists are synthesized deterministically from ``documents`` (same
pattern as ``crawlops._synth_frontier``) so the oracle reproduces the exact
row set: chain edges give multi-round components (exercising pointer
jumping), long-range edges merge chains into larger groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from . import load

# --------------------------------------------------------------------------
# Q: dedup cluster assignment — connected components of a near-dup pair graph.
# --------------------------------------------------------------------------

_CHAIN_MOD = 8  # doc_id % 8 < 3 → chains of 4 consecutive ids
_CHAIN_LT = 3
_STAR_MOD = 11  # every 11th doc links to a pseudo-random target
_STAR_MUL = 13
_STAR_ADD = 7

_MAX_CC_ROUNDS = 50


def _synth_dup_edges(spark, sf, max_id: int):
    """Deterministic near-dup pair list from ``documents`` (doc_id arithmetic
    only, mirrored bit-for-bit by the DuckDB CTE): chain edges
    (d, d+1) for d % 8 < 3, plus long-range edges (d, (13d+7) mod (max+1))
    for d % 11 == 0."""
    d = F.col("doc_id")
    docs = load(spark, sf, "documents").select("doc_id")
    chain = docs.filter((d % _CHAIN_MOD < _CHAIN_LT) & (d + 1 <= max_id)).select(
        d.alias("u"), (d + 1).alias("v")
    )
    star_v = (d * _STAR_MUL + _STAR_ADD) % (max_id + 1)
    star = docs.filter((d % _STAR_MOD == 0) & (star_v != d)).select(
        d.alias("u"), star_v.alias("v")
    )
    # arithmetic targets can be phantom doc_ids when the id space is not
    # contiguous; the label propagation has no label row for a phantom while
    # a recursive closure would happily route through it — semi-join the
    # synthesized endpoint against documents (mirrored in the SQL oracle) so
    # both engines see the identical edge set on ANY id distribution
    base = chain.unionAll(star).join(
        docs.select(F.col("doc_id").alias("v")), "v", "left_semi"
    )
    # symmetrize + dedupe: propagation below walks edges in one direction only
    return (
        base.select("u", "v")
        .unionAll(base.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .withColumnsRenamed({"u": "src", "v": "dst"})
    )


def _connected_components(docs, edges):
    """Min-label propagation with pointer jumping over a symmetrized
    ``(src, dst)`` edge DataFrame; see the module docstring for the round
    structure and scale notes.  Returns ``(doc_id, cluster_id,
    is_canonical)`` — cluster_id = minimum doc_id reachable; singletons
    keep themselves.  ``edges`` is persisted/materialized here and
    unpersisted before returning."""
    edges = edges.persist()
    edges.count()  # materialize once; reused every round

    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("comp")
    ).localCheckpoint()
    # sum(comp) is strictly decreasing until the fixpoint: comp values only
    # ever move down (least() below), and a round with no movement is final.
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    for _ in range(_MAX_CC_ROUNDS):
        # 1) neighbour min: pull the smallest label across each edge
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("comp").alias("nc"))
        )
        step1 = labels.join(nbr, labels.node == nbr.dst, "left").select(
            "node", F.least("comp", F.coalesce("nc", "comp")).alias("comp")
        )
        # 2) pointer jump: comp ← comp(comp); halves remaining chain depth
        parent = step1.select(
            F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
        )
        step2 = step1.join(parent, step1.comp == parent.p_node, "left").select(
            "node", F.least("comp", F.coalesce("p_comp", "comp")).alias("comp")
        )
        # checkpoint per round: the neighbour join + pointer-jump self-join
        # reference the previous round's plan 4x, so without lineage
        # truncation the logical plan grows 4^rounds and Catalyst analysis
        # dominates. localCheckpoint (executor-storage) truncates it; a
        # production run would use reliable checkpoint() to durable storage.
        new_labels = step2.localCheckpoint()
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:  # pragma: no cover - _MAX_CC_ROUNDS >> log2(corpus)
        raise RuntimeError("connected components did not converge")

    out = labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )
    edges.unpersist()
    return out


def q_dedup_clusters(spark, sf):
    """Per-document duplicate-cluster assignment over the *synthetic*
    arithmetic edge list (multi-round chains + long-range merges — the shape
    that exercises pointer jumping); ``is_canonical`` marks the one document
    per cluster a dedup pipeline would keep."""
    docs = load(spark, sf, "documents").select("doc_id")
    max_id = docs.agg(F.max("doc_id")).first()[0]  # scalar metadata
    return _connected_components(docs, _synth_dup_edges(spark, sf, max_id))


def q_dedup_clusters_minhash(spark, sf):
    """End-to-end near-dup dedup: the component machinery chained over the
    REAL ``minhash_lsh_pairs`` output — the pipeline a corpus freeze
    actually runs (shingle → minhash → band → candidate pairs → connected
    components → canonical keep).  Same label-propagation rounds as
    :func:`q_dedup_clusters`; the edge list is the LSH candidate-pair set
    instead of synthetic arithmetic, so the oracle embeds the minhash pair
    SQL as the edge CTE of the recursive closure."""
    from .textops import q_minhash_lsh_pairs

    docs = load(spark, sf, "documents").select("doc_id")
    pairs = q_minhash_lsh_pairs(spark, sf)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return _connected_components(docs, edges)


_SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE mx AS (
  SELECT MAX(doc_id) AS m FROM documents
), base0 AS (
  SELECT doc_id AS u, doc_id + 1 AS v FROM documents, mx
  WHERE doc_id % {_CHAIN_MOD} < {_CHAIN_LT} AND doc_id + 1 <= m
  UNION ALL
  SELECT doc_id AS u, (doc_id * {_STAR_MUL} + {_STAR_ADD}) % (m + 1) AS v
  FROM documents, mx
  WHERE doc_id % {_STAR_MOD} = 0
    AND (doc_id * {_STAR_MUL} + {_STAR_ADD}) % (m + 1) <> doc_id
), base AS (
  -- drop phantom endpoints (non-existent doc_ids), mirroring the Spark
  -- semi-join: closure must not route through nodes that have no label row
  SELECT u, v FROM base0 WHERE v IN (SELECT doc_id FROM documents)
), edges AS (
  SELECT u AS src, v AS dst FROM base
  UNION
  SELECT v AS src, u AS dst FROM base
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node AS doc_id,
       MIN(r) AS cluster_id,
       MIN(r) = node AS is_canonical
FROM reach
GROUP BY node
"""


def _dedup_clusters_minhash_sql() -> str:
    """Recursive transitive closure with the minhash candidate-pair SQL
    (the same generator the ``minhash_lsh_pairs`` oracle uses, at the same
    derived band count) embedded as the edge CTE."""
    from .textops import _sql_minhash_pairs

    return f"""
WITH RECURSIVE pairs AS (
{_sql_minhash_pairs()}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node AS doc_id,
       MIN(r) AS cluster_id,
       MIN(r) = node AS is_canonical
FROM reach
GROUP BY node
"""

# --------------------------------------------------------------------------
# Q: host PageRank — BIGINT fixed-point, K iterations, damping 85/100.
# --------------------------------------------------------------------------

_PR_HOSTS = 24
_PR_ITERS = 5
_PR_TOTAL = 10**12  # total rank mass in fixed-point units
_PR_DAMP_NUM = 85
_PR_DAMP_DEN = 100
_EDGE_MUL = 7
_EDGE_ADD = 3
_HUB_MOD = 3  # every host also links to one of 3 hub hosts → in-degree skew


def q_host_pagerank(spark, sf):
    """Rank hosts by the synthetic link graph: a permutation cycle
    (src = doc % H → (7·doc + 3) % H, the connectivity backbone) plus hub
    edges (→ doc % 3, the realistic in-degree skew).  K = 5 fixed
    iterations, damping 0.85, all mass as BIGINT fixed-point (10^12 total)
    with integer division — exact under any summation order.  Dangling-host
    mass is dropped (the standard simplification); hosts with no in-links
    keep the teleport base.
    """
    d = F.col("doc_id")
    docs = load(spark, sf, "documents").select("doc_id")
    src = (d % _PR_HOSTS).alias("src")
    cyc = docs.select(src, ((d * _EDGE_MUL + _EDGE_ADD) % _PR_HOSTS).alias("dst"))
    hub = docs.select(src, (d % _HUB_MOD).alias("dst"))
    edges = (
        cyc.unionAll(hub)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    nodes = (
        edges.select(F.col("src").alias("h"))
        .unionAll(edges.select(F.col("dst").alias("h")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # scalar metadata (host-graph cardinality)

    init = _PR_TOTAL // n_nodes
    base = (_PR_DAMP_DEN - _PR_DAMP_NUM) * init // _PR_DAMP_DEN

    ranks = nodes.select("h", F.lit(init).cast("bigint").alias("rank_int"))
    for _ in range(_PR_ITERS):
        inflow = (
            edges.join(deg, "src")
            .join(ranks, edges.src == ranks.h)
            .select(
                "dst", F.expr("rank_int div outd").alias("contrib")
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes.h == inflow.dst, "left").select(
            "h",
            (
                F.lit(base)
                + F.expr(
                    f"{_PR_DAMP_NUM} * coalesce(inflow, 0) div {_PR_DAMP_DEN}"
                )
            ).cast("bigint").alias("rank_int"),
        )

    out = ranks.select(
        F.concat(F.lit("host"), F.col("h").cast("string")).alias("host"),
        "rank_int",
        F.round(F.col("rank_int").cast("double") / _PR_TOTAL, 9).alias("rank"),
    )
    return out


def _pagerank_sql() -> str:
    prelude = f"""
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id % {_PR_HOSTS} AS src,
           (doc_id * {_EDGE_MUL} + {_EDGE_ADD}) % {_PR_HOSTS} AS dst
    FROM documents
    UNION ALL
    SELECT doc_id % {_PR_HOSTS} AS src, doc_id % {_HUB_MOD} AS dst
    FROM documents
  ) WHERE src <> dst
), deg AS (
  SELECT src, COUNT(*) AS outd FROM edges GROUP BY src
), nodes AS (
  SELECT src AS h FROM edges UNION SELECT dst FROM edges
), prm AS (
  SELECT {_PR_TOTAL} // COUNT(*) AS init,
         ({_PR_DAMP_DEN - _PR_DAMP_NUM} * ({_PR_TOTAL} // COUNT(*)))
           // {_PR_DAMP_DEN} AS base
  FROM nodes
), r0 AS (
  SELECT h, CAST(init AS BIGINT) AS rank_int FROM nodes, prm
)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(f"""
, r{i} AS (
  SELECT n.h,
         CAST(prm.base
              + ({_PR_DAMP_NUM} * COALESCE(s.inflow, 0)) // {_PR_DAMP_DEN}
           AS BIGINT) AS rank_int
  FROM nodes n CROSS JOIN prm
  LEFT JOIN (
    SELECT e.dst AS h, SUM(r.rank_int // d.outd) AS inflow
    FROM r{i - 1} r JOIN edges e ON e.src = r.h JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.h = n.h
)""")
    final = f"""
SELECT 'host' || h AS host,
       rank_int,
       ROUND(CAST(rank_int AS DOUBLE) / {_PR_TOTAL}, 9) AS rank
FROM r{_PR_ITERS}
"""
    return prelude + "".join(steps) + final


_SQL_HOST_PAGERANK = _pagerank_sql()


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_minhash": q_dedup_clusters_minhash,
    "host_pagerank": q_host_pagerank,
}

ORACLES = {
    "dedup_clusters": _SQL_DEDUP_CLUSTERS,
    "dedup_clusters_minhash": _dedup_clusters_minhash_sql(),
    "host_pagerank": _SQL_HOST_PAGERANK,
}

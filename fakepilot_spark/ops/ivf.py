"""IVF-style approximate nearest-neighbour search over ``embeddings``.

The inverted-file (IVF) pattern complements the LSH path in
:mod:`.similarity`: a small coarse-quantizer table partitions the corpus
into cells, a query probes only the ``nprobe`` nearest cells, and the exact
cosine rerank runs on that candidate slice instead of the whole corpus.

Spark shape (the 100 TB plan):

* the centroid table is metadata-sized (≤ ``2**_MAX_CELL_BITS`` rows) —
  trained driver-side over a bounded deterministic sample, then
  **broadcast**, exactly like the politeness robots dimension table; it
  never shuffles;
* cell assignment is one **map-only** ``mapInPandas`` pass — an Arrow-batched
  int64 matmul against the broadcast centroids — so building the index adds
  zero shuffles to the scan (contrast a join-against-centroids plan, which
  explodes k×n rows or shuffles the corpus by vec_id);
* the probed-cell filter runs on the assignment output before the rerank,
  so the expensive double-precision cosine touches only ~``nprobe/k`` of
  the corpus.

Determinism / oracle parity: every step that decides set membership
(training, assignment, probing) runs in exact integer arithmetic —
embeddings are scaled ``floor(x·10⁶)`` to BIGINT, distances are integer
sums of squares, ties break on the lowest cell id, and the k-means mean
step is truncating integer division (numpy ``sign(s)·(|s|//n)`` ==
DuckDB ``s // n``) — so numpy, Spark SQL, and DuckDB agree bit-for-bit.
Floats only appear in the final cosine, computed with the same rounded
expression the (driver-gated) brute-force baseline uses.

Quantizer training (round-3 verdict item): ``_KM_ITERS`` fixed Lloyd
iterations of integer k-means, seeded with the first ``cells`` vectors and
trained over the first ``_TRAIN_MUL·cells`` vectors — a bounded,
deterministic sample (k-means quality needs a representative sample, not
the corpus; at 10^9+ vectors a production run would hash-sample instead of
prefix-sample, the one documented delta).  Empty cells keep their previous
centroid.  The oracle reproduces the identical iterations as unrolled CTEs.
The cell count derives from corpus size as ``2**clamp(ceil(log2(n)/2), 2,
10)`` (≈√n, capped where a broadcast table stops being metadata-sized); at
10^9+ vectors the documented levers are the exponent cap (executor memory
bound) and ``nprobe`` (recall/latency trade).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from . import load
from .similarity import _as_double, _dot, _norm

_DIMS = 64
_SCALE = 1_000_000.0
_MIN_CELL_BITS = 2
_MAX_CELL_BITS = 10
_NPROBE = 2
_TOPK = 10
_KM_ITERS = 2  # fixed Lloyd iterations (unrolled verbatim in the oracle)
_TRAIN_MUL = 4  # training sample = first _TRAIN_MUL*cells vectors (bounded)


def _cells_for(n_vectors: int) -> int:
    """``2**clamp(ceil(log2(n)/2), 2, 10)`` — ≈√n cells, capped at 1024."""
    if n_vectors < 2:
        return 1 << _MIN_CELL_BITS
    bits = math.ceil(math.log2(n_vectors) / 2)
    return 1 << min(_MAX_CELL_BITS, max(_MIN_CELL_BITS, bits))


def _scaled_int(vecs) -> np.ndarray:
    """floor(float32→double · 10⁶) as int64 — the same IEEE ops Spark's
    ``FLOOR(CAST(x AS DOUBLE) * 1e6)`` and DuckDB's equivalent perform."""
    arr = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(arr * _SCALE).astype(np.int64)


def _assign_cells(S: np.ndarray, C: np.ndarray, cell_ids: np.ndarray) -> np.ndarray:
    """Nearest centroid per row of ``S`` in exact int64 L2: argmin over
    ``c·c − 2 v·c`` (v·v constant per row).  ``np.argmin`` takes the first
    minimum and ``cell_ids`` is sorted ascending, so ties break on the
    lowest cell id — the same (dist, cell_id) order the SQL uses."""
    csq = (C * C).sum(axis=1)
    dist = csq[None, :] - 2 * (S @ C.T)
    return cell_ids[dist.argmin(axis=1)]


def _train_quantizer(S: np.ndarray, C0: np.ndarray, cell_ids: np.ndarray) -> np.ndarray:
    """``_KM_ITERS`` Lloyd iterations in exact int64: assign the training
    sample, recompute each centroid as the truncating-integer-division mean
    of its members (empty cells keep the previous centroid)."""
    C = C0.copy()
    for _ in range(_KM_ITERS):
        assigned = _assign_cells(S, C, cell_ids)
        for i, cid in enumerate(cell_ids):
            m = assigned == cid
            if m.any():
                s = S[m].sum(axis=0)
                # truncating division == DuckDB BIGINT '//' for either sign
                C[i] = np.sign(s) * (np.abs(s) // int(m.sum()))
    return C


def q_embedding_ivf_topk(spark, sf, nprobe: int = _NPROBE):
    emb = load(spark, sf, "embeddings")
    cells = _cells_for(emb.count())

    # training sample + seed centroids: bounded and deterministic
    # (≤ _TRAIN_MUL·1024 × 64 ints, driver-held like the robots dim table)
    train_rows = sorted(
        emb.filter(F.col("vec_id") < _TRAIN_MUL * cells)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    S_train = _scaled_int([r.embedding for r in train_rows])
    train_ids = np.array([r.vec_id for r in train_rows], dtype=np.int64)
    seed = train_ids < cells
    cell_ids = train_ids[seed]
    C = _train_quantizer(S_train, S_train[seed], cell_ids)
    c_sq = (C * C).sum(axis=1)

    # probe selection is a k-row argsort on the driver (same metadata scale
    # as the centroid table): nprobe cells nearest the QUERY VECTOR (vec 0)
    # in the trained-centroid space, ties to the lowest cell id.
    q_sv = S_train[train_ids == 0][0]
    q_dist = c_sq - 2 * (C @ q_sv)
    order = np.lexsort((cell_ids, q_dist))
    probed = [int(cell_ids[i]) for i in order[:nprobe]]

    b_cent = spark.sparkContext.broadcast((C, cell_ids))

    def assign(batches):
        Cb, ids = b_cent.value
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"vec_id": pd.Series([], dtype="int64"),
                     "cell_id": pd.Series([], dtype="int64"),
                     "embedding": pd.Series([], dtype=object)}
                )
                continue
            V = _scaled_int(pdf["embedding"])
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"),
                 "cell_id": _assign_cells(V, Cb, ids),
                 "embedding": pdf["embedding"]}
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id bigint, cell_id bigint, embedding array<float>"
    )

    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    cand = assigned.filter(
        F.col("cell_id").isin(probed) & (F.col("vec_id") != 0)
    )
    scored = cand.crossJoin(F.broadcast(query)).select(
        "vec_id",
        "cell_id",
        F.round(
            _dot(_as_double(F.col("embedding")), _as_double(F.col("query_vec")))
            / (
                _norm(_as_double(F.col("embedding")))
                * _norm(_as_double(F.col("query_vec")))
            ),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(_TOPK)


def _ivf_sql() -> str:
    """The oracle recomputes the identical pipeline in SQL: same cell-count
    formula over COUNT(*), same floor(x·10⁶) BIGINT space, the same
    ``_KM_ITERS`` k-means iterations unrolled as CTEs (truncating ``//``
    mean, empty cells keep the previous centroid), same (dist, cell_id)
    tie-break, same rounded cosine."""
    dist = (
        f"CAST(list_sum(list_transform(range(1, {_DIMS + 1}), "
        "d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))) AS BIGINT)"
    )
    parts = [f"""
WITH prm AS (
  SELECT CAST(POWER(2, LEAST({_MAX_CELL_BITS}, GREATEST({_MIN_CELL_BITS},
         CAST(CEIL(LOG2(COUNT(*)) / 2) AS INT)))) AS BIGINT) AS cells
  FROM embeddings
), s AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
), train AS (
  SELECT vec_id, sv FROM s
  WHERE vec_id < {_TRAIN_MUL} * (SELECT cells FROM prm)
), cent0 AS (
  SELECT vec_id AS cell_id, sv AS sc FROM s
  WHERE vec_id < (SELECT cells FROM prm)
)"""]
    for i in range(1, _KM_ITERS + 1):
        d_tc = dist.format(a="t.sv", b="c.sc")
        parts.append(f"""
, a{i} AS (
  SELECT vec_id, cell_id, sv FROM (
    SELECT t.vec_id, c.cell_id, t.sv,
           ROW_NUMBER() OVER (
             PARTITION BY t.vec_id
             ORDER BY {d_tc}, c.cell_id) AS rn
    FROM train t, cent{i - 1} c)
  WHERE rn = 1
), m{i} AS (
  SELECT cell_id, d, SUM(sv[d]) AS sm, COUNT(*) AS cnt
  FROM a{i}, range(1, {_DIMS + 1}) r(d)
  GROUP BY cell_id, d
), cent{i} AS (
  SELECT c.cell_id, COALESCE(nm.sc, c.sc) AS sc
  FROM cent{i - 1} c LEFT JOIN (
    SELECT cell_id, list(sm // cnt ORDER BY d) AS sc
    FROM m{i} GROUP BY cell_id
  ) nm ON nm.cell_id = c.cell_id
)""")
    d_sc = dist.format(a="s.sv", b="c.sc")
    d_cq = dist.format(a="c.sc", b="q.sv")
    parts.append(f"""
, assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT s.vec_id, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY {d_sc}, c.cell_id) AS rn
    FROM s, cent{_KM_ITERS} c)
  WHERE rn = 1
), probed AS (
  SELECT cell_id FROM (
    SELECT c.cell_id,
           ROW_NUMBER() OVER (ORDER BY {d_cq}, c.cell_id) AS rn
    FROM cent{_KM_ITERS} c, (SELECT sv FROM s WHERE vec_id = 0) q)
  WHERE rn <= {_NPROBE}
)
SELECT e.vec_id, a.cell_id,
       ROUND(list_cosine_similarity(
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
FROM embeddings e
JOIN assign a ON a.vec_id = e.vec_id
JOIN probed p ON p.cell_id = a.cell_id,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {_TOPK}
""")
    return "".join(parts)


_SQL_IVF_TOPK = _ivf_sql()


QUERIES = {"embedding_ivf_topk": q_embedding_ivf_topk}
ORACLES = {"embedding_ivf_topk": _SQL_IVF_TOPK}

"""IVF-style approximate nearest-neighbour search over ``embeddings``.

The inverted-file (IVF) pattern complements the LSH path in
:mod:`.similarity`: a small coarse-quantizer table partitions the corpus
into cells, a query probes only the ``nprobe`` nearest cells, and the exact
cosine rerank runs on that candidate slice instead of the whole corpus.

Spark shape (the 100 TB plan):

* the centroid table is metadata-sized (≤ ``2**_MAX_CELL_BITS`` rows) —
  collected once and **broadcast**, exactly like the politeness robots
  dimension table; it never shuffles;
* cell assignment is one **map-only** ``mapInPandas`` pass — an Arrow-batched
  int64 matmul against the broadcast centroids — so building the index adds
  zero shuffles to the scan (contrast a join-against-centroids plan, which
  explodes k×n rows or shuffles the corpus by vec_id);
* the probed-cell filter runs on the assignment output before the rerank,
  so the expensive double-precision cosine touches only ~``nprobe/k`` of
  the corpus.

Determinism / oracle parity: every step that decides set membership
(assignment, probing) runs in exact integer arithmetic — embeddings are
scaled ``floor(x·10⁶)`` to BIGINT, distances are integer sums of squares,
ties break on the lowest cell id — so numpy, Spark SQL, and DuckDB agree
bit-for-bit. Floats only appear in the final cosine, computed with the
same rounded expression the (driver-gated) brute-force baseline uses.

Quantizer choice: the centroids are the first ``cells`` vectors of the
corpus (a deterministic sample), not k-means — trained centroids would
need float iteration that cannot be reproduced in ANSI SQL. The cell
count derives from corpus size as ``2**clamp(ceil(log2(n)/2), 2, 10)``
(≈√n, capped where a broadcast table stops being metadata-sized); at
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


def q_embedding_ivf_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    cells = _cells_for(emb.count())

    # centroid table: metadata-sized (≤1024 × 64 floats), driver-held and
    # broadcast — the standard small-dimension-table pattern.
    cent_rows = sorted(
        emb.filter(F.col("vec_id") < cells).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    C = _scaled_int([r.embedding for r in cent_rows])
    cell_ids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    c_sq = (C * C).sum(axis=1)

    # probe selection is a k-row argsort on the driver (same metadata scale
    # as the centroid collect): nprobe cells nearest the query's centroid
    # (vec 0 is centroid 0, distance 0 — its own cell is always probed).
    q_dist = c_sq - 2 * (C @ C[0]) + c_sq[0]
    order = np.lexsort((cell_ids, q_dist))
    probed = [int(cell_ids[i]) for i in order[:_NPROBE]]

    b_cent = spark.sparkContext.broadcast((C, cell_ids, c_sq))

    def assign(batches):
        Cb, ids, csq = b_cent.value
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"vec_id": pd.Series([], dtype="int64"),
                     "cell_id": pd.Series([], dtype="int64"),
                     "embedding": pd.Series([], dtype=object)}
                )
                continue
            V = _scaled_int(pdf["embedding"])
            # argmin_c ‖v−c‖² == argmin_c (c·c − 2 v·c); v·v is constant per
            # row. Pure int64 — exact. np.argmin takes the first minimum and
            # ids is sorted ascending, so ties break on the lowest cell id.
            dist = csq[None, :] - 2 * (V @ Cb.T)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"),
                 "cell_id": ids[dist.argmin(axis=1)],
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


# The oracle recomputes the identical pipeline in SQL: same cell-count
# formula over COUNT(*), same floor(x·10⁶) BIGINT space, same
# (dist, cell_id) tie-break, same rounded cosine.
_SQL_IVF_TOPK = f"""
WITH prm AS (
  SELECT CAST(POWER(2, LEAST({_MAX_CELL_BITS}, GREATEST({_MIN_CELL_BITS},
         CAST(CEIL(LOG2(COUNT(*)) / 2) AS INT)))) AS BIGINT) AS cells
  FROM embeddings
), s AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT)) AS sv
  FROM embeddings
), cent AS (
  SELECT vec_id AS cell_id, sv AS sc FROM s
  WHERE vec_id < (SELECT cells FROM prm)
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT s.vec_id, cent.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY CAST(list_sum(list_transform(range(1, {_DIMS + 1}),
                       d -> (s.sv[d] - cent.sc[d]) * (s.sv[d] - cent.sc[d])))
                      AS BIGINT), cent.cell_id) AS rn
    FROM s, cent)
  WHERE rn = 1
), probed AS (
  SELECT cell_id FROM (
    SELECT c.cell_id,
           ROW_NUMBER() OVER (
             ORDER BY CAST(list_sum(list_transform(range(1, {_DIMS + 1}),
                       d -> (c.sc[d] - q.sc[d]) * (c.sc[d] - q.sc[d])))
                      AS BIGINT), c.cell_id) AS rn
    FROM cent c, (SELECT sc FROM cent WHERE cell_id = 0) q)
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
"""


QUERIES = {"embedding_ivf_topk": q_embedding_ivf_topk}
ORACLES = {"embedding_ivf_topk": _SQL_IVF_TOPK}

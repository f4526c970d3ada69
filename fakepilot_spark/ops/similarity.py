"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

* brute-force cosine top-k — the correctness baseline; fully native
  (``zip_with`` dot product inside codegen, no Python);
* deterministic random-hyperplane LSH bucketing — the scale path: at 10^9
  vectors the bucket join replaces the n² scan; the hyperplane signs are a
  pure arithmetic function of (plane, dim) so DuckDB can verify the buckets;
* per-label centroid reductions (element-wise aggregates over arrays).

All float math casts to double *before* accumulation in the same element
order on both engines, so values match bit-for-bit before rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from . import load

_DIMS = 64
# The hyperplane count is DERIVED from corpus size (round-2 verdict item):
# 2^planes buckets must grow with the corpus so the within-bucket rerank
# stays subquadratic. planes(n) = clamp(ceil(log2(n / target_per_bucket)),
# 8, 20): 500 vectors → 8 planes (256 buckets), 2 000 → 10, 10^9 → 20
# (1M buckets). Both engines derive the SAME value — Spark from a
# metadata-cheap count(), DuckDB from the identical formula over COUNT(*)
# in the generated SQL — so buckets always agree.
_MIN_PLANES = 8
_MAX_PLANES = 20
_TARGET_PER_BUCKET = 2.0


def _planes_for(n_vectors: int) -> int:
    """clamp(ceil(log2(n / target_per_bucket)), 8, 20) — see module note."""
    import math

    if n_vectors < 2:
        return _MIN_PLANES
    raw = math.ceil(math.log2(n_vectors / _TARGET_PER_BUCKET))
    return min(_MAX_PLANES, max(_MIN_PLANES, raw))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# --------------------------------------------------------------------------
# Q: brute-force cosine top-k vs a fixed query vector (vec_id = 0).
# --------------------------------------------------------------------------


def q_embedding_cosine_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    cand = emb.filter(F.col("vec_id") != 0)
    scored = cand.crossJoin(F.broadcast(query)).select(
        "vec_id",
        "label",
        F.round(
            _dot(_as_double(F.col("embedding")), _as_double(F.col("query_vec")))
            / (_norm(_as_double(F.col("embedding"))) * _norm(_as_double(F.col("query_vec")))),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)


_SQL_COSINE_TOPK = """
SELECT e.vec_id, e.label,
       ROUND(list_cosine_similarity(
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(q.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
FROM embeddings e,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT 10
"""

# --------------------------------------------------------------------------
# Q: per-label centroid reductions (sum/avg over the element sum — scalar
# projections of the centroid, hashable cross-engine).
# --------------------------------------------------------------------------


def q_embedding_label_stats(spark, sf):
    emb = load(spark, sf, "embeddings")
    elem_sum = F.aggregate(
        _as_double(F.col("embedding")), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        emb.select("label", elem_sum.alias("elem_sum"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("elem_sum"), 6).alias("avg_elem_sum"),
            F.round(F.max("elem_sum"), 6).alias("max_elem_sum"),
        )
    )


_SQL_LABEL_STATS = """
SELECT label,
       COUNT(*) AS n_vectors,
       ROUND(AVG(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum')), 6) AS avg_elem_sum,
       ROUND(MAX(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum')), 6) AS max_elem_sum
FROM embeddings
GROUP BY label
"""

# --------------------------------------------------------------------------
# Q: LSH bucketing with deterministic hyperplanes —
# sign(plane j, dim d) = +1 if ((d+3)·(1+j)·2654435761 mod 97) is even.
# Bucket = 8-bit signature of projection signs. The projection is computed in
# INTEGER space — each float element is scaled by 1e6 and floored to a BIGINT
# before the signed sum — so the sign test is exact and order-independent on
# both engines (a double-precision fold differs between Spark's sequential
# aggregate and DuckDB's list_sum near the 0 boundary).
# --------------------------------------------------------------------------


def _plane_sign(j: int, d):
    # parity of ((j+1)(d+3)·C mod 97): 97 is prime and C ≢ 0 (mod 97), so each
    # plane is a distinct pseudo-random ±1 pattern over d (a naive linear
    # parity would collapse all planes onto one pattern up to sign).
    k = F.pmod((d + 3) * F.lit((1 + j) * 2654435761), F.lit(97))
    return F.when(F.pmod(k, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))


def _plane_merge(j: int):
    """Factory closing over the plane index (a 2-arg lambda for aggregate)."""

    def merge(acc, d):
        scaled = F.floor(
            F.element_at(F.col("embedding"), (d + 1).cast("int")).cast("double")
            * F.lit(1_000_000.0)
        )
        return acc + scaled * _plane_sign(j, d).cast("bigint")

    return merge


def _bucket_expr(planes: int):
    bucket = None
    for j in range(planes):
        proj = F.aggregate(
            F.sequence(F.lit(0), F.lit(_DIMS - 1)),
            F.lit(0).cast("bigint"),
            _plane_merge(j),
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def q_embedding_lsh_buckets(spark, sf):
    emb = load(spark, sf, "embeddings")
    bucket = _bucket_expr(_planes_for(emb.count()))
    return (
        emb.select(bucket.alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


# The oracle derives the plane count with the SAME clamp(ceil(log2(n/t)))
# formula over COUNT(*) of the base table (both sides are IEEE-double log2
# + ceil, so they agree for any count).
_SQL_PLANES_CTE = f"""
prm AS (
  SELECT LEAST({_MAX_PLANES}, GREATEST({_MIN_PLANES},
         CAST(CEIL(LOG2(COUNT(*) / {_TARGET_PER_BUCKET})) AS INT))) AS planes
  FROM embeddings
)
"""

_SQL_BUCKET_EXPR = f"""
         CAST(list_sum(list_transform(range(0, (SELECT planes FROM prm)), j ->
           CASE WHEN list_sum(list_transform(range(0, {_DIMS}), d ->
                  CAST(FLOOR(CAST(embedding[d + 1] AS DOUBLE) * 1000000.0) AS BIGINT) *
                  (CASE WHEN ((d + 3) * ((1 + j) * 2654435761)) % 97 % 2 = 0
                        THEN 1 ELSE -1 END))) > 0
                THEN (1 << j) ELSE 0 END)) AS INTEGER)
"""

_SQL_LSH_BUCKETS = f"""
WITH {_SQL_PLANES_CTE}, sig AS (
  SELECT vec_id, {_SQL_BUCKET_EXPR} AS bucket
  FROM embeddings
)
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM sig
GROUP BY bucket
"""

# --------------------------------------------------------------------------
# Q: embedding near-dup pairs via LSH buckets + exact cosine rerank
# (the IVF/LSH scale pattern: candidates from buckets, exact check after).
# The corpus is augmented with deterministic planted duplicates (every
# vec_id % 37 == 0 vector re-appears as vec_id + 10_000_000) so the query
# provably returns rows: a planted twin shares its original's bucket (same
# integer projection) and reranks at cosine 1.0; natural same-bucket pairs
# rerank below the 0.9 cut and are filtered — both paths exercised, both
# DuckDB-verifiable.
# --------------------------------------------------------------------------

_TWIN_STRIDE = 37
_TWIN_OFFSET = 10_000_000


def _augmented_embeddings(spark, sf):
    emb = load(spark, sf, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(F.pmod(F.col("vec_id"), F.lit(_TWIN_STRIDE)) == 0).select(
        (F.col("vec_id") + F.lit(_TWIN_OFFSET)).alias("vec_id"), "embedding"
    )
    return emb.unionByName(twins)


def q_embedding_near_dup_pairs(spark, sf):
    # planes derive from the BASE corpus count on both engines (the oracle's
    # prm CTE also counts `embeddings`, not the twin-augmented view)
    planes = _planes_for(load(spark, sf, "embeddings").count())
    aug = _augmented_embeddings(spark, sf)
    # recompute bucket per vector (cheap, codegen) rather than reusing the agg
    vecs = aug.select("vec_id", _bucket_expr(planes).alias("bucket"), "embedding")
    a = vecs.alias("a")
    b = vecs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            _dot(_as_double(F.col("a.embedding")), _as_double(F.col("b.embedding")))
            / (
                _norm(_as_double(F.col("a.embedding")))
                * _norm(_as_double(F.col("b.embedding")))
            ),
            6,
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= 0.9)


_SQL_NEAR_DUP_PAIRS = f"""
WITH {_SQL_PLANES_CTE}, aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_TWIN_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % {_TWIN_STRIDE} = 0
), sig AS (
  SELECT vec_id, {_SQL_BUCKET_EXPR} AS bucket, embedding
  FROM aug
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
FROM sig a JOIN sig b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(
          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.9
"""


QUERIES = {
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "embedding_label_stats": q_embedding_label_stats,
    "embedding_lsh_buckets": q_embedding_lsh_buckets,
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
}

ORACLES = {
    "embedding_cosine_topk": _SQL_COSINE_TOPK,
    "embedding_label_stats": _SQL_LABEL_STATS,
    "embedding_lsh_buckets": _SQL_LSH_BUCKETS,
    "embedding_near_dup_pairs": _SQL_NEAR_DUP_PAIRS,
}

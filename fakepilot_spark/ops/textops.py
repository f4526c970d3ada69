"""Training-data text pipeline operators over the ``documents`` table.

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), quality scoring,
token statistics, language-ID heuristics, and document fingerprinting — the
operations a 100 TB web-text corpus pipeline runs after extraction.

Scale notes: everything except the two sketch-based dedups is pure native
Spark SQL (codegen, shuffle only on groupBy/join keys). The sketch dedups use
one Arrow-batched pandas UDF to compute signatures, then native banding joins
— the LSH trick is precisely what makes near-dup detection feasible at 10^10
documents (candidate pairs ∝ band collisions, not n²).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from . import load

# --------------------------------------------------------------------------
# Q: exact dedup via content hash (hash-groupBy; no n² anything).
# --------------------------------------------------------------------------


def q_doc_exact_dedup(spark, sf):
    docs = load(spark, sf, "documents")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 1)
    )


_SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) >= 1
"""

# --------------------------------------------------------------------------
# Q: token statistics (whitespace tokenizer).
# --------------------------------------------------------------------------


def q_doc_token_stats(spark, sf):
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("len_chars"),
    )


_SQL_TOKEN_STATS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       length(text) AS len_chars
FROM documents
"""

# --------------------------------------------------------------------------
# Q: quality scoring (length/token saturation blend).
# --------------------------------------------------------------------------


def q_doc_quality(spark, sf):
    docs = load(spark, sf, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    quality = F.round(
        F.least(n_tokens / 300.0, F.lit(1.0)) * 0.7
        + F.least(F.length("text") / 1500.0, F.lit(1.0)) * 0.3,
        4,
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
    )


_SQL_DOC_QUALITY = """
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       ROUND(LEAST(len(string_split(text, ' ')) / 300.0, 1.0) * 0.7
             + LEAST(length(text) / 1500.0, 1.0) * 0.3, 4) AS quality
FROM documents
"""

# --------------------------------------------------------------------------
# Q: language-ID heuristic (stopword density; n-gram-free, SQL-expressible).
# --------------------------------------------------------------------------

_STOPWORD_PATTERN = r"\b(the|a|of|and|to)\b"


def q_doc_langid(spark, sf):
    docs = load(spark, sf, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    hits = F.regexp_count(F.col("text"), F.lit(_STOPWORD_PATTERN))
    density = F.round(hits / n_tokens, 4)
    return docs.select(
        "doc_id",
        hits.alias("stopword_hits"),
        density.alias("stopword_density"),
        F.when(density > 0.03, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
        "lang",
    )


_SQL_DOC_LANGID = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_STOPWORD_PATTERN}')) AS stopword_hits,
       ROUND(len(regexp_extract_all(text, '{_STOPWORD_PATTERN}'))
             / len(string_split(text, ' ')), 4) AS stopword_density,
       CASE WHEN ROUND(len(regexp_extract_all(text, '{_STOPWORD_PATTERN}'))
                       / len(string_split(text, ' ')), 4) > 0.03
            THEN 'en' ELSE 'unk' END AS pred_lang,
       lang
FROM documents
"""

# --------------------------------------------------------------------------
# Q: document fingerprint (whitespace-normalized content hash prefix).
# --------------------------------------------------------------------------


def q_doc_fingerprint(spark, sf):
    docs = load(spark, sf, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.substring(F.md5(normalized), 1, 16).alias("fingerprint"),
    )


_SQL_DOC_FINGERPRINT = r"""
SELECT doc_id,
       substring(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16)
         AS fingerprint
FROM documents
"""

# --------------------------------------------------------------------------
# Q: n-gram (token-set) Jaccard near-dup pairs within a source.
# Candidate scoping by `source` keeps the self-join bounded — the same
# blocking idea that LSH generalizes.
# --------------------------------------------------------------------------


def q_ngram_jaccard_pairs(spark, sf):
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_toks") + F.col("sb.n_toks") - F.col("n_common")),
                4,
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.9).select("doc_a", "doc_b", "jaccard")


_SQL_NGRAM_JACCARD = """
WITH toks AS (
  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM toks a JOIN toks b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_common / (sa.n_toks + sb.n_toks - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE ROUND(n_common / (sa.n_toks + sb.n_toks - n_common), 4) >= 0.9
"""

# --------------------------------------------------------------------------
# Q: MinHash + LSH candidate pairs (sketch path; rows-only driver check —
# the hash family is not reproducible in ANSI SQL).
# --------------------------------------------------------------------------

_MINHASH_PERMS = 32
_LSH_BANDS = 8  # 4 rows per band
_MERSENNE = (1 << 61) - 1


def _stable64(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")


def _minhash_signature(text: str, n_shingle: int = 3) -> list:
    toks = text.split()
    if len(toks) < n_shingle:
        shingles = {" ".join(toks)} if toks else {""}
    else:
        shingles = {
            " ".join(toks[j : j + n_shingle]) for j in range(len(toks) - n_shingle + 1)
        }
    hashes = np.fromiter((_stable64(s) for s in shingles), dtype=np.uint64)
    # affine permutations over a Mersenne prime (classic Broder construction)
    a = (np.arange(1, _MINHASH_PERMS + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    b = np.arange(_MINHASH_PERMS, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    vals = (np.outer(a, hashes) + b[:, None]) % np.uint64(_MERSENNE)
    return [int(x) for x in vals.min(axis=1).astype(np.int64)]


@pandas_udf(ArrayType(LongType()))
def _minhash_udf(text: pd.Series) -> pd.Series:
    return text.map(_minhash_signature)


def q_minhash_lsh_pairs(spark, sf):
    docs = load(spark, sf, "documents")
    sigs = docs.select("doc_id", _minhash_udf("text").alias("sig"))
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_LSH_BANDS - 1)),
                lambda band: F.slice("sig", band * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "band_sig"),
    ).withColumn("band_key", F.concat_ws("_", F.col("band"), F.concat_ws(",", "band_sig")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Q: SimHash near-dup buckets (rows-only): 64-bit signature via pandas UDF,
# hamming distance through native bit_count(xor) on band-joined candidates.
# --------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = _stable64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    sig = 0
    for bit in np.nonzero(acc > 0)[0]:
        sig |= 1 << int(bit)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@pandas_udf(LongType())
def _simhash_udf(text: pd.Series) -> pd.Series:
    return text.map(_simhash64)


def q_simhash_near_pairs(spark, sf):
    docs = load(spark, sf, "documents")
    sigs = docs.select("doc_id", _simhash_udf("text").alias("sig"))
    # 4 bands of 16 bits: any pair within hamming<=3 of 64 bits must collide
    # on at least one band (pigeonhole).
    banded = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sig", k * 16).bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 3)


# --------------------------------------------------------------------------
# Q: multimodal plumbing — opaque binary payloads + typed metadata. The
# decode step is a deterministic stand-in (image/audio libs absent; SURVEY
# §8): schema, batch shape and partitioning are the real, tested parts.
# --------------------------------------------------------------------------


def q_binary_payload_profile(spark, sf):
    docs = load(spark, sf, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return (
        docs.select(
            modality.alias("modality"),
            F.length(payload).alias("n_bytes"),
        )
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


_SQL_BINARY_PROFILE = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS modality,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY 1
"""


QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_near_pairs": q_simhash_near_pairs,
    "binary_payload_profile": q_binary_payload_profile,
}

ORACLES = {
    "doc_exact_dedup": _SQL_EXACT_DEDUP,
    "doc_token_stats": _SQL_TOKEN_STATS,
    "doc_quality": _SQL_DOC_QUALITY,
    "doc_langid": _SQL_DOC_LANGID,
    "doc_fingerprint": _SQL_DOC_FINGERPRINT,
    "ngram_jaccard_pairs": _SQL_NGRAM_JACCARD,
    "binary_payload_profile": _SQL_BINARY_PROFILE,
    # minhash_lsh_pairs / simhash_near_pairs: sketch hash families are not
    # ANSI-SQL-expressible → rows-only driver check (allowed by contract).
}

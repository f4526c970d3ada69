"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decoding libraries are not installed in this container
(task contract: STUB the decode behind a deterministic fake / clear
``NotImplementedError``, make the Spark-side plumbing real). Everything
around the decode IS real and tested: binary columns, typed metadata
structs, ``mapInPandas`` batch shape, and partitioning.

At 100 TB the pattern is: payloads stay in the table as ``binary`` (or
pointers), decode/feature-extract runs Arrow-batched with bounded
``maxRecordsPerBatch``, and features come back as fixed-width arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import load

_REAL_DECODERS = False
try:  # pragma: no cover - libs absent in this container by contract
    import PIL.Image  # noqa: F401

    _REAL_DECODERS = True
except ImportError:
    pass


def _fake_decode_features(payload: bytes, n_features: int = 8) -> list:
    """Deterministic stand-in for decode + feature extraction.

    Folds payload bytes into ``n_features`` accumulators (feature j = sum of
    bytes at positions ≡ j mod n_features) — stable, content-sensitive, and
    library-free; integer-valued doubles, so aggregates over them are exact
    on any engine.  Always valid regardless of which libraries are
    installed: the driver-contract query uses it *explicitly* because its
    DuckDB oracle recomputes the same fold arithmetically.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % n_features
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    folded = arr.reshape(-1, n_features).sum(axis=0, dtype=np.float64)
    return [float(x) for x in folded]


def _real_decode_features(payload: bytes, n_features: int = 8) -> list:
    """Real decode path: PIL image → grayscale → ``n_features``-column
    resize → per-column pixel means.  Only reachable when PIL is installed
    (it is not in this container, by contract); raises with a clear message
    rather than silently falling back, so a misconfigured deployment fails
    loudly instead of producing fake features.
    """
    if not _REAL_DECODERS:
        raise RuntimeError(
            "real decoders requested but PIL is not installed; use "
            "decode_features(..., use_real=False) for the deterministic fake"
        )
    import io

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    img = img.resize((n_features, 1))
    return [float(x) for x in np.asarray(img, dtype=np.float64).ravel()]


def decode_features(
    payload: bytes, n_features: int = 8, use_real: bool | None = None
) -> list:
    """Dispatch decode + feature extraction.

    ``use_real=None`` (default) auto-selects: the real PIL path when the
    library is present, the deterministic byte-fold otherwise.  The
    driver-contract query pins ``_fake_decode_features`` directly — its
    oracle depends on the fold's determinism — so installing PIL changes
    nothing there.
    """
    if use_real is None:
        use_real = _REAL_DECODERS
    if use_real:
        return _real_decode_features(payload, n_features)
    return _fake_decode_features(payload, n_features)


def media_items(spark, sf) -> DataFrame:
    """documents.text re-typed as an opaque binary payload with metadata —
    the multimodal table shape (payload binary, modality, n_bytes)."""
    docs = load(spark, sf, "documents")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("item_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
    )


def q_media_features(spark, sf) -> DataFrame:
    """Batch decode + feature extraction via mapInPandas (Arrow-bounded)."""
    items = media_items(spark, sf)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(bytes(p)) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return items.mapInPandas(
        decode,
        "item_id long, modality string, n_bytes long, features array<double>",
    )


def q_media_feature_profile(spark, sf) -> DataFrame:
    """Aggregated view used by the driver check: per-modality feature sums.

    The decoded features are integer-valued (byte-fold sums), so the
    aggregate is exact and the whole pipeline — including the mapInPandas
    decode output — is verified value-level against a DuckDB oracle that
    recomputes the fold arithmetically from the text bytes (ASCII corpus:
    ``ord(substr(...))`` is the byte; the corpus-is-ASCII precondition is
    gated by ``tests/test_multimodal.py::test_documents_corpus_is_ascii``)."""
    feats = q_media_features(spark, sf)
    f0 = F.element_at("features", 1)
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(f0).cast("bigint").alias("sum_f0"),
    )


_SQL_MEDIA_PROFILE = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS modality,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(list_sum(list_transform(
           range(1, length(text) + 1, 8),
           i -> ord(substr(text, i, 1))))) AS BIGINT) AS sum_f0
FROM documents
GROUP BY 1
"""


QUERIES = {"media_feature_profile": q_media_feature_profile}
ORACLES = {"media_feature_profile": _SQL_MEDIA_PROFILE}

"""Multimodal plumbing gate: binary payload schema, Arrow batch shape,
deterministic fake-decode features."""

from __future__ import annotations


def test_media_features_shape_and_determinism(spark):
    from fakepilot_spark.ops.multimodal import q_media_features

    sf = "/root/testdata/sf0.001"
    a = {r["item_id"]: r["features"] for r in q_media_features(spark, sf).collect()}
    b = {r["item_id"]: r["features"] for r in q_media_features(spark, sf).collect()}
    assert a == b  # deterministic across runs/partitionings
    assert len(a) == 500
    for feats in a.values():
        assert len(feats) == 8
        # integer-valued byte-fold sums: exact under any aggregation order
        assert all(f >= 0 and f == int(f) for f in feats)
        assert sum(feats) > 0


def test_media_modalities_cover_all(spark):
    from fakepilot_spark.ops.multimodal import media_items

    mods = {
        r["modality"]
        for r in media_items(spark, "/root/testdata/sf0.001").select("modality").distinct().collect()
    }
    assert mods == {"image", "audio", "video"}


def test_documents_corpus_is_ascii():
    """Oracle-parity guard: the media_feature_profile DuckDB oracle indexes
    text by CHARACTER (``ord(substr(...))``) while the Spark path folds
    UTF-8 BYTES — the two agree iff the documents text is pure ASCII.
    If testdata ever grows non-ASCII rows this fails loudly instead of the
    driver gate failing mysteriously (round-2 ADVICE, multimodal.py)."""
    from pathlib import Path

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = Path(f"/root/testdata/{sf}/documents.parquet")
        if not path.exists():
            continue
        (n_bad,) = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) != length(text)"
        ).fetchone()
        assert n_bad == 0, f"{sf}: {n_bad} non-ASCII document rows"


def test_decode_features_dispatch_fake_branch():
    """Without real decoders, decode_features auto-selects the fake fold;
    forcing the real path raises a clear error instead of fake output
    (round-4 ADVICE: the old guard raised on the *healthy* branch)."""
    import pytest

    from fakepilot_spark.ops import multimodal as mm

    payload = b"abcdefgh" * 3
    want = mm._fake_decode_features(payload)
    assert mm.decode_features(payload) == want  # auto: PIL absent here
    assert mm.decode_features(payload, use_real=False) == want
    with pytest.raises(RuntimeError, match="PIL is not installed"):
        mm.decode_features(payload, use_real=True)


def test_decode_features_dispatch_real_branch(monkeypatch):
    """With real decoders present (simulated), auto-dispatch takes the real
    path and never touches the fake fold."""
    from fakepilot_spark.ops import multimodal as mm

    calls = {}

    def fake_real(payload, n_features=8):
        calls["payload"] = payload
        return [1.0] * n_features

    monkeypatch.setattr(mm, "_REAL_DECODERS", True)
    monkeypatch.setattr(mm, "_real_decode_features", fake_real)
    out = mm.decode_features(b"xyz")
    assert out == [1.0] * 8
    assert calls["payload"] == b"xyz"
    # the fake stays selectable even when real decoders exist (the
    # driver-contract query pins it for oracle determinism)
    assert mm.decode_features(b"abcdefgh", use_real=False) == mm._fake_decode_features(b"abcdefgh")

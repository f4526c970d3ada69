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

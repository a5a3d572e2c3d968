"""Multimodal asset plumbing: schema, Arrow-batched decode/feature stages,
frame sampling, and the explicit real-codec boundary."""

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.sources import multimodal as mm


def test_asset_schema_and_determinism(spark):
    a1 = mm.synthetic_assets(spark, 32).collect()
    a2 = mm.synthetic_assets(spark, 32).collect()
    assert [r.asdict() if hasattr(r, "asdict") else r.asDict() for r in a1] == [
        r.asDict() for r in a2
    ]
    kinds = {r["kind"] for r in a1}
    assert kinds == {"image", "audio", "video"}
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in a1)


def test_image_feature_extraction(spark):
    assets = mm.synthetic_assets(spark, 48)
    feats = mm.extract_image_features(assets)
    rows = feats.collect()
    assert len(rows) == assets.where(F.col("kind") == "image").count()
    for r in rows:
        assert r["width"] % 64 == 0 and 64 <= r["width"] <= 1024
        assert r["height"] % 64 == 0 and 64 <= r["height"] <= 576
        assert r["n_bytes"] > 8
        assert len(r["content_hash"]) == 32


def test_real_codec_is_explicit_boundary(spark):
    assets = mm.synthetic_assets(spark, 6)
    feats = mm.extract_image_features(assets, use_real_codec=True)
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        feats.collect()


def test_frame_sampling(spark):
    assets = mm.synthetic_assets(spark, 48)
    frames = mm.sample_frames(assets)
    pdf = frames.toPandas()
    n_videos = assets.where(F.col("kind") == "video").count()
    assert pdf["asset_id"].nunique() == n_videos
    # every video yields 1..4 frames, inde xed from 0
    per = pdf.groupby("asset_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per["min"] == 0).all()
    assert (per["count"] <= 4).all()


def test_content_address_and_binary_dedup(spark):
    """sha256 over raw payload bytes: byte-identical assets collapse to one
    keep_id; distinct payloads never group."""
    from kausaldb_spark.sources.multimodal import (
        content_address,
        exact_binary_duplicates,
        synthetic_assets,
    )
    from pyspark.sql import functions as F

    assets = synthetic_assets(spark, n=16)
    # plant two byte-identical copies of asset 0's payload
    dup = assets.where(F.col("asset_id") == "asset_0").select(
        F.lit("asset_copy_a").alias("asset_id"), "kind", "payload", "meta"
    )
    dup2 = dup.select(F.lit("asset_copy_b").alias("asset_id"), "kind", "payload", "meta")
    all_assets = assets.unionByName(dup).unionByName(dup2)

    ca = content_address(all_assets)
    assert ca.columns == ["asset_id", "n_bytes", "sha256"]
    assert ca.count() == 18
    groups = exact_binary_duplicates(all_assets).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_assets"] == 3 and g["keep_id"] == "asset_0"
    assert len(g["sha256"]) == 64

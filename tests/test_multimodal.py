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


# ---------------------------------------------------------------------------
# real header probing (format specs, no codec library)
# ---------------------------------------------------------------------------

def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02" + b"\x00" * 7)


def _jpeg(w, h):
    # SOI, APP0 (JFIF stub), DHT (must be skipped), SOF0, EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app0 + dht + sof + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _bmp(w, h, top_down=False):
    hh = (-h if top_down else h).to_bytes(4, "little", signed=True)
    return (b"BM" + b"\x00" * 16 + w.to_bytes(4, "little", signed=True) + hh
            + b"\x00" * 10)


def test_probe_dimensions_pure():
    from kausaldb_spark.sources.multimodal import probe_dimensions

    assert probe_dimensions(_png(640, 480)) == ("png", 640, 480)
    assert probe_dimensions(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert probe_dimensions(_gif(320, 200)) == ("gif", 320, 200)
    assert probe_dimensions(_bmp(800, 600)) == ("bmp", 800, 600)
    assert probe_dimensions(_bmp(800, 600, top_down=True)) == ("bmp", 800, 600)
    assert probe_dimensions(b"plainly not an image") == (None, None, None)
    # JPEG with SOI but truncated before any SOF
    assert probe_dimensions(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == ("jpeg", None, None)


def test_probe_image_metadata_stage(spark):
    from kausaldb_spark.sources.multimodal import probe_image_metadata

    rows = [
        ("a1", "image", _png(10, 20), None),
        ("a2", "image", _jpeg(30, 40), None),
        ("a3", "image", _gif(5, 6), None),
        ("a4", "image", _bmp(7, 8), None),
        ("a5", "image", b"garbage", None),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id string, kind string, payload binary, meta map<string,string>"
    )
    out = {r["asset_id"]: r for r in probe_image_metadata(assets).collect()}
    assert (out["a1"]["format"], out["a1"]["width"], out["a1"]["height"]) == ("png", 10, 20)
    assert (out["a2"]["format"], out["a2"]["width"], out["a2"]["height"]) == ("jpeg", 30, 40)
    assert (out["a3"]["format"], out["a3"]["width"], out["a3"]["height"]) == ("gif", 5, 6)
    assert (out["a4"]["format"], out["a4"]["width"], out["a4"]["height"]) == ("bmp", 7, 8)
    assert out["a5"]["format"] is None
    assert out["a1"]["n_bytes"] == len(_png(10, 20))

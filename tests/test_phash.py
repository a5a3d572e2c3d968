"""Perceptual-hash near-dup pins (r12): the fixture constructs images that
hash to chosen bit patterns — these tests pin the construction margin, the
generic pooling path (non-square, non-divisible sizes), the planted-pair
contract end-to-end through Spark, and per-row isolation."""

import numpy as np
import pytest

from kausaldb_spark.sources import multimodal as mm


def _expected_bands(bits):
    out = []
    for b in range(4):
        v = 0
        for jb in range(16):
            j = 16 * b + jb
            if j < mm.PHASH_BITS and bits[j]:
                v |= 1 << jb
        out.append(v)
    return out


def test_fixture_roundtrip_and_margin():
    """phash63(decode(synth(d))) must equal the planted md5 pattern, with
    a comfortable coefficient margin over uint8 rounding noise."""
    worst = 1e9
    for d in list(range(120)) + [4999, 54321, 10**7 + 1]:
        bits = mm.phash_fixture_bits(d)
        img = mm._phash_fixture_image(bits)
        px = mm.decode_pixels(mm._bmp_gray64(img))
        assert mm.phash63(px) == _expected_bands(bits), d
        basis = mm._dct32_basis()
        coef = basis @ px[::2, ::2, 0].astype(float) @ basis.T
        vals = coef[:8, :8].flatten()[1:]
        worst = min(worst, np.abs(vals - vals.mean()).min())
    assert worst > 5.0, worst  # amplitude 20 vs rounding noise < ~9


def test_planted_pair_hamming():
    for d in (1, 11, 101, 991):
        a = mm.phash_fixture_bits(d - 1)
        b = mm.phash_fixture_bits(d)
        ham = sum(x != y for x, y in zip(a, b))
        assert ham <= 2, (d, ham)
    # non-partners: independent md5 patterns sit far apart
    a = mm.phash_fixture_bits(2)
    b = mm.phash_fixture_bits(3)
    assert sum(x != y for x, y in zip(a, b)) > mm.MAX_PHASH_HAMMING


def test_phash_generic_pooling_sizes():
    """Non-divisible and non-square sizes pool without error and an image
    and its 2x replication hash IDENTICALLY (scale invariance — the whole
    point of a perceptual hash)."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    h1 = mm.phash63(base)
    rep = np.repeat(np.repeat(base, 2, 0), 2, 1)
    assert mm.phash63(rep) == h1
    # odd sizes: just structural (deterministic, no crash, right shape)
    odd = rng.integers(0, 256, size=(45, 67, 3), dtype=np.uint8)
    bands = mm.phash63(odd)
    assert len(bands) == 4 and all(0 <= v < 1 << 16 for v in bands)
    with pytest.raises(ValueError):
        mm.phash63(np.zeros((16, 16), np.uint8))  # too small


def test_phash_near_dup_end_to_end(spark):
    """Planted partners surface as pairs; decode failures are isolated."""
    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    assets = mm.synthetic_phash_assets(docs)
    bands = mm.image_phash_bands(assets)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm.phash_near_dup(bands).collect()
    }
    for d in (1, 11, 21, 31, 41, 51):
        assert (d - 1, d) in pairs and pairs[(d - 1, d)] <= 2, (d, pairs)
    # every reported pair is genuinely close in the planted signature space
    for (a, b), ham in pairs.items():
        bits_a = mm.phash_fixture_bits(a)
        bits_b = mm.phash_fixture_bits(b)
        assert sum(x != y for x, y in zip(bits_a, bits_b)) == ham


def test_phash_band_stage_isolates_bad_rows(spark):
    rows = [("7", mm._bmp_gray64(mm._phash_fixture_image(mm.phash_fixture_bits(7)))),
            ("bad", b"not an image"),
            ("tiny", mm.synth_container(2, 1))]  # header-only JPEG: corrupt
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r["asset_id"]: r for r in mm.image_phash_bands(assets).collect()}
    assert got["7"]["err"] is None and got["7"]["b0"] is not None
    assert got["bad"]["err"] is not None and got["bad"]["b0"] is None
    assert got["tiny"]["err"] is not None

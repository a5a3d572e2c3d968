"""Multi-frame GIF animation decode vs an INDEPENDENT encoder + an
independent compositing model (same discipline as the JPEG/PNG/GIF
single-frame pins in test_multimodal.py: the test side writes the bytes
with its own encoder and computes the expected composite with its own
loop, so any agreement bug would have to be made twice)."""

import numpy as np
import pytest

from kausaldb_spark.sources.gif_anim import decode_gif_frames
from tests.test_multimodal import _gif_lzw_encode


# ---------------------------------------------------------------- encoder


def _pal_bytes(pal):
    size_field = max(1, (len(pal) - 1).bit_length()) - 1
    out = bytearray()
    for r, g, b in pal:
        out += bytes([r, g, b])
    out += b"\x00" * (3 * ((2 << size_field) - len(pal)))
    return bytes(out), size_field


def _anim_encode(screen_wh, gct, bg_index, frames, trailer=True):
    """Independent GIF89a animation writer. Each frame dict:
    idx (2D np index array), pos (x, y), disposal, transparent (index or
    None), delay_cs, local_pal (palette list or None), interlace."""
    import struct

    w, h = screen_wh
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    if gct is not None:
        pb, sf = _pal_bytes(gct)
        out += bytes([0x80 | sf, bg_index, 0]) + pb
    else:
        out += bytes([0x00, bg_index, 0])
    # a NETSCAPE application extension the decoder must skip
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if (
            f.get("disposal")
            or f.get("transparent") is not None
            or f.get("delay_cs")
        ):
            gflags = (f.get("disposal", 0) & 7) << 2
            tidx = 0
            if f.get("transparent") is not None:
                gflags |= 1
                tidx = f["transparent"]
            out += bytes([0x21, 0xF9, 0x04, gflags])
            out += struct.pack("<H", f.get("delay_cs", 0))
            out += bytes([tidx, 0x00])
        # a comment extension between GCE and descriptor must NOT detach
        # the pending GCE from its image
        out += b"\x21\xfe\x05hello\x00"
        ih, iw = f["idx"].shape
        x, y = f.get("pos", (0, 0))
        lp = f.get("local_pal")
        iflags = 0x40 if f.get("interlace") else 0
        if lp is not None:
            pb, sf = _pal_bytes(lp)
            iflags |= 0x80 | sf
        else:
            _, sf = _pal_bytes(gct)
        out += b"\x2c" + struct.pack("<HHHH", x, y, iw, ih) + bytes([iflags])
        if lp is not None:
            out += pb
        rows = f["idx"]
        if f.get("interlace"):
            order = (
                list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2))
            )
            rows = rows[order]
        mcs = max(2, sf + 1)
        out += bytes([mcs])
        lzw = _gif_lzw_encode(rows.reshape(-1).tolist(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    if trailer:
        out += b"\x3b"
    return bytes(out)


# ------------------------------------------------- independent composite


def _model(screen_wh, gct, bg_index, frames):
    w, h = screen_wh
    bg = (
        tuple(gct[bg_index])
        if gct is not None and bg_index < len(gct)
        else (0, 0, 0)
    )
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:, :] = bg
    out = []
    for f in frames:
        pal = f.get("local_pal") if f.get("local_pal") is not None else gct
        x, y = f.get("pos", (0, 0))
        ih, iw = f["idx"].shape
        before = canvas.copy()
        for r in range(ih):
            for c in range(iw):
                v = int(f["idx"][r, c])
                if f.get("transparent") is not None and v == f["transparent"]:
                    continue
                canvas[y + r, x + c] = pal[v]
        out.append((canvas.copy(), f.get("delay_cs", 0)))
        d = f.get("disposal", 0)
        if d == 2:
            canvas[y : y + ih, x : x + iw] = bg
        elif d == 3:
            canvas = before
    return out


def _assert_frames_equal(got, want):
    assert len(got) == len(want)
    for i, ((gf, gd), (wf, wd)) in enumerate(zip(got, want)):
        assert gd == wd, f"frame {i} delay"
        np.testing.assert_array_equal(gf, wf, err_msg=f"frame {i}")


PAL8 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
        (0, 0, 0), (255, 255, 255), (128, 128, 128), (10, 20, 30)]


# ------------------------------------------------------------------ tests


def test_three_frames_full_redraw():
    rng = np.random.default_rng(7)
    frames = [
        {"idx": rng.integers(0, 8, (10, 12)), "delay_cs": 4 * (i + 1)}
        for i in range(3)
    ]
    data = _anim_encode((12, 10), PAL8, 0, frames)
    _assert_frames_equal(
        decode_gif_frames(data), _model((12, 10), PAL8, 0, frames)
    )


def test_delta_frames_with_offsets_and_transparency():
    rng = np.random.default_rng(11)
    frames = [
        {"idx": rng.integers(0, 8, (20, 16))},
        # small patch at an offset; index 3 is transparent (canvas shows)
        {"idx": rng.integers(0, 8, (5, 6)), "pos": (4, 7),
         "transparent": 3, "delay_cs": 10},
        {"idx": rng.integers(0, 8, (3, 3)), "pos": (13, 17),
         "transparent": 0},
    ]
    data = _anim_encode((16, 20), PAL8, 4, frames)
    _assert_frames_equal(
        decode_gif_frames(data), _model((16, 20), PAL8, 4, frames)
    )


@pytest.mark.parametrize("disposal", [0, 1, 2, 3])
def test_disposal_methods(disposal):
    rng = np.random.default_rng(13 + disposal)
    frames = [
        {"idx": rng.integers(0, 8, (9, 9))},
        {"idx": rng.integers(0, 8, (4, 5)), "pos": (2, 3),
         "disposal": disposal},
        {"idx": rng.integers(0, 8, (2, 2)), "pos": (6, 6),
         "transparent": 1},
    ]
    data = _anim_encode((9, 9), PAL8, 5, frames)
    _assert_frames_equal(
        decode_gif_frames(data), _model((9, 9), PAL8, 5, frames)
    )


def test_local_palettes_and_interlace():
    rng = np.random.default_rng(29)
    lp = [(i * 16 % 256, 255 - i * 8 % 256, i * 3 % 256) for i in range(16)]
    frames = [
        {"idx": rng.integers(0, 8, (17, 11)), "interlace": True},
        {"idx": rng.integers(0, 16, (8, 8)), "pos": (1, 5),
         "local_pal": lp, "transparent": 2, "disposal": 3},
        {"idx": rng.integers(0, 8, (17, 11)), "transparent": 7},
    ]
    data = _anim_encode((11, 17), PAL8, 0, frames)
    _assert_frames_equal(
        decode_gif_frames(data), _model((11, 17), PAL8, 0, frames)
    )


def test_first_frame_matches_single_frame_decoder():
    from kausaldb_spark.sources.multimodal import decode_pixels

    rng = np.random.default_rng(31)
    frames = [{"idx": rng.integers(0, 8, (6, 6)), "pos": (1, 1),
               "delay_cs": 3},
              {"idx": rng.integers(0, 8, (8, 8))}]
    # bg_index 0 so the anim canvas fill (bg color) matches the
    # single-frame decoder's entry-0 fill
    data = _anim_encode((8, 8), PAL8, 0, frames)
    f0 = decode_gif_frames(data, max_frames=1)
    assert len(f0) == 1 and f0[0][1] == 3
    np.testing.assert_array_equal(f0[0][0], decode_pixels(data))


def test_max_frames_stops_early_and_is_prefix():
    rng = np.random.default_rng(37)
    frames = [{"idx": rng.integers(0, 8, (5, 5)), "disposal": 2,
               "transparent": 6, "delay_cs": i} for i in range(6)]
    data = _anim_encode((5, 5), PAL8, 2, frames)
    all_f = decode_gif_frames(data)
    head = decode_gif_frames(data, max_frames=3)
    assert len(all_f) == 6 and len(head) == 3
    _assert_frames_equal(head, all_f[:3])


def test_missing_trailer_still_decodes_parsed_frames():
    rng = np.random.default_rng(41)
    frames = [{"idx": rng.integers(0, 8, (4, 4))}]
    data = _anim_encode((4, 4), PAL8, 0, frames, trailer=False)
    assert len(decode_gif_frames(data)) == 1


def test_error_contract():
    rng = np.random.default_rng(43)
    ok = _anim_encode(
        (6, 6), PAL8, 0, [{"idx": rng.integers(0, 8, (6, 6))}]
    )
    with pytest.raises(ValueError):
        decode_gif_frames(b"NOTAGIF")
    with pytest.raises(ValueError):  # frame exceeds logical screen
        decode_gif_frames(
            _anim_encode((4, 4), PAL8, 0,
                         [{"idx": rng.integers(0, 8, (6, 6))}])
        )
    with pytest.raises(ValueError):  # truncated mid-stream
        decode_gif_frames(ok[: len(ok) - 8])
    with pytest.raises(ValueError):  # no image data at all
        decode_gif_frames(ok[:13] + PAL8[0][0].to_bytes(1, "big") * 0 + b"\x3b")


def test_hypothesis_style_sweep():
    """Deterministic mini-sweep over the option lattice (the full
    hypothesis harness lives in test_multimodal for the single-frame
    codecs; this keeps the anim matrix bounded and reproducible)."""
    rng = np.random.default_rng(101)
    for trial in range(24):
        w, h = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        npal = int(rng.choice([2, 4, 8, 16]))
        pal = [tuple(int(v) for v in rng.integers(0, 256, 3))
               for _ in range(npal)]
        bg = int(rng.integers(0, npal))
        n_frames = int(rng.integers(1, 5))
        frames = []
        for _ in range(n_frames):
            iw = int(rng.integers(1, w + 1))
            ih = int(rng.integers(1, h + 1))
            x = int(rng.integers(0, w - iw + 1))
            y = int(rng.integers(0, h - ih + 1))
            f = {
                "idx": rng.integers(0, npal, (ih, iw)),
                "pos": (x, y),
                "disposal": int(rng.integers(0, 4)),
                "delay_cs": int(rng.integers(0, 200)),
            }
            if rng.random() < 0.5:
                f["transparent"] = int(rng.integers(0, npal))
            if rng.random() < 0.3:
                f["interlace"] = True
            if rng.random() < 0.3:
                f["local_pal"] = [
                    tuple(int(v) for v in rng.integers(0, 256, 3))
                    for _ in range(npal)
                ]
            frames.append(f)
        data = _anim_encode((w, h), pal, bg, frames)
        _assert_frames_equal(
            decode_gif_frames(data), _model((w, h), pal, bg, frames)
        )


def test_spark_stage_sample_gif_frames(spark):
    """The mapInPandas stage emits per-frame rows whose hashes match a
    local decode, with per-row error isolation for corrupt payloads."""
    import hashlib

    from kausaldb_spark.sources.gif_anim import sample_gif_frames

    rng = np.random.default_rng(53)
    frames = [
        {"idx": rng.integers(0, 8, (6, 7)), "disposal": 2,
         "transparent": 3, "delay_cs": 5 * i}
        for i in range(5)
    ]
    good = _anim_encode((7, 6), PAL8, 1, frames)
    assets = spark.createDataFrame(
        [("g1", "animation", bytearray(good)),
         ("bad", "animation", bytearray(b"GIF89a\x01\x00"))],
        "asset_id string, kind string, payload binary",
    )
    out = {
        (r["asset_id"], r["frame_idx"]): r
        for r in sample_gif_frames(assets, max_frames=3, stride=2).collect()
    }
    local = decode_gif_frames(good, max_frames=6)[::2][:3]
    assert len(local) == 3
    for i, (frame, delay) in enumerate(local):
        row = out[("g1", 2 * i)]
        assert row["error"] is None
        assert row["delay_cs"] == delay
        assert row["n_frames"] == 5  # bounded parse saw all five
        assert row["frame_sha"] == hashlib.sha256(
            np.ascontiguousarray(frame).tobytes()
        ).hexdigest()
    bad_rows = [r for (aid, _), r in out.items() if aid == "bad"]
    assert len(bad_rows) == 1 and bad_rows[0]["error"] is not None
    assert bad_rows[0]["frame_idx"] is None

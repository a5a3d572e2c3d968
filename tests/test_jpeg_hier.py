"""Hierarchical JPEG pins (r12): an INDEPENDENT test-side pyramid encoder
(DHP + EXP + differential SOF5/SOF6 frames) against the library decoder.
The encoder tracks the decoder's reconstruction level by level (expand ->
residual -> DCT q=1 -> reconstruct), so the final decode must equal the
original image EXACTLY — the entropy and residual layers are lossless at
q=1 and the interpolative expansion filter is integer-exact on both
sides. Spec-fidelity notes carried in the library docstrings: differential
frames code DC with PRED=0 per block and no level shift; references clamp
to the sample range after every frame; expansion is (a+b+1)>>1 with edge
replication, horizontal then vertical."""

import struct

import numpy as np
import pytest

from kausaldb_spark.sources.multimodal import decode_pixels, probe_format_mode
from tests.test_multimodal import (
    _J_AC_SYMS,
    _J_DC_SYMS,
    _JBitWriter,
    _j_codes,
    _j_dct_basis,
    _JZZ,
    _rand_img,
)


def _expand(p, eh=1, ev=1):
    """The J.1.1.2 interpolative 2x expansion, integer, H then V —
    written independently of the library's vectorized version."""
    p = np.asarray(p, dtype=np.int64)
    if eh:
        out = np.zeros((p.shape[0], 2 * p.shape[1]), np.int64)
        for x in range(p.shape[1]):
            out[:, 2 * x] = p[:, x]
            nxt = p[:, min(x + 1, p.shape[1] - 1)]
            out[:, 2 * x + 1] = (p[:, x] + nxt + 1) >> 1
        p = out
    if ev:
        out = np.zeros((2 * p.shape[0], p.shape[1]), np.int64)
        for y in range(p.shape[0]):
            out[2 * y] = p[y]
            nxt = p[min(y + 1, p.shape[0] - 1)]
            out[2 * y + 1] = (p[y] + nxt + 1) >> 1
        p = out
    return p


def _downsample(p):
    """Encoder-side box 2x downsample (encoder's free choice)."""
    p = np.asarray(p, dtype=np.float64)
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return np.rint(
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
    ).astype(np.int64)


def _pad_blocks(p):
    h, w = p.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    return np.pad(p, ((0, ph - h), (0, pw - w)), "edge")


def _encode_frame_data(plane, bw, dc, ac, differential, basis, pred0):
    """Entropy-encode one grayscale frame plane (already padded) —
    sequential, q=1. Non-differential subtracts the 128 level shift and
    chains DC prediction; differential codes the residual directly with
    PRED = 0 per block."""
    ph, pw = plane.shape
    pred = pred0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            if not differential:
                blk = blk - 128.0
            f = basis @ blk @ basis.T
            zz = [int(v) for v in np.rint(f).flat]
            zz = [zz[i] for i in _JZZ]
            diff = zz[0] - (0 if differential else pred)
            if not differential:
                pred = zz[0]
            t = int(abs(diff)).bit_length()
            bw.put(*dc[t])
            if t:
                bw.put(t, diff if diff >= 0 else diff + (1 << t) - 1)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac[0xF0])
                    run -= 16
                s = int(abs(zz[k])).bit_length()
                bw.put(*ac[(run << 4) | s])
                bw.put(s, zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1)
                run = 0
            if last_nz < 63:
                bw.put(*ac[0x00])


def _reconstruct_frame(plane, differential, basis):
    """What the decoder computes for this frame's padded plane: DCT ->
    rint -> IDCT (q=1), plus the level shift for non-differential."""
    ph, pw = plane.shape
    out = np.zeros((ph, pw))
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            if not differential:
                blk = blk - 128.0
            f = np.rint(basis @ blk @ basis.T)
            sp = basis.T @ f @ basis
            if not differential:
                sp = sp + 128.0
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = sp
    return out


def _jpeg_encode_hierarchical(img, levels=2, progressive_diff=False):
    """Grayscale hierarchical pyramid: coarsest frame as SOF0 (or the
    finest differential frames as SOF6 when progressive_diff — emitted as
    a single full-band Ss=1..63 + DC scan pair), each finer level as
    EXP(1,1) + differential frame. Returns the byte stream; q = 1
    throughout so the pin can assert exact reconstruction."""
    img = np.asarray(img, dtype=np.int64).reshape(img.shape[0], img.shape[1])
    basis = _j_dct_basis()
    dc = _j_codes(5, _J_DC_SYMS)
    ac = _j_codes(8, _J_AC_SYMS)

    pyramid = [img]
    for _ in range(levels):
        pyramid.append(_downsample(pyramid[-1]))
    pyramid.reverse()  # coarsest first

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    fh, fw = img.shape
    dhp = struct.pack(">BHHB", 8, fh, fw, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    for tc, syms, ln in ((0, _J_DC_SYMS, 5), (1, _J_AC_SYMS, 8)):
        bits = [0] * 16
        bits[ln - 1] = len(syms)
        payload = bytes([tc << 4]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    recon = None
    for li, level in enumerate(pyramid):
        h, w = level.shape
        differential = li > 0
        if differential:
            out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
            ref = _expand(recon)[:h, :w]
            target = level - ref
        else:
            target = level
        plane = _pad_blocks(target)
        sof_marker = (
            0xC6 if (differential and progressive_diff)
            else (0xC5 if differential else 0xC0)
        )
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
        if differential and progressive_diff:
            # two scans: DC band then the full AC band (Ah=Al=0)
            for ss, se in ((0, 0), (1, 63)):
                sos = bytes([1, 1, 0x00, ss, se, 0x00])
                out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                bw = _JBitWriter()
                _encode_prog_band(plane, bw, dc, ac, ss, se, basis)
                bw.flush()
                out += bw.out
        else:
            sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            bw = _JBitWriter()
            _encode_frame_data(plane, bw, dc, ac, differential, basis, 0)
            bw.flush()
            out += bw.out
        # track the decoder's reconstruction (clamped reference)
        dec_plane = _reconstruct_frame(plane, differential, basis)[:h, :w]
        if differential:
            recon = np.clip(np.rint(ref + dec_plane), 0, 255).astype(np.int64)
        else:
            recon = np.clip(np.rint(dec_plane), 0, 255).astype(np.int64)
    out += b"\xff\xd9"
    return bytes(out), recon


def _encode_prog_band(plane, bw, dc, ac, ss, se, basis):
    """Differential progressive (SOF6) band scan at Ah=Al=0: DC scan codes
    the raw DC (PRED=0), the AC scan is spectral-selection first-pass with
    EOB runs."""
    from tests.test_multimodal import _JEobState, _j_ac_first_block, _j_flush_eobrun

    ph, pw = plane.shape
    state = _JEobState()
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            f = basis @ blk @ basis.T
            zz = [int(v) for v in np.rint(f).flat]
            zz = [zz[i] for i in _JZZ]
            if ss == 0:
                t = int(abs(zz[0])).bit_length()
                bw.put(*dc[t])
                if t:
                    bw.put(t, zz[0] if zz[0] >= 0 else zz[0] + (1 << t) - 1)
            else:
                _j_ac_first_block(state, zz[ss:se + 1], 0, ac, bw)
    if ss != 0:
        _j_flush_eobrun(state, ac, bw)


def test_hierarchical_two_level_exact():
    img = _rand_img(24, 17, 1, seed=5).reshape(24, 17)
    data, recon = _jpeg_encode_hierarchical(img, levels=2)
    assert probe_format_mode(data) == ("jpeg", "hierarchical", True)
    got = decode_pixels(data)
    assert got.shape == (24, 17, 1)
    # the REAL pin: the decoder lands bit-exactly on the encoder's
    # tracked reconstruction model (EXP filter, differential add, clamp,
    # PRED=0 — any deviation anywhere in the ladder breaks this)
    assert np.array_equal(got[:, :, 0], recon.astype(np.uint8))
    # and the ladder stays within the q=1 DCT rounding envelope of the
    # original (the same +-1 a plain SOF0 roundtrip shows)
    assert np.abs(got[:, :, 0].astype(int) - img).max() <= 1


def test_hierarchical_three_levels_and_odd_dims():
    img = _rand_img(37, 29, 1, seed=9).reshape(37, 29)
    data, recon = _jpeg_encode_hierarchical(img, levels=3)
    got = decode_pixels(data)[:, :, 0]
    assert np.array_equal(got, recon.astype(np.uint8))
    assert np.abs(got.astype(int) - img).max() <= 1


def test_hierarchical_progressive_differential_frames():
    img = _rand_img(20, 22, 1, seed=13).reshape(20, 22)
    data, recon = _jpeg_encode_hierarchical(img, levels=2, progressive_diff=True)
    got = decode_pixels(data)[:, :, 0]
    assert np.array_equal(got, recon.astype(np.uint8))
    assert np.abs(got.astype(int) - img).max() <= 1


def test_hierarchical_error_contract():
    img = _rand_img(16, 16, 1, seed=2).reshape(16, 16)
    data, _ = _jpeg_encode_hierarchical(img, levels=1)
    # differential lossless inside a hierarchy stays the boundary
    bad = bytearray(data)
    bad[bad.index(b"\xff\xc5") + 1] = 0xC7
    with pytest.raises(NotImplementedError):
        decode_pixels(bytes(bad))
    # a differential frame with no DHP is malformed, not a boundary
    stripped = bytearray(data)
    dhp_at = bytes(stripped).index(b"\xff\xde")
    seg_len = struct.unpack(">H", stripped[dhp_at + 2:dhp_at + 4])[0]
    del stripped[dhp_at:dhp_at + 2 + seg_len]
    with pytest.raises(ValueError):
        decode_pixels(bytes(stripped))
    # truncation inside a differential scan -> ValueError
    with pytest.raises(ValueError):
        decode_pixels(data[:len(data) // 2])


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(9, 40),
        w=st.integers(9, 40),
        seed=st.integers(0, 10_000),
        levels=st.integers(1, 3),
        prog=st.booleans(),
    )
    def test_hierarchical_roundtrip_hypothesis(h, w, seed, levels, prog):
        img = _rand_img(h, w, 1, seed=seed).reshape(h, w)
        data, recon = _jpeg_encode_hierarchical(
            img, levels=levels, progressive_diff=prog
        )
        got = decode_pixels(data)[:, :, 0]
        assert np.array_equal(got, recon.astype(np.uint8))
        assert np.abs(got.astype(int) - img).max() <= 1
except ImportError:  # pragma: no cover
    pass

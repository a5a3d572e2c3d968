"""Arithmetic-coded JPEG pins (r12): an INDEPENDENT test-side encoder —
QM arithmetic coder written from T.81's ENCODER flowcharts (Annex D.1:
INITENC/CODELPS/CODEMPS/RENORME/BYTEOUT/FLUSH) plus the Annex F
statistical-model encode procedures — shares no code with the library
decoder (written from the DECODER flowcharts). The entropy layer is
lossless, so an arithmetic encoding and a huffman encoding of the SAME
quantized coefficients must decode to IDENTICAL pixels; every pin below
asserts exact equality, not a bound.

Validation boundary, stated honestly: this environment has no third-party
arithmetic JPEG (no codec library, no network), so cross-validation
against a foreign bitstream is impossible here. Beyond the matched-pair
pins, `test_qm_tracks_entropy_bound` is the table-integrity check: the
adaptive state machine only compresses a biased source to within a few
percent of the Shannon bound if Table D.3's Qe ladder and its
NextMPS/NextLPS transitions are right — a mistranscribed table fails that
margin immediately.
"""

import struct

import numpy as np
import pytest

from kausaldb_spark.sources import jpeg_arith as ja
from kausaldb_spark.sources.multimodal import decode_pixels, probe_format_mode
from tests.test_multimodal import (
    _j_dct_basis,
    _JZZ,
    _jpeg_encode,
    _jpeg_encode_progressive,
    _j_trunc,
    _rand_img,
    _rand_img12,
)


# ---------------------------------------------------------------------------
# QM encoder per T.81 Annex D.1 (independent of the library's D.2 decoder)
# ---------------------------------------------------------------------------

class _QmEnc:
    """INITENC: A=0x10000, C=0, CT=11; bytes leave at C>>19; carry
    propagates into already-emitted bytes (the spec's stacked-FF handling
    collapses to plain list carry when stuffing is applied as a
    post-pass); FLUSH per D.1.8 (CLEARBITS then two byteouts)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = []

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            i = len(self.out) - 1
            while True:
                assert i >= 0, "carry off the stream front"
                self.out[i] = (self.out[i] + 1) & 0xFF
                if self.out[i] != 0:
                    break
                i -= 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st, i, d):
        sv = st[i]
        idx, mps = sv & 0x7F, sv >> 7
        qe, nlps, nmps, sw = ja._QM_TABLE[idx]
        self.a -= qe
        if d == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # no exchange: LPS on top
                self.c += self.a
                self.a = qe
            st[i] = ((mps ^ sw) << 7) | nlps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct  # ct == 8 after byteout
        self._byteout()
        res = bytearray()
        for b in self.out:  # entropy-segment FF00 stuffing, post-pass
            res.append(b)
            if b == 0xFF:
                res.append(0x00)
        return bytes(res)


def _unstuff(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            if i + 1 < len(data) and data[i + 1] == 0x00:
                out.append(0xFF)
                i += 2
                continue
            break
        out.append(b)
        i += 1
    return bytes(out)


# --- Annex F statistical-model ENCODE procedures (mirror the decode tree) --

def _enc_dc(enc, st, ctx, lo, up, diff):
    """Returns the conditioning category for the component's next block."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = abs(diff) - 1
    i = ctx + 2 + sign
    m = 0
    if sz == 0:
        enc.encode(st, i, 0)
    else:
        enc.encode(st, i, 1)
        m = 1
        i = 20
        while sz >= (m << 1):
            enc.encode(st, i, 1)
            m <<= 1
            i += 1
        enc.encode(st, i, 0)
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    i += 14
    mm = m >> 1
    while mm:
        enc.encode(st, i, 1 if (sz & mm) else 0)
        mm >>= 1
    return nctx


def _enc_ac_band(enc, st, kx, vals, ss, fixed):
    """vals[j] = coefficient at zigzag index ss+j (point-transformed)."""
    se = ss + len(vals) - 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if not any(vals[k - ss:]):
            enc.encode(st, base, 1)  # EOB
            return
        enc.encode(st, base, 0)
        while vals[k - ss] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = vals[k - ss]
        enc.encode(fixed, 0, 1 if v < 0 else 0)
        sz = abs(v) - 1
        i = base + 2
        m = 0
        if sz == 0:
            enc.encode(st, i, 0)
        else:
            enc.encode(st, i, 1)
            if sz == 1:
                enc.encode(st, i, 0)
                m = 1
            else:
                enc.encode(st, i, 1)
                m = 2
                i = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, i, 1)
                    m <<= 1
                    i += 1
                enc.encode(st, i, 0)
        i += 14
        mm = m >> 1
        while mm:
            enc.encode(st, i, 1 if (sz & mm) else 0)
            mm >>= 1
        k += 1


def _enc_ac_refine(enc, st, prev, cur, ss, fixed):
    """prev[j]/cur[j]: the coefficient truncated at the previous / this
    approximation level, for zigzag index ss+j."""
    se = ss + len(cur) - 1
    kex = ss - 1
    for j, pv in enumerate(prev):
        if pv:
            kex = ss + j
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if not any(cur[k - ss:]):
                enc.encode(st, base, 1)  # EOB
                return
            enc.encode(st, base, 0)
        while True:
            j = k - ss
            if prev[j]:
                enc.encode(st, base + 2, abs(cur[j]) & 1)
                break
            if cur[j]:
                enc.encode(st, base + 1, 1)
                enc.encode(fixed, 0, 1 if cur[j] < 0 else 0)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        k += 1


# ---------------------------------------------------------------------------
# arithmetic JPEG encoders (header layout mirrors the huffman test encoders,
# DAC instead of DHT, SOF9/SOFA markers)
# ---------------------------------------------------------------------------

def _quantized_coefs(img, comps, q, precision, mcux, mcuy, hmax, vmax):
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    half = float(1 << (precision - 1))
    a = _j_dct_basis()
    qnat = np.full((8, 8), float(q))
    if ch == 3:
        rgb = img.astype(float)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = half - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = half + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
    else:
        planes = [img.reshape(h, w).astype(float)]

    def pad(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")

    coefs, bdims = [], []
    for (cid, (hs, vs), _tq), p in zip(comps, planes):
        if (hs, vs) != (hmax, vmax):
            p = pad(p, mcuy * vmax * 8, mcux * hmax * 8)
            fy, fx = vmax // vs, hmax // hs
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean((1, 3))
        else:
            p = pad(p, mcuy * vs * 8, mcux * hs * 8)
        bh, bwid = p.shape[0] // 8, p.shape[1] // 8
        arr = []
        for by in range(bh):
            row = []
            for bx in range(bwid):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                f = a @ (blk - half) @ a.T
                fq = np.rint(f / qnat).astype(int)
                row.append([int(fq.flat[i]) for i in _JZZ])
            arr.append(row)
        coefs.append(arr)
        comp_w = -(-w * hs // hmax)
        comp_h = -(-h * vs // vmax)
        bdims.append((-(-comp_h // 8), -(-comp_w // 8)))
    return coefs, bdims


def _headers(img, comps, q, precision, sof_marker, dac=None,
             restart_interval=0):
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    sof = struct.pack(">BHHB", precision, h, w, len(comps))
    for cid, (hs, vs), tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    if dac:  # pairs of (Tc<<4|Tb, Cs)
        payload = bytes(b for pair in dac for b in pair)
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def _jpeg_arith_encode(img, subsample=False, restart_interval=0, q=1,
                       precision=8, dac=None, lo=0, up=1, kx=5):
    """Sequential arithmetic JPEG (SOF9): one interleaved scan. ``dac``
    emits a DAC marker; ``lo``/``up``/``kx`` are the conditioning values
    the entropy layer actually uses (pass matching ``dac`` pairs to
    exercise non-default conditioning)."""
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    sy = (2, 2) if (subsample and ch == 3) else (1, 1)
    comps = [(1, sy, 0)] + ([(2, (1, 1), 0), (3, (1, 1), 0)] if ch == 3 else [])
    hmax, vmax = comps[0][1]
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs, _ = _quantized_coefs(img, comps, q, precision, mcux, mcuy, hmax, vmax)

    out = _headers(img, comps, q, precision, 0xC9, dac, restart_interval)
    sos = bytes([len(comps)])
    for cid, _hv, _tq in comps:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def fresh():
        return (_QmEnc(), bytearray(ja.DC_STAT_BINS),
                bytearray(ja.AC_STAT_BINS), bytearray([ja.FIXED_BIN_INDEX]),
                [0] * len(comps), [0] * len(comps))

    enc, dc_st, ac_st, fixed, preds, dc_ctx = fresh()
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            enc, dc_st, ac_st, fixed, preds, dc_ctx = fresh()
        my, mx = divmod(mcu, mcux)
        for ci, (cid, (hs, vs), _tq) in enumerate(comps):
            for b in range(vs * hs):
                by, bx = my * vs + b // hs, mx * hs + b % hs
                zz = coefs[ci][by][bx]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                dc_ctx[ci] = _enc_dc(enc, dc_st, dc_ctx[ci], lo, up, diff)
                _enc_ac_band(enc, ac_st, kx, zz[1:], 1, fixed)
    out += enc.flush() + b"\xff\xd9"
    return bytes(out)


def _jpeg_arith_encode_progressive(img, q=1, subsample=False, script=None,
                                   restart_interval=0, precision=8):
    """Progressive arithmetic JPEG (SOFA). ``script`` entries as the
    huffman progressive encoder: ("dc", ah, al) / ("ac", ci, ss, se, ah,
    al)."""
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    sy = (2, 2) if (subsample and ch == 3) else (1, 1)
    comps = [(1, sy, 0)] + ([(2, (1, 1), 0), (3, (1, 1), 0)] if ch == 3 else [])
    hmax, vmax = comps[0][1]
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs, bdims = _quantized_coefs(
        img, comps, q, precision, mcux, mcuy, hmax, vmax
    )
    if script is None:
        script = [("dc", 0, 1), ("dc", 1, 0)]
        for ci in range(len(comps)):
            if ci == 0:
                script += [("ac", 0, 1, 5, 0, 1), ("ac", 0, 6, 63, 0, 1)]
                script += [("ac", 0, 1, 5, 1, 0), ("ac", 0, 6, 63, 1, 0)]
            else:
                script += [("ac", ci, 1, 63, 0, 1), ("ac", ci, 1, 63, 1, 0)]

    out = _headers(img, comps, q, precision, 0xCA,
                   restart_interval=restart_interval)
    rst = [0]

    for scan in script:
        kind = scan[0]
        if kind == "dc":
            _, ah, al = scan
            sos = bytes([len(comps)])
            for cid, _hv, _tq in comps:
                sos += bytes([cid, 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            enc = _QmEnc()
            dc_st = bytearray(ja.DC_STAT_BINS)
            fixed = bytearray([ja.FIXED_BIN_INDEX])
            preds = [0] * len(comps)
            dc_ctx = [0] * len(comps)
            for mcu in range(mcux * mcuy):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + (rst[0] % 8)])
                    rst[0] += 1
                    enc = _QmEnc()
                    dc_st = bytearray(ja.DC_STAT_BINS)
                    preds = [0] * len(comps)
                    dc_ctx = [0] * len(comps)
                my, mx = divmod(mcu, mcux)
                for ci, (cid, (hs, vs), _tq) in enumerate(comps):
                    for b in range(vs * hs):
                        by, bx = my * vs + b // hs, mx * hs + b % hs
                        v = coefs[ci][by][bx][0]
                        if ah == 0:
                            t = v >> al  # DC point transform: arith shift
                            dc_ctx[ci] = _enc_dc(
                                enc, dc_st, dc_ctx[ci], 0, 1, t - preds[ci]
                            )
                            preds[ci] = t
                        else:
                            enc.encode(fixed, 0, (v >> al) & 1)
            out += enc.flush()
        else:
            _, ci, ss, se, ah, al = scan
            cid = comps[ci][0]
            sos = bytes([1, cid, 0x00, ss, se, (ah << 4) | al])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            bh, bwid = bdims[ci]
            enc = _QmEnc()
            ac_st = bytearray(ja.AC_STAT_BINS)
            fixed = bytearray([ja.FIXED_BIN_INDEX])
            for unit in range(bh * bwid):
                if restart_interval and unit and unit % restart_interval == 0:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + (rst[0] % 8)])
                    rst[0] += 1
                    enc = _QmEnc()
                    ac_st = bytearray(ja.AC_STAT_BINS)
                by, bx = divmod(unit, bwid)
                band = coefs[ci][by][bx][ss:se + 1]
                if ah == 0:
                    _enc_ac_band(
                        enc, ac_st, 5, [_j_trunc(v, al) for v in band],
                        ss, fixed,
                    )
                else:
                    _enc_ac_refine(
                        enc, ac_st,
                        [_j_trunc(v, ah) for v in band],
                        [_j_trunc(v, al) for v in band],
                        ss, fixed,
                    )
            out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# QM coder pair pins
# ---------------------------------------------------------------------------

def _roundtrip(bits, ctxs, n_ctx, drop_trailing_zeros=False):
    st = bytearray(n_ctx)
    enc = _QmEnc()
    for b, cx in zip(bits, ctxs):
        enc.encode(st, cx, b)
    data = bytearray(enc.flush())
    if drop_trailing_zeros:
        while data and data[-1] == 0x00:
            data.pop()
    st2 = bytearray(n_ctx)
    dec = ja.QmDecoder(_unstuff(bytes(data)))
    return [dec.decode(st2, cx) for cx in ctxs], bytes(data)


def test_qm_pair_roundtrip_random():
    import random

    rng = random.Random(42)
    for trial in range(120):
        n = rng.randint(1, 1200)
        n_ctx = rng.randint(1, 8)
        p = rng.choice([0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99])
        bits = [1 if rng.random() < p else 0 for _ in range(n)]
        ctxs = [rng.randrange(n_ctx) for _ in range(n)]
        got, _ = _roundtrip(bits, ctxs, n_ctx,
                            drop_trailing_zeros=bool(trial % 2))
        assert got == bits, (trial, n, p, n_ctx)


def test_qm_tracks_entropy_bound():
    """Table-integrity pin: the adaptive ladder must compress a p=0.05
    Bernoulli source to within 6% of the Shannon bound — transposed Qe
    values or broken NextMPS/NextLPS chains cannot pass this margin."""
    import math
    import random

    rng = random.Random(7)
    n = 80_000
    bits = [1 if rng.random() < 0.05 else 0 for _ in range(n)]
    got, data = _roundtrip(bits, [0] * n, 1)
    assert got == bits
    bound = n * -(0.05 * math.log2(0.05) + 0.95 * math.log2(0.95)) / 8
    assert len(data) < bound * 1.06, (len(data), bound)


def test_qm_carry_and_stuffing_paths():
    """Long MPS runs against an adverse initial MPS force carries and FF
    stuffing; the decoder must also survive reading past the segment end
    (zero-feed) when the tail bytes were discarded."""
    bits = ([1] * 400 + [0]) * 25
    ctxs = [0] * len(bits)
    got, data = _roundtrip(bits, ctxs, 1, drop_trailing_zeros=True)
    assert got == bits
    got2, data2 = _roundtrip([0] * 10_000, [0] * 10_000, 1,
                             drop_trailing_zeros=True)
    assert got2 == [0] * 10_000
    assert len(data2) <= 4  # an all-MPS source collapses to a few bytes


# ---------------------------------------------------------------------------
# arithmetic JPEG pins: exact pixel equality vs the huffman entropy layer
# ---------------------------------------------------------------------------

def test_arith_sequential_equals_huffman_gray():
    img = _rand_img(13, 11, 1, seed=3)
    arith = _jpeg_arith_encode(img)
    assert probe_format_mode(arith) == ("jpeg", "arithmetic-sequential", True)
    assert np.array_equal(decode_pixels(arith), decode_pixels(_jpeg_encode(img)))


def test_arith_sequential_equals_huffman_rgb():
    img = _rand_img(16, 24, 3, seed=5)
    arith = _jpeg_arith_encode(img)
    assert np.array_equal(decode_pixels(arith), decode_pixels(_jpeg_encode(img)))


def test_arith_sequential_subsampled_and_restarts():
    img = _rand_img(33, 18, 3, seed=11)
    for dri in (0, 2, 7):
        arith = _jpeg_arith_encode(img, subsample=True, restart_interval=dri)
        huff = _jpeg_encode(img, subsample=True, restart_interval=dri)
        assert np.array_equal(decode_pixels(arith), decode_pixels(huff)), dri


def test_arith_sequential_12bit():
    img12 = _rand_img12(9, 14, 1, seed=21)
    arith = _jpeg_arith_encode(img12, precision=12)
    assert probe_format_mode(arith) == (
        "jpeg", "arithmetic-sequential-12bit", True)
    huff = _jpeg_encode(img12, precision=12)
    assert np.array_equal(decode_pixels(arith), decode_pixels(huff))


def test_arith_dac_conditioning_non_default():
    """Non-default DAC conditioning (DC L=1/U=3, AC Kx=12) changes the
    context selection on BOTH sides; the pair must still reproduce the
    huffman pixels exactly, and the DAC segment must parse."""
    img = _rand_img(17, 13, 1, seed=8)
    arith = _jpeg_arith_encode(
        img, dac=[(0x00, (3 << 4) | 1), (0x10, 12)], lo=1, up=3, kx=12
    )
    assert np.array_equal(decode_pixels(arith), decode_pixels(_jpeg_encode(img)))


def test_arith_dac_validation():
    dc_cond, ac_cond = {}, {}
    ja.parse_dac(bytes([0x00, (3 << 4) | 1, 0x11, 12]), dc_cond, ac_cond)
    assert dc_cond == {0: (1, 3)} and ac_cond == {1: 12}
    with pytest.raises(ValueError):
        ja.parse_dac(bytes([0x00, (1 << 4) | 5]), {}, {})  # L > U
    with pytest.raises(ValueError):
        ja.parse_dac(bytes([0x10, 0]), {}, {})  # Kx out of range
    with pytest.raises(ValueError):
        ja.parse_dac(bytes([0x20, 1]), {}, {})  # bad class


def test_arith_progressive_equals_sequential_gray():
    img = _rand_img(13, 11, 1, seed=7)
    prog = _jpeg_arith_encode_progressive(img)
    assert probe_format_mode(prog) == ("jpeg", "arithmetic-progressive", True)
    assert np.array_equal(decode_pixels(prog), decode_pixels(_jpeg_arith_encode(img)))
    # and both equal the huffman pixels
    assert np.array_equal(decode_pixels(prog), decode_pixels(_jpeg_encode(img)))


def test_arith_progressive_equals_sequential_rgb():
    img = _rand_img(15, 22, 3, seed=9)
    prog = _jpeg_arith_encode_progressive(img)
    assert np.array_equal(decode_pixels(prog), decode_pixels(_jpeg_encode(img)))


def test_arith_progressive_subsampled_restarts_and_deep_sa():
    img = _rand_img(21, 26, 3, seed=13)
    script = [("dc", 0, 2), ("dc", 1, 1), ("dc", 1, 0)]
    for ci in (0, 1, 2):
        script += [("ac", ci, 1, 20, 0, 2), ("ac", ci, 21, 63, 0, 2)]
        script += [("ac", ci, 1, 20, 2, 1), ("ac", ci, 21, 63, 2, 1)]
        script += [("ac", ci, 1, 20, 1, 0), ("ac", ci, 21, 63, 1, 0)]
    prog = _jpeg_arith_encode_progressive(
        img, subsample=True, script=script, restart_interval=3
    )
    huff = _jpeg_encode(img, subsample=True)
    assert np.array_equal(decode_pixels(prog), decode_pixels(huff))


def test_arith_progressive_12bit():
    img12 = _rand_img12(10, 9, 1, seed=31)
    prog = _jpeg_arith_encode_progressive(img12, precision=12)
    huff = _jpeg_encode(img12, precision=12)
    assert np.array_equal(decode_pixels(prog), decode_pixels(huff))


def test_arith_error_contract():
    """Truncation and junk must land as ValueError (per-row isolation in
    the Arrow decode stage), never a crash or a silent wrong image."""
    img = _rand_img(16, 16, 1, seed=2)
    data = _jpeg_arith_encode(img)
    with pytest.raises(ValueError):
        decode_pixels(data[:40])  # cut inside the headers
    # cut inside the entropy stream: either decodes from zero-fed data
    # (legal per the spec's zero-feed convention) or raises ValueError —
    # never NotImplementedError, never a non-ValueError crash
    try:
        decode_pixels(data[:-9])
    except ValueError:
        pass
    # arithmetic lossless stays a boundary
    from kausaldb_spark.sources.multimodal import synth_container
    with pytest.raises(NotImplementedError):
        decode_pixels(
            b"\xff\xd8" + b"\xff\xcb" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0])
            + b"\xff\xd9"
        )
    # the FORMAT_CLASSES fixtures for the two arithmetic-DCT classes are
    # now inside the boundary (junk entropy -> ValueError, not boundary)
    for cls in (4, 12):
        with pytest.raises(ValueError):
            decode_pixels(synth_container(cls, 1))


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(6, 24),
        w=st.integers(6, 24),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 10_000),
        subsample=st.booleans(),
        dri=st.sampled_from([0, 3]),
        progressive=st.booleans(),
    )
    def test_arith_roundtrip_hypothesis(h, w, ch, seed, subsample, dri,
                                        progressive):
        img = _rand_img(h, w, ch, seed=seed)
        sub = subsample and ch == 3
        if progressive:
            data = _jpeg_arith_encode_progressive(
                img, subsample=sub, restart_interval=dri
            )
        else:
            data = _jpeg_arith_encode(
                img, subsample=sub, restart_interval=dri
            )
        huff = _jpeg_encode(img, subsample=sub, restart_interval=dri)
        assert np.array_equal(decode_pixels(data), decode_pixels(huff))
except ImportError:  # pragma: no cover
    pass

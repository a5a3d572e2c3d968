"""Multimodal asset columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/transform stages.

Schema contract: an asset row is
    (asset_id string, kind string, payload binary, meta map<string,string>)
- ``kind`` ∈ image|audio|video
- ``payload`` is the raw encoded bytes (never decoded at rest)
- ``meta`` carries typed sidecar fields (width, sample_rate, …) as strings

The heavy stages run as ``mapInPandas`` over Arrow batches — payload bytes
never pass through Python row-at-a-time. Pixel decode is REAL for four
containers, straight off the public specs with no codec library: PNG (r7:
chunk walk → IDAT inflate → per-scanline unfilter incl. Paeth), BMP (r7:
BITMAPINFOHEADER, bottom-up padded rows, BGR(A)→RGB(A)), baseline
sequential JPEG (r10: huffman + dequant + IDCT in numpy), and GIF first
frame (r10: variable-width LZW); r11 added huffman-progressive, 12-bit and
lossless JPEG, r12 the arithmetic-coded DCT modes (SOF9/SOFA via
jpeg_arith's QM coder). The remaining boundary — arithmetic-lossless and
hierarchical JPEG, unknown containers — stays behind an explicit
NotImplementedError; each decoder is pinned against an INDEPENDENT
test-side encoder. The deterministic fake decoder remains the default for
the synthetic-asset plumbing tests.

Scale notes: decode is the classic CPU-bound embarrassing-parallel stage —
``repartition`` by asset_id to spread codec cost, and keep batch size bounded
(spark.sql.execution.arrow.maxRecordsPerBatch) so a partition of 100 MB
videos doesn't materialize as one Arrow batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake assets: payload = md5-stream bytes, fake 'header'
    encodes dimensions. Stands in for a real binary-file scan
    (spark.read.format('binaryFile'))."""
    return spark.range(n).select(
        F.concat(F.lit("asset_"), F.col("id").cast("string")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.concat(
                F.lpad(F.conv((F.col("id") % 16 + 1) * 64, 10, 16), 4, "0"),
                F.lpad(F.conv((F.col("id") % 9 + 1) * 64, 10, 16), 4, "0"),
                F.repeat(F.md5(F.col("id").cast("string")), 8),
            ),
            F.lit("hex"),
        ).alias("payload"),
        F.create_map(
            F.lit("source"), F.concat(F.lit("synthetic://corpus/"), F.col("id").cast("string")),
        ).alias("meta"),
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Undo PNG scanline filters 0-4 (spec §9: None/Sub/Up/Average/Paeth)
    over ``h`` scanlines of ``stride`` bytes each. ``bpp`` is the filter
    delta unit in bytes — max(1, channels*depth//8) per §9 — so sub-byte
    depths filter at 1-byte offsets regardless of samples-per-byte.
    Sequential by nature — each byte depends on already-reconstructed
    left/up neighbors — so this is a plain loop over the scanlines."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(h):
        if pos + 1 + stride > len(raw):
            raise ValueError("PNG pixel data truncated")
        f = raw[pos]
        pos += 1
        cur = bytearray(raw[pos:pos + stride])
        pos += stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out += cur
        prev = cur
    return bytes(out)


def _png_expand(lines: bytes, pw: int, ph: int, stride: int, ch: int,
                depth: int):
    """Unfiltered scanline bytes -> (ph, pw, ch) sample array at SOURCE
    precision (uint16 holds every depth; palette indices / gray levels
    stay raw — scaling happens once at the end of _decode_png)."""
    import numpy as np

    arr = np.frombuffer(lines, np.uint8).reshape(ph, stride)
    if depth == 8:
        return arr[:, : pw * ch].reshape(ph, pw, ch).astype(np.uint16)
    if depth == 16:
        a = arr[:, : pw * ch * 2].astype(np.uint16).reshape(ph, pw * ch, 2)
        return ((a[..., 0] << 8) | a[..., 1]).reshape(ph, pw, ch)
    # depth 1/2/4: always single-channel (gray or palette index)
    bits = np.unpackbits(arr, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    samples = (
        bits[:, : pw * depth].reshape(ph, pw, depth) * weights
    ).sum(axis=2, dtype=np.uint16)
    return samples.reshape(ph, pw, 1)


# Adam7 pass grid: (x0, y0, dx, dy) per spec §8.2. A pass whose sub-image
# is empty for this geometry contributes ZERO bytes (not even filter bytes).
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

# depth validity per color type, spec §11.2.2.
_PNG_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                     4: (8, 16), 6: (8, 16)}


def _decode_png(data: bytes):
    """Full PNG static-image decode (spec-complete as of r12): all five
    color types, bit depths 1/2/4/8/16, PLTE palette indirection, tRNS
    transparency (palette alpha AND gray/RGB color-key), and Adam7
    interlace. Output contract: uint8 (h, w, ch); 16-bit samples reduce
    to their high-order byte (v >> 8); sub-byte gray levels scale by
    exact bit replication (v * 255 // (2^d - 1)); a tRNS chunk adds an
    alpha channel (palette: per-index alpha; gray/RGB: 0 where the pixel
    equals the key at SOURCE precision, opaque otherwise)."""
    import struct
    import zlib

    import numpy as np

    pos, ihdr, idat, plte, trns = 8, None, b"", None, None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"tRNS":
            trns = chunk
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
    if depth not in _PNG_VALID_DEPTHS.get(ctype, ()):
        raise ValueError(f"invalid PNG depth/ctype combo {depth}/{ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    bpp = max(1, ch * depth // 8)

    def stride_of(width: int) -> int:
        return (width * ch * depth + 7) // 8

    if interlace == 0:
        st = stride_of(w)
        img = _png_expand(_png_unfilter(raw, h, st, bpp), w, h, st, ch, depth)
    else:
        img = np.zeros((h, w, ch), np.uint16)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            st = stride_of(pw)
            need = ph * (1 + st)
            lines = _png_unfilter(raw[off:off + need], ph, st, bpp)
            off += need
            img[y0::dy, x0::dx] = _png_expand(lines, pw, ph, st, ch, depth)

    if ctype == 3:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG without a well-formed PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idxs = img[..., 0]
        if int(idxs.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[idxs]
        if trns is not None:
            if len(trns) > len(pal):
                raise ValueError("PNG tRNS longer than palette")
            alpha = np.full(len(pal), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.ascontiguousarray(np.dstack([rgb, alpha[idxs]]))
        return np.ascontiguousarray(rgb)

    if trns is not None:
        if ctype in (4, 6):  # spec §11.3.2: tRNS forbidden with an alpha channel
            raise ValueError("PNG tRNS with alpha-bearing color type")
        key = np.frombuffer(trns, ">u2")
        if len(key) != ch:
            raise ValueError("PNG tRNS arity does not match color type")
        match = np.all(img == key.astype(np.uint16), axis=2)
        alpha = np.where(match, 0, (1 << depth) - 1).astype(np.uint16)
        img = np.dstack([img, alpha])

    if depth == 16:
        out = (img >> 8).astype(np.uint8)
    elif depth == 8:
        out = img.astype(np.uint8)
    else:
        out = (img * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return np.ascontiguousarray(out)


def _bmp_rle8(buf: bytes, w: int, h: int):
    """BI_RLE8 decode (Windows BMP spec): encoded runs (count, index),
    escapes 00 00=EOL, 00 01=EOB, 00 02=delta(dx,dy), 00 n>=3=absolute
    run padded to a word boundary. Rows are stored bottom-up (RLE BMPs
    are always bottom-up); returns the index raster in STORAGE order —
    the caller flips. Malformed streams (runs crossing the row edge,
    writes past the raster) normalize to ValueError per the
    decode_pixels error contract."""
    import numpy as np

    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    while i < len(buf):
        if i + 2 > len(buf):
            raise ValueError("BMP RLE8 stream truncated")
        n, v = buf[i], buf[i + 1]
        i += 2
        if n > 0:  # encoded run
            if y >= h or x + n > w:
                raise ValueError("BMP RLE8 run outside raster")
            out[y, x:x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 2 > len(buf):
                raise ValueError("BMP RLE8 delta truncated")
            x, y = x + buf[i], y + buf[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta outside raster")
        else:  # absolute run of v literal indices, word-padded
            if i + v > len(buf):
                raise ValueError("BMP RLE8 absolute run truncated")
            if y >= h or x + v > w:
                raise ValueError("BMP RLE8 absolute run outside raster")
            out[y, x:x + v] = np.frombuffer(buf[i:i + v], np.uint8)
            x += v
            i += v + (v & 1)
    return out  # tolerated: stream ended without an explicit EOB


def _decode_bmp(data: bytes):
    import struct

    import numpy as np

    (data_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp == 8 and compression in (0, 1):
        # palette BMP (r12): BGRX color table after the info header;
        # BI_RLE8 streams decode via _bmp_rle8.
        (clr_used,) = (
            struct.unpack("<I", data[46:50]) if len(data) >= 50 else (0,)
        )
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        pal_raw = np.frombuffer(data[pal_off:pal_off + n_pal * 4], np.uint8)
        if len(pal_raw) < n_pal * 4:
            raise ValueError("BMP color table truncated")
        pal = pal_raw.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        if compression == 1:
            if h < 0:
                raise ValueError("BMP RLE8 must be bottom-up")
            idx = _bmp_rle8(data[data_off:], w, h)[::-1]
        else:
            bottom_up = h > 0
            h = abs(h)
            stride = (w + 3) & ~3
            rows = [
                np.frombuffer(data[data_off + y * stride:][:w], np.uint8)
                for y in range(h)
            ]
            if any(len(r) < w for r in rows):
                raise ValueError("BMP pixel data truncated")
            idx = np.stack(rows[::-1] if bottom_up else rows)
        return np.ascontiguousarray(pal[idx])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression {compression}/bpp {bpp}: uncompressed "
            "24/32-bit, palette 8-bit and RLE8 are decoded here"
        )
    ch = bpp // 8
    bottom_up = h > 0
    h = abs(h)
    stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for y in range(h):
        off = data_off + y * stride
        rows.append(np.frombuffer(data[off:off + w * ch], np.uint8).reshape(w, ch))
    img = np.stack(rows[::-1] if bottom_up else rows)
    # BGR(A) -> RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    return np.ascontiguousarray(img)


# -- baseline JPEG (pure numpy; r10, closing most of the codec boundary) ----
# ITU-T T.81 baseline sequential DCT, straight off the public spec: marker
# walk -> DQT/DHT/DAC/SOF/SOS/DRI, canonical Huffman entropy decode with
# restart-interval chunking, dequantize + dezigzag, 8x8 matrix IDCT, chroma
# upsample (integer replication), YCbCr->RGB. Progressive (SOF2, r11) and
# the arithmetic-coded twins (SOF9/SOFA, r12 via jpeg_arith's QM coder)
# decode too, as do hierarchical DHP/EXP pyramids (r12); arithmetic
# lossless and the differential-lossless family remain NotImplementedError;
# every malformed-stream path normalizes to ValueError per decode_pixels'
# error contract. Pinned in tests/test_multimodal.py against an
# INDEPENDENT minimal encoder (forward DCT + canonical tables), the same
# discipline as the PNG/BMP pins. Pure-Python bit loop: a correctness
# boundary closure for small assets, not a throughput path.

# natural (row-major) index of the i-th coefficient in zigzag order
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_SOF_UNSUPPORTED = {
    0xC7: "differential lossless",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic seq",
    0xCE: "differential arithmetic prog", 0xCF: "differential arithmetic ll",
}


def _jpeg_dct_basis():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


def _jpeg_build_huff(bits, vals):
    """(length, code) -> symbol, canonical per T.81 Annex C."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(vals):
                raise ValueError("JPEG DHT: counts exceed symbol list")
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    __slots__ = ("buf", "pos", "cur", "nbits")

    def __init__(self, buf):
        self.buf, self.pos, self.cur, self.nbits = buf, 0, 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG entropy stream")
            self.cur = self.buf[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(br: "_JpegBits", table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_first_ac(br, coef, ss, se, al, eobrun, ac_t) -> int:
    """Progressive AC first scan (Ah=0) for one data unit, T.81 G.1.2.2:
    run/size pairs like baseline, but s=0/r<15 encodes an END-OF-BAND RUN
    of (1<<r)-1+receive(r) blocks whose band is entirely zero at this
    approximation level; new coefficients land shifted by the point
    transform Al. Returns the remaining EOB run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(br, ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        coef[k] = _jpeg_extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _jpeg_refine_ac(br, coef, ss, se, al, eobrun, ac_t) -> int:
    """Progressive AC refinement scan (Ah>0) for one data unit, T.81
    G.1.2.3: every already-nonzero coefficient passed over receives a
    correction bit (magnitude += 1<<Al when set, moving away from zero);
    zero-history positions count toward the run, and a newly-nonzero
    coefficient arrives as ±1<<Al. An EOB run still sends correction bits
    for the nonzero coefficients in the remaining band."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(br, ac_t)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    # NB: (1<<r)+extra here, unlike the first scan's
                    # (1<<r)-1+extra — the shared tail below consumes one
                    # for THIS block (its remaining band still takes
                    # correction bits; a first-scan EOB block takes none)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: ZRL — pass 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                newval = p1 if br.bit() else m1
            while k <= se:
                if coef[k]:
                    if br.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = newval
            k += 1
    if eobrun:
        while k <= se:
            if coef[k]:
                if br.bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg(data: bytes):
    """JPEG DCT decode — baseline sequential (SOF0/1, interleaved or
    multi-scan non-interleaved), progressive (SOF2: spectral selection
    + successive approximation, r11), AND the arithmetic-coded twins
    (SOF9 sequential / SOFA progressive, r12: QM coder + Annex F
    statistical models in :mod:`jpeg_arith`, DAC conditioning). One
    generic scan loop accumulates raw zigzag coefficients per component;
    dequant + IDCT + upsample run once at the end (identical arithmetic
    to applying q inline, and the only formulation progressive
    refinement permits). 12-bit precision decodes for SOF1/SOF2/SOF9/
    SOFA (level shift/chroma center 2^(P-1), samples scaled to the uint8
    pipeline contract). Arithmetic lossless and the hierarchical
    (differential) family remain NotImplementedError."""
    import struct

    import numpy as np

    from . import jpeg_arith as ja

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    sof = None
    progressive = False
    arithmetic = False
    differential = False
    hier = False                 # DHP seen: hierarchical stream
    pending_exp = (0, 0)         # EXP flags awaiting the next frame
    frames: list[dict] = []      # closed frames (hierarchical pyramid)
    dc_cond: dict[int, tuple] = {}  # DAC DC conditioning: tb -> (L, U)
    ac_cond: dict[int, int] = {}    # DAC AC conditioning: tb -> Kx
    precision = 8
    dri = 0
    pos = 2
    scans: list[dict] = []

    cur_exp = (0, 0)  # EXP flags bound to the OPEN frame

    def _close_frame():
        nonlocal sof, scans, progressive, arithmetic, differential
        if sof is not None:
            if not scans:
                raise ValueError("JPEG frame without scans")
            frames.append(
                {
                    "sof": sof, "scans": scans, "progressive": progressive,
                    "arithmetic": arithmetic, "differential": differential,
                    "exp": cur_exp,
                }
            )
        sof, scans = None, []

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if marker == 0xC3:  # lossless (SOF3): its own scan machinery
            if hier:
                raise NotImplementedError(
                    "hierarchical lossless JPEG not decoded here"
                )
            return _decode_jpeg_lossless(data)
        if marker in _JPEG_SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_JPEG_SOF_UNSUPPORTED[marker]} (SOF {marker:#x}) "
                "not decoded here — huffman DCT (incl. hierarchical) and "
                "arithmetic DCT only"
            )
        if pos + 4 > len(data):
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i:i + n]
                if len(raw) < n:
                    raise ValueError("truncated DQT")
                vals = (
                    np.frombuffer(raw, ">u2").astype(np.int32)
                    if pq else np.frombuffer(raw, np.uint8).astype(np.int32)
                )
                # kept in ZIGZAG order as read: coefficients are decoded in
                # zigzag order too, so q[k] pairs with coef[k] directly
                qt[tq] = vals
                i += n
        elif marker == 0xC4:  # DHT (possibly several, possibly mid-file)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _jpeg_build_huff(bits, vals)
                i += 17 + n
        elif marker == 0xCC:  # DAC: arithmetic conditioning (mid-file ok)
            ja.parse_dac(seg, dc_cond, ac_cond)
        elif marker == 0xDE:  # DHP: hierarchical progression (SOF syntax)
            hier = True
        elif marker == 0xDF:  # EXP: expand reference before next frame
            if not hier:
                raise ValueError("JPEG EXP outside a hierarchical stream")
            pending_exp = (seg[0] >> 4, seg[0] & 15)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA, 0xC5, 0xC6):  # DCT SOF
            _close_frame()
            cur_exp, pending_exp = pending_exp, (0, 0)
            prec, h, w, nf = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG {prec}-bit precision")
            if prec == 12 and marker == 0xC0:
                # T.81: baseline is 8-bit by definition; a 12-bit SOF0 is a
                # malformed stream, not a codec boundary
                raise ValueError("JPEG baseline (SOF0) with 12-bit precision")
            precision = prec
            progressive = marker in (0xC2, 0xCA, 0xC6)
            arithmetic = marker in (0xC9, 0xCA)
            differential = marker in (0xC5, 0xC6)
            if differential and not hier:
                raise ValueError("JPEG differential frame without DHP")
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("JPEG sampling factor 0")
            # annotate block geometry NOW: scan headers copy these dicts
            _hmax = max(c["h"] for c in comps)
            _vmax = max(c["v"] for c in comps)
            _mcux = -(-w // (8 * _hmax)) if w else 0
            _mcuy = -(-h // (8 * _vmax)) if h else 0
            for ci, c in enumerate(comps):
                c["ci"] = ci
                c["bw_pad"], c["bh_pad"] = _mcux * c["h"], _mcuy * c["v"]
                # non-interleaved scans cover ONLY the component's own
                # block grid: comp dims = ceil(frame * sampling / max),
                # blocks = ceil(dim / 8)
                c["bw"] = -(--(-w * c["h"] // _hmax) // 8)
                c["bh"] = -(--(-h * c["v"] // _vmax) // 8)
            sof = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDD:  # DRI (may change between scans)
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: scan header, then entropy data
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            by_id = {c["id"]: c for c in sof["comps"]}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                if cs not in by_id:
                    raise ValueError(f"JPEG scan references unknown comp {cs}")
                scan_comps.append(
                    {**by_id[cs], "td": tdta >> 4, "ta": tdta & 15}
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            # entropy: unstuff FF00, split restart-interval chunks at RSTn
            chunks: list[bytearray] = [bytearray()]
            i = pos + 2 + seg_len
            while i < len(data):
                b = data[i]
                if b == 0xFF:
                    m = data[i + 1] if i + 1 < len(data) else 0xD9
                    if m == 0x00:
                        chunks[-1].append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        chunks.append(bytearray())
                        i += 2
                        continue
                    break  # EOI or a following marker segment
                chunks[-1].append(b)
                i += 1
            scans.append(
                {
                    "comps": scan_comps, "ss": ss, "se": se,
                    "ah": ahal >> 4, "al": ahal & 15, "dri": dri,
                    "tables": dict(huff), "chunks": chunks,
                    "dc_cond": dict(dc_cond), "ac_cond": dict(ac_cond),
                }
            )
            pos = i
            continue
        pos += 2 + seg_len
    _close_frame()
    if not frames:
        raise ValueError("JPEG without SOF/SOS")

    refs: dict[int, "np.ndarray"] = {}  # hierarchical: comp id -> int plane
    maxval = (1 << precision) - 1
    for fr_i, fr in enumerate(frames):
        sof = fr["sof"]
        scans = fr["scans"]
        progressive = fr["progressive"]
        arithmetic = fr["arithmetic"]
        differential = fr["differential"]
        if fr_i == 0 and differential:
            raise ValueError("JPEG first hierarchical frame is differential")
        if fr_i > 0 and not differential:
            raise ValueError("JPEG non-differential frame after the first")

        h, w = sof["h"], sof["w"]
        if h == 0 or w == 0:
            raise ValueError("JPEG zero dimension")
        comps = sof["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        coefs = [
            np.zeros((c["bh_pad"], c["bw_pad"], 64), dtype=np.int64)
            for c in comps
        ]

        _jpeg_decode_scans(scans, coefs, comps, progressive, arithmetic,
                           differential, mcux, mcuy)

        # dequant + dezigzag + IDCT, vectorized per plane; differential
        # frames carry NO level shift (they code a residual around 0)
        basis = _jpeg_dct_basis()
        zz = np.asarray(_JPEG_ZIGZAG)
        half = float(1 << (precision - 1))
        planes = []
        for ci, c in enumerate(comps):
            if c["tq"] not in qt:
                raise ValueError(f"JPEG missing quant table {c['tq']}")
            q = qt[c["tq"]]
            deq = coefs[ci].astype(np.float64) * q[None, None, :]
            blocks = np.zeros_like(deq)
            blocks[:, :, zz] = deq  # dezigzag to natural order
            blocks = blocks.reshape(c["bh_pad"], c["bw_pad"], 8, 8)
            spatial = np.einsum("ux,nmuv,vy->nmxy", basis, blocks, basis)
            if not differential:
                spatial = spatial + half  # level shift (T.81 A.3.1)
            planes.append(
                spatial.transpose(0, 2, 1, 3).reshape(
                    c["bh_pad"] * 8, c["bw_pad"] * 8
                )
            )

        if not hier:
            # single-frame path: upsample padded planes to the frame grid,
            # color transform once at the end (unchanged r10/r11 behavior)
            full = []
            for c, p in zip(comps, planes):
                p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
                full.append(p[:h, :w])
            return _jpeg_color_out(full, precision)

        # hierarchical assembly (T.81 Annex J): per-component integer
        # references at COMPONENT resolution; EXP doubles a reference
        # before a differential frame; each frame's output clamps to the
        # sample range and becomes the new reference
        eh, ev = fr["exp"]
        if (eh or ev) and not differential:
            raise ValueError("JPEG EXP before a non-differential frame")
        for c, p in zip(comps, planes):
            cw = -(-w * c["h"] // hmax)
            chh = -(-h * c["v"] // vmax)
            p = p[:chh, :cw]
            if differential:
                if c["id"] not in refs:
                    raise ValueError(
                        f"JPEG differential frame for unseen comp {c['id']}"
                    )
                ref = refs[c["id"]]
                if eh or ev:
                    ref = _jpeg_expand(ref, eh, ev)
                if ref.shape != p.shape:
                    # EXP emits 2x grids; the frame header is authoritative
                    ref = _jpeg_fit(ref, chh, cw)
                out = np.clip(np.rint(ref.astype(np.float64) + p), 0, maxval)
            else:
                out = np.clip(np.rint(p), 0, maxval)
            refs[c["id"]] = out.astype(np.int32)

    # final hierarchical output: the LAST frame defines geometry
    last = frames[-1]["sof"]
    h, w = last["h"], last["w"]
    comps = last["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        p = refs[c["id"]].astype(np.float64)
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(_jpeg_fit(p, h, w))
    return _jpeg_color_out(full, precision)


def _jpeg_expand(p, eh: int, ev: int):
    """Reference-component expansion (T.81 J.1.1.2): output even samples
    copy the input, odd samples interpolate ((a + b + 1) >> 1) with edge
    replication; horizontal then vertical when both flags are set."""
    import numpy as np

    if eh:
        nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        out = np.empty((p.shape[0], 2 * p.shape[1]), dtype=p.dtype)
        out[:, 0::2] = p
        out[:, 1::2] = (p + nxt + 1) >> 1
        p = out
    if ev:
        nxt = np.concatenate([p[1:, :], p[-1:, :]], axis=0)
        out = np.empty((2 * p.shape[0], p.shape[1]), dtype=p.dtype)
        out[0::2, :] = p
        out[1::2, :] = (p + nxt + 1) >> 1
        p = out
    return p


def _jpeg_fit(p, h: int, w: int):
    """Crop/edge-replicate a plane to exactly (h, w)."""
    import numpy as np

    if p.shape[0] < h:
        p = np.concatenate([p, np.repeat(p[-1:, :], h - p.shape[0], 0)], 0)
    if p.shape[1] < w:
        p = np.concatenate([p, np.repeat(p[:, -1:], w - p.shape[1], 1)], 1)
    return p[:h, :w]


def _jpeg_color_out(full, precision: int):
    """Shared output stage: YCbCr->RGB (3 comps) or grayscale, clip to the
    sample range, scale >8-bit precisions onto the uint8 contract."""
    import numpy as np

    half = float(1 << (precision - 1))
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - half)
        g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        bl = y + 1.772 * (cb - half)
        img = np.stack([r, g, bl], axis=-1)
    elif len(full) == 1:
        img = full[0][:, :, None]
    else:
        raise NotImplementedError(f"JPEG with {len(full)} components")
    maxval = (1 << precision) - 1
    img = np.clip(np.rint(img), 0, maxval)
    if precision > 8:
        # pipeline contract: decoded planes are uint8; higher-precision
        # samples scale down (floor) — the stats/resize stages downstream
        # are defined on 8-bit planes
        img = np.floor(img / float(1 << (precision - 8)))
    return img.astype(np.uint8)


def _jpeg_decode_scans(scans, coefs, comps, progressive, arithmetic,
                       differential, mcux, mcuy):
    """Entropy-decode every scan of ONE frame into the zigzag coefficient
    accumulators (shared by sequential/progressive, huffman/arithmetic,
    and differential frames — the latter code DC with PRED = 0 per block
    and no inter-block chaining, T.81 F.2.1.3.1)."""
    from . import jpeg_arith as ja

    for sc in scans:
        scomps = sc["comps"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        if not progressive:
            ss, se, ah, al = 0, 63, 0, 0  # baseline scans are full-band
        tables = sc["tables"]
        if progressive and ss > 0 and len(scomps) != 1:
            raise ValueError("JPEG progressive AC scan with >1 component")
        if progressive and (se > 63 or ss > se or (ss == 0 and se != 0)):
            raise ValueError("JPEG bad spectral selection")
        need_dc = ss == 0 and ah == 0
        need_ac = se > 0
        if not arithmetic:
            for c in scomps:
                if need_dc and (0, c["td"]) not in tables:
                    raise ValueError("JPEG missing huffman table")
                if need_ac and (1, c["ta"]) not in tables:
                    raise ValueError("JPEG missing huffman table")
        interleaved = len(scomps) > 1
        if interleaved:
            n_units = mcux * mcuy
        else:
            c0 = scomps[0]
            # a single-component scan of a 1-component frame still uses
            # the MCU grid (hmax == c.h), so bw == bw_pad there
            n_units = c0["bw"] * c0["bh"]
        preds = {c["ci"]: 0 for c in scomps}
        eobrun = 0
        chunk_i = 0
        br = _JpegBits(sc["chunks"][0])

        # arithmetic-scan state: statistics reset at scan start and at
        # every restart (F.1.4.4); conditioning comes from the DAC values
        # in effect at this scan's SOS
        def _fresh_arith():
            return (
                ja.QmDecoder(sc["chunks"][chunk_i]),
                {c["td"]: ja.new_dc_stats() for c in scomps},
                {c["ta"]: ja.new_ac_stats() for c in scomps},
                {c["ci"]: 0 for c in scomps},
            )

        if arithmetic:
            qm, dc_st, ac_st, dc_ctx = _fresh_arith()
            fixed = ja.new_fixed_bin()

        def decode_unit_arith(coef, c):
            lo, up = sc["dc_cond"].get(c["td"], (0, 1))
            kx = sc["ac_cond"].get(c["ta"], 5)
            if not progressive:
                diff, dc_ctx[c["ci"]] = ja.decode_dc_diff(
                    qm, dc_st[c["td"]], dc_ctx[c["ci"]], lo, up
                )
                preds[c["ci"]] += diff
                coef[0] = preds[c["ci"]]
                ja.decode_ac_band(qm, ac_st[c["ta"]], kx, coef, 1, 63, 0, fixed)
            elif ss == 0:
                if ah == 0:  # DC first: diffs on the point-transformed scale
                    diff, dc_ctx[c["ci"]] = ja.decode_dc_diff(
                        qm, dc_st[c["td"]], dc_ctx[c["ci"]], lo, up
                    )
                    preds[c["ci"]] += diff
                    coef[0] = preds[c["ci"]] << al
                elif qm.decode(fixed, 0):  # DC refinement: one fixed-bin bit
                    coef[0] |= 1 << al
            elif ah == 0:
                ja.decode_ac_band(qm, ac_st[c["ta"]], kx, coef, ss, se, al, fixed)
            else:
                ja.decode_ac_refine(qm, ac_st[c["ta"]], coef, ss, se, al, fixed)

        def decode_unit(coef, c):
            nonlocal eobrun
            if not progressive:
                dc_t, ac_t = tables[(0, c["td"])], tables[(1, c["ta"])]
                t = _jpeg_huff_decode(br, dc_t)
                if differential:  # PRED = 0 per block (T.81 F.2.1.3.1)
                    preds[c["ci"]] = _jpeg_extend(br.receive(t), t)
                else:
                    preds[c["ci"]] += _jpeg_extend(br.receive(t), t)
                coef[0] = preds[c["ci"]]
                k = 1
                while k < 64:
                    rs = _jpeg_huff_decode(br, ac_t)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    coef[k] = _jpeg_extend(br.receive(s), s)
                    k += 1
            elif ss == 0:
                if ah == 0:  # DC first
                    t = _jpeg_huff_decode(br, tables[(0, c["td"])])
                    if differential:  # PRED = 0 per block
                        preds[c["ci"]] = _jpeg_extend(br.receive(t), t)
                    else:
                        preds[c["ci"]] += _jpeg_extend(br.receive(t), t)
                    coef[0] = preds[c["ci"]] << al
                elif br.bit():  # DC refinement: one correction bit
                    coef[0] |= 1 << al
            elif ah == 0:
                eobrun = _jpeg_first_ac(
                    br, coef, ss, se, al, eobrun, tables[(1, c["ta"])]
                )
            else:
                eobrun = _jpeg_refine_ac(
                    br, coef, ss, se, al, eobrun, tables[(1, c["ta"])]
                )

        unit_fn = decode_unit_arith if arithmetic else decode_unit
        for unit in range(n_units):
            if sc["dri"] and unit and unit % sc["dri"] == 0:
                chunk_i += 1
                if chunk_i >= len(sc["chunks"]):
                    raise ValueError("JPEG missing restart marker")
                preds = {c["ci"]: 0 for c in scomps}
                eobrun = 0
                if arithmetic:
                    qm, dc_st, ac_st, dc_ctx = _fresh_arith()
                else:
                    br = _JpegBits(sc["chunks"][chunk_i])
            if interleaved:
                my, mx = divmod(unit, mcux)
                for c in scomps:
                    for b in range(c["v"] * c["h"]):
                        by = my * c["v"] + b // c["h"]
                        bx = mx * c["h"] + b % c["h"]
                        unit_fn(coefs[c["ci"]][by, bx], c)
            else:
                c = scomps[0]
                by, bx = divmod(unit, c["bw"])
                unit_fn(coefs[c["ci"]][by, bx], c)


def _decode_jpeg_lossless(data: bytes):
    """Lossless JPEG (SOF3, T.81 Annex H): per-sample Huffman-coded
    prediction differences — no DCT, no quantization, bit-exact.

    Implemented surface: precisions 2..16, predictors 1..7, point
    transform Pt, interleaved and per-component scans, restart intervals;
    sampling factors must all be 1x1 (subsampled lossless is essentially
    unused and stays NotImplementedError). Prediction per H.1.2.1: the
    first sample of a scan (and of each restart interval) predicts from
    2^(P-Pt-1); the rest of the first line from the left neighbor; first
    column from the above neighbor; everywhere else the selected
    predictor. Reconstruction is modulo 2^16.

    Components are returned as-is (3-component lossless is stored RGB —
    Annex H defines no color transform); samples land on the uint8
    pipeline contract by shifting (P - 8) bits (or up-shifting when
    P < 8), same convention as the 12-bit DCT path."""
    import struct

    import numpy as np

    huff: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    pos = 2
    planes: list | None = None
    prec = 8
    pt_used = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _jpeg_build_huff(bits, vals)
                i += 17 + n
        elif marker == 0xC3:
            prec, h, w, nf = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if not 2 <= prec <= 16:
                raise ValueError(f"JPEG lossless precision {prec}")
            comps = []
            for c in range(nf):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG not decoded here"
                    )
                comps.append({"id": cid, "ci": c})
            if h == 0 or w == 0:
                raise ValueError("JPEG zero dimension")
            sof = {"h": h, "w": w, "comps": comps}
            planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
        elif marker == 0xDD:
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if sof is None or planes is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in sof["comps"]}
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                if cs not in by_id:
                    raise ValueError(f"JPEG scan references unknown comp {cs}")
                scomps.append({**by_id[cs], "td": tdta >> 4})
            sel = seg[1 + 2 * ns]          # Ss = predictor selector
            pt = seg[3 + 2 * ns] & 15      # Al = point transform
            if not 1 <= sel <= 7:
                raise ValueError(f"JPEG lossless predictor {sel}")
            for c in scomps:
                if (0, c["td"]) not in huff:
                    raise ValueError("JPEG missing huffman table")
            pt_used = pt
            h, w = sof["h"], sof["w"]
            default = 1 << (prec - pt - 1)

            chunks: list[bytearray] = [bytearray()]
            i = pos + 2 + seg_len
            while i < len(data):
                b = data[i]
                if b == 0xFF:
                    m = data[i + 1] if i + 1 < len(data) else 0xD9
                    if m == 0x00:
                        chunks[-1].append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        chunks.append(bytearray())
                        i += 2
                        continue
                    break
                chunks[-1].append(b)
                i += 1

            br = _JpegBits(chunks[0])
            chunk_i = 0
            fresh = True  # next sample per comp predicts from `default`
            mask = (1 << 16) - 1

            def pred_of(plane, y, x):
                if y == 0:
                    return int(plane[0, x - 1])  # first line: left
                if x == 0:
                    return int(plane[y - 1, 0])  # first column: above
                a = int(plane[y, x - 1])
                b = int(plane[y - 1, x])
                cc = int(plane[y - 1, x - 1])
                if sel == 1:
                    return a
                if sel == 2:
                    return b
                if sel == 3:
                    return cc
                if sel == 4:
                    return a + b - cc
                if sel == 5:
                    return a + ((b - cc) >> 1)
                if sel == 6:
                    return b + ((a - cc) >> 1)
                return (a + b) >> 1  # sel == 7

            n_mcu = h * w
            for mcu in range(n_mcu):
                if dri and mcu and mcu % dri == 0:
                    chunk_i += 1
                    if chunk_i >= len(chunks):
                        raise ValueError("JPEG missing restart marker")
                    br = _JpegBits(chunks[chunk_i])
                    fresh = True
                y, x = divmod(mcu, w)
                for c in scomps:
                    t = _jpeg_huff_decode(br, huff[(0, c["td"])])
                    if t > 16:
                        raise ValueError("JPEG lossless SSSS > 16")
                    diff = 32768 if t == 16 else _jpeg_extend(br.receive(t), t)
                    plane = planes[c["ci"]]
                    pred = default if fresh else pred_of(plane, y, x)
                    plane[y, x] = (pred + diff) & mask
                fresh = False
            pos = i
            continue
        pos += 2 + seg_len
    if sof is None or planes is None:
        raise ValueError("JPEG without SOF/SOS")
    # undo the point transform, then land on the uint8 contract
    out = np.stack(planes, axis=-1) << pt_used
    maxval = (1 << prec) - 1
    out = np.clip(out, 0, maxval)
    if prec > 8:
        out = out >> (prec - 8)
    elif prec < 8:
        out = out << (8 - prec)
    return out.astype(np.uint8)


# -- GIF (pure python LZW; r10) ----------------------------------------------
# GIF87a/89a first frame, straight off the public spec: logical screen +
# global/local color table, extension-block skip, variable-width LZW with
# clear/EOI codes, deferred-clear (full-table) handling, interlace passes.
# Animated GIFs return the FIRST frame composited on the logical screen.


def _gif_lzw_decode(stream: bytes, min_code_size: int, npix: int) -> list:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    bitpos = 0
    table: list | None = None
    prev: list | None = None
    out: list = []

    def read_code(w: int) -> int:
        nonlocal bitpos
        v = 0
        for i in range(w):
            byte = bitpos >> 3
            if byte >= len(stream):
                raise ValueError("truncated GIF LZW stream")
            v |= ((stream[byte] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    while len(out) < npix:
        code = read_code(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [None, None]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if table is None:
            raise ValueError("GIF LZW code before initial clear")
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            if table[code] is None:
                raise ValueError("GIF LZW references reserved code")
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < npix:
        raise ValueError("GIF LZW ended short of the pixel count")
    return out[:npix]


def _decode_gif(data: bytes):
    import struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct:  # background fill from the table's entry 0 region is optional;
        canvas[:, :] = tuple(gct[0:3])  # entry 0 is a common default
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label then sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            iflags = data[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = data[pos:pos + 3 * n]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame without any color table")
            if pos >= len(data):
                raise ValueError("truncated GIF before LZW data")
            mcs = data[pos]
            pos += 1
            if not (2 <= mcs <= 11):
                raise ValueError(f"bad GIF LZW min code size {mcs}")
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                stream += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.asarray(
                _gif_lzw_decode(bytes(stream), mcs, iw * ih), np.int32
            )
            if int(idx.max(initial=0)) * 3 + 2 >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            pal_arr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
            frame = pal_arr[idx].reshape(ih, iw, 3)
            if (iflags >> 6) & 1:  # interlaced: 4 passes
                de = np.zeros_like(frame)
                rows = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                de[rows] = frame
                frame = de
            if iy + ih > h or ix + iw > w:
                raise ValueError("GIF frame exceeds logical screen")
            canvas[iy:iy + ih, ix:ix + iw] = frame
            return canvas  # first frame only
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block {b:#x}")
    raise ValueError("GIF without image data")


def decode_pixels(data: bytes):
    """Real pixel decode for the formats that need no external codec:
    PNG (zlib inflate + unfilter), BMP (uncompressed), baseline sequential
    JPEG (pure-numpy huffman + dequant + IDCT, r10), and GIF first frame
    (pure-python variable-width LZW, r10). Returns an (h, w, channels)
    uint8 ndarray. Arithmetic-lossless/hierarchical JPEG remains the
    documented NotImplementedError boundary (progressive, 12-bit, lossless
    and arithmetic-DCT JPEG all decode as of r11/r12).

    Error contract: raises ONLY ValueError (malformed/corrupt/truncated
    payload) or NotImplementedError (format outside the codec boundary).
    Corrupt zlib streams, truncated headers (struct.error), and scanline
    buffers shorter than the IHDR-declared geometry are all normalized to
    ValueError here so per-row isolation in the Arrow stages never lets a
    single bad image fail the whole Spark task."""
    import struct
    import zlib

    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            img = _decode_png(data)
        elif data[:2] == b"BM":
            img = _decode_bmp(data)
        elif data[:2] == b"\xff\xd8":
            img = _decode_jpeg(data)
        elif data[:6] in (b"GIF87a", b"GIF89a"):
            img = _decode_gif(data)
        else:
            raise NotImplementedError(
                "unrecognized container bytes — PNG/BMP/JPEG/GIF are decoded"
            )
    except (struct.error, zlib.error, IndexError) as exc:
        raise ValueError(f"corrupt image payload: {exc}") from exc
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"image has zero dimension ({h}x{w})")
    return img


def _decode_image_real(payload: bytes):
    """Real-codec path for extract_image_features: decode pixels (PNG/BMP)
    and report (width, height)."""
    img = decode_pixels(payload)
    return img.shape[1], img.shape[0]


def _decode_image_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: first 8 hex-encoded bytes are width/height."""
    return int(payload[:2].hex(), 16), int(payload[2:4].hex(), 16)


def extract_image_features(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract stage (mapInPandas; payload stays in Arrow
    buffers between JVM and Python)."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_image_real if use_real_codec else _decode_image_fake
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                w, h = decode(data)
                rows.append((aid, w, h, len(data), hashlib.md5(data).hexdigest()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload")
        .mapInPandas(batch_fn, IMAGE_FEATURES_SCHEMA)
    )


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_luma_ppm", LongType()),
        StructField("err", StringType()),
    ]
)


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """REAL pixel-decode stage (PNG/BMP): dimensions, channel count, and
    mean luma (Rec.601 integer weights, ppm-scaled — no float aggregates)
    per image. Undecodable payloads (JPEG/GIF/corrupt) land with an ``err``
    string instead of poisoning the batch — per-row isolation, the same
    contract as ingest's parse_error markers. mapInPandas keeps payloads in
    Arrow buffers; decode cost is embarrassingly parallel."""
    import numpy as np

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = decode_pixels(bytes(payload))
                    h, w, ch = img.shape
                    px = img.astype(np.int64)
                    if ch >= 3:
                        luma = (
                            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                        ) // 1000
                    else:
                        luma = px[:, :, 0]
                    ppm = int(luma.sum() * 1_000_000 // (255 * h * w))
                    rows.append((aid, w, h, ch, ppm, None))
                except (NotImplementedError, ValueError, IndexError) as exc:
                    rows.append((aid, None, None, None, None, str(exc)[:120]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload")
        .mapInPandas(batch_fn, IMAGE_STATS_SCHEMA)
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("pixels", BinaryType()),
        StructField("err", StringType()),
    ]
)


def resize_images(assets: DataFrame, out_h: int = 32, out_w: int = 32) -> DataFrame:
    """Decode (PNG/BMP) + nearest-neighbor resize to a fixed grid — the
    normalize-before-embed step of a multimodal training pipeline. Output
    pixels are a raw RGB byte buffer (gray replicated, alpha dropped) of
    exactly out_h*out_w*3 bytes; undecodable rows carry ``err``."""
    import numpy as np

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    img = decode_pixels(bytes(payload))
                    h, w, ch = img.shape
                    yi = (np.arange(out_h) * h) // out_h
                    xi = (np.arange(out_w) * w) // out_w
                    small = img[yi][:, xi]
                    if ch == 1:
                        small = np.repeat(small, 3, axis=2)
                    elif ch == 2:  # gray+alpha: replicate gray, drop alpha
                        small = np.repeat(small[:, :, :1], 3, axis=2)
                    elif ch == 4:
                        small = small[:, :, :3]
                    rows.append(
                        (aid, out_h, out_w, small.astype(np.uint8).tobytes(), None)
                    )
                except (NotImplementedError, ValueError, IndexError) as exc:
                    rows.append((aid, None, None, None, str(exc)[:120]))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload")
        .mapInPandas(batch_fn, RESIZED_SCHEMA)
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 32, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video payloads: emits one row per sampled
    'frame' (here: a byte stride; a real impl strides by keyframe)."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((aid, i, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(batch_fn, FRAME_SAMPLE_SCHEMA)
    )


PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def probe_dimensions(data: bytes):
    """REAL container-format header parsing — (format, width, height) for
    PNG / JPEG / GIF / BMP from the raw bytes, straight off the public
    format specs (PNG IHDR big-endian, JPEG SOFn marker walk, GIF logical
    screen little-endian, BMP BITMAPINFOHEADER little-endian). No codec
    library involved: dimensions live in the container header, so unlike
    pixel decode (the documented NotImplementedError boundary) this stage
    is fully real in this container. Unknown/truncated → (None, None,
    None)."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(data[16:20], "big"),
            int.from_bytes(data[20:24], "big"),
        )
    if data[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC): height@+5, width@+7
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(data[i + 7 : i + 9], "big"),
                    int.from_bytes(data[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
        return ("jpeg", None, None)  # valid SOI but no SOF found (truncated)
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
        )
    if len(data) >= 26 and data[:2] == b"BM":
        return (
            "bmp",
            int.from_bytes(data[18:22], "little", signed=True),
            # height may be negative (top-down rows)
            abs(int.from_bytes(data[22:26], "little", signed=True)),
        )
    return (None, None, None)


def probe_image_metadata(assets: DataFrame) -> DataFrame:
    """Header-probe stage: (asset_id, format, width, height, n_bytes) for
    every asset, real format sniffing over Arrow batches. The standard
    pre-filter of an image pipeline (drop tiny/huge/unknown assets) runs on
    this output WITHOUT ever invoking a pixel codec."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                fmt, w, h = probe_dimensions(data)
                rows.append((aid, fmt, w, h, len(data)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PROBE_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(batch_fn, PROBE_SCHEMA)


def _gif_count_frames(data: bytes) -> int:
    """Image-descriptor count from the block structure (no LZW decode):
    skip the global color table, then walk extensions / descriptors /
    sub-blocks to the trailer. Raises on malformed structure."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    frames = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label then sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block {b:#x}")
    return frames


def probe_format_mode(data: bytes):
    """(format, mode, decodable) from container HEADERS only — the codec-
    boundary share probe (r10 verdict item 5). ``decodable`` predicts
    whether ``decode_pixels`` is inside its implemented boundary for this
    payload (it may still raise ValueError on a corrupt stream — coverage
    measures the FORMAT boundary, not corruption). The mode taxonomy
    mirrors the decoders' own NotImplementedError conditions:

      png   depth{d}-ctype{t}[-interlaced]   decodable iff (d, t) is a
                                             spec-valid combo (§11.2.2) —
                                             the full static-PNG surface
                                             incl. palette, 1/2/4/16-bit
                                             and Adam7 decodes since r12
      jpeg  baseline / extended-sequential
            / progressive (huffman, r11)
            / arithmetic-sequential
            / arithmetic-progressive (r12)   decodable (8/12-bit precision)
            arithmetic-lossless / lossless-subsampled / differential-* /
            *-{p}bit / no-sof                not decodable
      gif   single-frame / multi-frame       decodable (decode_pixels
                                             composites the FIRST frame;
                                             later frames are the boundary)
      bmp   comp{c}-{b}bpp                   decodable iff c=0 with b in
                                             8/24/32, or c=1 (RLE8) with
                                             b=8
      unknown                                not decodable

    At 100 TB this is the number that tells you whether the progressive-
    JPEG gap is a boundary or a bug: real web corpora are heavily
    progressive, and a decode stage that silently error-marks 40% of
    images must be MEASURED before it is shipped."""
    if len(data) >= 29 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        depth, ctype, interlace = data[24], data[25], data[28]
        mode = f"depth{depth}-ctype{ctype}" + ("-interlaced" if interlace else "")
        ok = depth in _PNG_VALID_DEPTHS.get(ctype, ()) and interlace in (0, 1)
        return "png", mode, ok
    if data[:3] == b"\xff\xd8\xff":
        i = 2
        dhp = False
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDE:  # DHP: hierarchical stream
                dhp = True
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if dhp:
                    # hierarchical (r12): decodable when the first frame is
                    # a supported huffman/arithmetic DCT type (differential
                    # DCT frames decode; differential lossless/arithmetic
                    # stay the boundary and fail per-row at decode)
                    ok = marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA)
                    prec = data[i + 4] if i + 4 < len(data) else 0
                    ok = ok and prec in (8, 12)
                    return "jpeg", "hierarchical", ok
                if marker in _JPEG_SOF_UNSUPPORTED:
                    return (
                        "jpeg",
                        _JPEG_SOF_UNSUPPORTED[marker].replace(" ", "-"),
                        False,
                    )
                if marker == 0xC3:  # lossless decodes since r11 (1x1 only)
                    prec = data[i + 4] if i + 4 < len(data) else 0
                    nf = data[i + 9] if i + 9 < len(data) else 0
                    hvs = [
                        data[i + 11 + 3 * c]
                        for c in range(nf)
                        if i + 11 + 3 * c < len(data)
                    ]
                    ok = (
                        2 <= prec <= 16
                        and len(hvs) == nf
                        and all(hv == 0x11 for hv in hvs)
                    )
                    mode = "lossless" if prec == 8 else f"lossless-{prec}bit"
                    if not all(hv == 0x11 for hv in hvs):
                        mode += "-subsampled"
                    return "jpeg", mode, ok
                mode = {
                    0xC0: "baseline",
                    0xC1: "extended-sequential",
                    0xC2: "progressive",  # huffman progressive decodes (r11)
                    0xC9: "arithmetic-sequential",   # QM decode (r12)
                    0xCA: "arithmetic-progressive",  # QM decode (r12)
                }[marker]
                prec = data[i + 4] if i + 4 < len(data) else 0
                if prec == 8:
                    return "jpeg", mode, True
                if prec == 12 and marker != 0xC0:
                    # 12-bit SOF1/SOF2/SOF9/SOFA decode since r11/r12
                    # (SOF0 must be 8-bit per T.81 — a 12-bit SOF0 is
                    # malformed)
                    return "jpeg", f"{mode}-12bit", True
                return "jpeg", f"{mode}-{prec}bit", False
            i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        return "jpeg", "no-sof", False
    if data[:6] in (b"GIF87a", b"GIF89a"):
        try:
            frames = _gif_count_frames(data)
        except (ValueError, IndexError):
            return "gif", "malformed", False
        if frames == 0:
            return "gif", "no-frames", False
        return "gif", "multi-frame" if frames > 1 else "single-frame", True
    if len(data) >= 34 and data[:2] == b"BM":
        bpp = int.from_bytes(data[28:30], "little")
        comp = int.from_bytes(data[30:34], "little")
        ok = (comp == 0 and bpp in (8, 24, 32)) or (comp == 1 and bpp == 8)
        return "bmp", f"comp{comp}-{bpp}bpp", ok
    return "unknown", None, False


COVERAGE_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("mode", StringType()),
        StructField("decodable", BooleanType()),
    ]
)


def probe_assets(
    assets: DataFrame,
    keep_cols: tuple = (),
    payload_col: str = "payload",
) -> DataFrame:
    """(keep_cols..., format, mode, decodable) — header-sniff every asset,
    carrying the named metadata columns (source, shard, asset_id, ...)
    through the Arrow stage so coverage can be ATTRIBUTED, not just
    totalled. Payload bytes never leave the map stage: downstream sees
    only the tiny classification tuple plus the keys. This is the shared
    sniff pass under :func:`decode_coverage` (global totals) and the
    per-source coverage columns in the curation composition report."""
    keep = list(keep_cols)
    in_schema = dict(
        (f.name, f.dataType.simpleString()) for f in assets.schema.fields
    )
    out_schema = ", ".join(
        [f"{c} {in_schema[c]}" for c in keep]
        + ["format string", "mode string", "decodable boolean"]
    )

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                probe_format_mode(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(rows, columns=["format", "mode", "decodable"])
            for c in reversed(keep):
                out.insert(0, c, pdf[c].reset_index(drop=True))
            yield out

    return assets.select(*keep, payload_col).mapInPandas(batch_fn, out_schema)


def decode_coverage(assets: DataFrame) -> DataFrame:
    """Per-(format, mode) decode coverage of a binary corpus:
    (format, mode, decodable, n_assets) — the corpus_report companion for
    binary modalities. One Arrow mapInPandas header-sniff pass (no pixel
    decode, no payload shuffle: the groupBy key is the tiny classification
    tuple), then a map-side-combined count."""
    return (
        probe_assets(assets)
        .groupBy("format", "mode", "decodable")
        .agg(F.count("*").cast("bigint").alias("n_assets"))
    )


def decode_coverage_by(
    assets: DataFrame, keys: tuple = ("source",), payload_col: str = "payload"
) -> DataFrame:
    """Per-key decode coverage rollup for the composition report:
    (keys..., n_assets_decodable, decode_by_format) where decode_by_format
    is a deterministic comma-joined 'format=n_decodable/n_total' string
    sorted by format — string-typed so both engines of the oracle gate
    hash it identically. Plan: one sniff map stage, one (keys, format)
    keyed shuffle with map-side combine, one per-key string fold — no
    payload ever shuffles."""
    keys = list(keys)
    probed = probe_assets(assets, keep_cols=tuple(keys), payload_col=payload_col)
    by_fmt = probed.groupBy(*keys, "format").agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum(F.col("decodable").cast("int")).cast("bigint").alias("_d"),
    )
    fmt_str = F.concat(
        F.col("format"), F.lit("="),
        F.col("_d").cast("string"), F.lit("/"), F.col("_n").cast("string"),
    )
    return by_fmt.select(*keys, fmt_str.alias("_s"), "_d").groupBy(*keys).agg(
        F.sum("_d").cast("bigint").alias("n_assets_decodable"),
        F.concat_ws(",", F.sort_array(F.collect_list("_s"))).alias(
            "decode_by_format"
        ),
    )


# --- deterministic format-corpus synthesis (the decode_coverage fixture) --
# Structurally REAL minimal containers, one per class k = id % n_classes,
# spanning the codec boundary from both sides. The builders emit honest
# header walks (the probe actually parses them — a misclassification
# breaks the oracle), with junk entropy/pixel data (coverage never
# decodes pixels).

FORMAT_CLASSES = [
    # (format, mode, decodable) — MUST match probe_format_mode's taxonomy
    ("png", "depth8-ctype2", True),
    ("png", "depth16-ctype2", True),  # 16-bit decodes since r12 (high byte)
    ("jpeg", "baseline", True),
    ("jpeg", "progressive", True),  # huffman progressive decodes since r11
    ("jpeg", "arithmetic-sequential", True),  # QM decode since r12
    ("gif", "single-frame", True),
    ("gif", "multi-frame", True),
    ("bmp", "comp0-24bpp", True),
    ("bmp", "comp1-8bpp", True),    # RLE8 + palette decode since r12
    ("unknown", None, False),
    ("jpeg", "extended-sequential-12bit", True),  # decodes since r11
    ("jpeg", "lossless", True),                   # decodes since r11
    ("jpeg", "arithmetic-progressive", True),     # QM decode since r12
    ("jpeg", "hierarchical", True),               # DHP/EXP/SOF5-6 since r12
    ("png", "depth4-ctype3", True),               # palette PNG since r12
    ("png", "depth8-ctype2-interlaced", True),    # Adam7 since r12
    ("jpeg", "arithmetic-lossless", False),       # no mainstream decoder
]


def synth_container(cls: int, salt: int = 0) -> bytes:
    """A minimal structurally-valid container of class ``cls`` (see
    FORMAT_CLASSES); ``salt`` varies trailing junk bytes so payloads are
    not byte-identical across assets."""
    import struct

    tail = hashlib.md5(f"{cls}:{salt}".encode()).digest()
    k = cls % len(FORMAT_CLASSES)
    if k in (0, 1, 14, 15):  # PNG: depth8/16 truecolor, depth4 palette,
        # interlaced truecolor
        depth, ctype, ilace = {
            0: (8, 2, 0), 1: (16, 2, 0), 14: (4, 3, 0), 15: (8, 2, 1),
        }[k]
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, ilace)
        plte = (
            struct.pack(">I", 6) + b"PLTE" + b"\x00\x00\x00\xff\xff\xff"
            + b"\x00\x00\x00\x00"
            if ctype == 3
            else b""
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
            + plte + tail
        )
    if k in (2, 3, 4, 10, 11, 12, 13, 16):  # JPEG SOF variants
        # (13: DHP+SOF0 hierarchical; 16: SOF11 arithmetic lossless)
        sof_marker = {2: 0xC0, 3: 0xC2, 4: 0xC9, 10: 0xC1, 11: 0xC3,
                      12: 0xCA, 13: 0xC0, 16: 0xCB}[k]
        prec = 12 if k == 10 else 8
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = (
            bytes([0xFF, sof_marker])
            + struct.pack(">H", 11)            # length
            + bytes([prec])                     # precision
            + struct.pack(">HH", 4, 4)          # height, width
            + bytes([1, 1, 0x11, 0])            # 1 component
        )
        dhp = b""
        if k == 13:  # hierarchical: DHP (SOF syntax) precedes the frames
            dhp = (
                b"\xff\xde" + struct.pack(">H", 11) + bytes([prec])
                + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0])
            )
        return b"\xff\xd8" + app0 + dhp + sof + tail + b"\xff\xd9"
    if k in (5, 6):  # GIF: 1 vs 2 image descriptors
        hdr = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x80, 0, 0])
        gct = b"\x00\x00\x00\xff\xff\xff"  # 2-entry global table
        desc = (
            b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
            + b"\x02"            # LZW min code size
            + b"\x01\x44\x00"    # one 1-byte sub-block + terminator
        )
        n = 1 if k == 5 else 2
        return hdr + gct + desc * n + b"\x3b" + tail
    if k in (7, 8):  # BMP: uncompressed 24bpp vs RLE8 8bpp
        bpp, comp = (24, 0) if k == 7 else (8, 1)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, bpp, comp, 0, 0, 0, 0, 0)
        filehdr = b"BM" + struct.pack("<IHHI", 54 + 16, 0, 0, 54)
        return filehdr + info + tail
    return b"\x00NOTAFORMAT" + tail  # class 9: unknown container


def synthetic_format_assets(
    docs: DataFrame, id_col: str = "doc_id", keep_cols: tuple = ()
) -> DataFrame:
    """(asset_id, payload, keep_cols...) with payload = synth_container(id %
    len(FORMAT_CLASSES), id) — the deterministic binary-corpus stand-in
    keyed off the documents table, same discipline as the binary_dedup
    fixture (an oracle can recompute the classification from the id alone
    while the Spark side actually SNIFFS real container bytes).
    ``keep_cols`` carries document metadata (source, lang, ...) onto the
    assets so per-source coverage attribution needs no join back."""
    n_cls = len(FORMAT_CLASSES)
    keep = list(keep_cols)
    in_schema = dict(
        (f.name, f.dataType.simpleString()) for f in docs.schema.fields
    )
    out_schema = ", ".join(
        ["asset_id string", "payload binary"]
        + [f"{c} {in_schema[c]}" for c in keep]
    )

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            out = pd.DataFrame(
                {
                    "asset_id": ids.astype("string"),
                    "payload": [
                        synth_container(int(i) % n_cls, int(i)) for i in ids
                    ],
                }
            )
            for c in keep:
                out[c] = pdf[c].reset_index(drop=True)
            yield out

    return docs.select(id_col, *keep).mapInPandas(batch_fn, out_schema)


def content_address(
    assets: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Content-address binary assets: (id, n_bytes, sha256). This is step 1
    of multimodal dedup — raw-bytes-identical images/audio collapse to one
    sha regardless of filename/metadata. Pure JVM expressions over the
    binary column (no decode, no UDF), so it runs at scan throughput."""
    return assets.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        F.lower(F.sha2(F.col(payload_col), 256)).alias("sha256"),
    )


def exact_binary_duplicates(
    assets: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Exact binary dedup decision: one row per duplicated payload —
    (sha256, n_bytes, n_assets, keep_id) with keep_id = min asset id (the
    canonical copy; the caller drops the rest). Same hash-groupBy shape as
    text exact dedup; the shuffle key is the 32-byte digest, never the
    payload bytes."""
    return (
        content_address(assets, id_col, payload_col)
        .groupBy("sha256", "n_bytes")
        .agg(
            F.count("*").cast("bigint").alias("n_assets"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_assets") > 1)
    )


# -- perceptual-hash image near-dup (r12) -------------------------------------
# The CV half of near-dup curation: images that are visually identical but
# byte-different (re-encodes, resizes, metadata strips) collapse under a
# 63-bit DCT perceptual hash. Pipeline: REAL pixel decode -> integer
# Rec.601 grayscale -> area-mean pool to 32x32 -> orthonormal 2-D DCT ->
# mean-threshold the 8x8 low-frequency block (DC excluded) -> 63-bit
# signature in 4 bands -> banded equi-join candidates (pigeonhole: hamming
# <= 3 implies one band equal) -> bit_count verify in pure codegen. The
# expensive part (decode+DCT) is map-only Arrow work; the join shuffles
# 16-bit band keys, never pixels. Mean-threshold (not median) is the
# published pHash variant whose bit pattern is analytically determined by
# the coefficient signs — which is what makes the fixture's oracle
# possible (see synthetic_phash_assets).

PHASH_BITS = 63            # 8x8 low-frequency block minus DC
PHASH_AMP = 20.0           # fixture coefficient amplitude (see margin note)
N_PHASH_BANDS = 4          # 16+16+16+15 bits
MAX_PHASH_HAMMING = 3      # bands-1: banding guarantees recall at <= 3


_DCT32_CACHE = None


def _dct32_basis():
    # cached: the hash stage calls this per image and the Python cos loop
    # would otherwise dominate the whole mapInPandas batch
    global _DCT32_CACHE
    if _DCT32_CACHE is None:
        import numpy as np

        b = np.zeros((32, 32))
        for u in range(32):
            cu = np.sqrt(1.0 / 32.0) if u == 0 else np.sqrt(2.0 / 32.0)
            for x in range(32):
                b[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 64.0)
        _DCT32_CACHE = b
    return _DCT32_CACHE


def phash63(img) -> list:
    """63-bit perceptual hash of a decoded (h, w[, ch]) uint8 image as a
    list of N_PHASH_BANDS ints (16/16/16/15 bits, LSB-first within each
    band). Grayscale via integer Rec.601; pooling is exact area-mean over
    a 32x32 grid (np.add.reduceat on both axes, so any size >= 32 works);
    threshold is the mean of the 63 non-DC low-band coefficients."""
    import numpy as np

    a = np.asarray(img, dtype=np.int64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            g = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
        else:
            g = a[..., 0]
    else:
        g = a
    h, w = g.shape
    if h < 32 or w < 32:
        raise ValueError(f"image too small for phash ({h}x{w})")
    gf = g.astype(np.float64)
    ye = (np.arange(32) * h) // 32
    xe = (np.arange(32) * w) // 32
    pooled = np.add.reduceat(np.add.reduceat(gf, ye, axis=0), xe, axis=1)
    ylen = np.diff(np.append(ye, h)).astype(np.float64)
    xlen = np.diff(np.append(xe, w)).astype(np.float64)
    pooled /= ylen[:, None] * xlen[None, :]
    basis = _dct32_basis()
    coef = basis @ pooled @ basis.T
    vals = coef[:8, :8].flatten()[1:]  # raster order, DC excluded
    bits = vals > vals.mean()
    bands = []
    for b in range(N_PHASH_BANDS):
        v = 0
        for jb in range(16):
            j = 16 * b + jb
            if j < PHASH_BITS and bits[j]:
                v |= 1 << jb
        bands.append(v)
    return bands


def image_phash_bands(assets: DataFrame, id_col: str = "asset_id",
                      payload_col: str = "payload") -> DataFrame:
    """(asset_id, b0..b3, err): decode + hash stage, Arrow-batched and
    per-row isolated (undecodable assets carry err and null bands — they
    simply never join)."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    bands = phash63(
                        decode_pixels(bytes(payload) if payload is not None else b"")
                    )
                    rows.append((str(aid), *bands, None))
                except (ValueError, NotImplementedError) as exc:
                    rows.append((str(aid), None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows, columns=["asset_id", "b0", "b1", "b2", "b3", "err"]
            )

    return assets.select(id_col, payload_col).mapInPandas(
        batch_fn,
        "asset_id string, b0 int, b1 int, b2 int, b3 int, err string",
    )


def phash_near_dup(bands: DataFrame, max_hamming: int = MAX_PHASH_HAMMING,
                   max_bucket: int = 100_000) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with signature hamming <= max_hamming,
    ids compared numerically. Same banded shape as simhash_band_pairs: 4
    per-band equi-joins within bucket-capped 16-bit band values — never an
    all-pairs comparison; verify is bit_count codegen over the band ints."""
    from ..functions.dedup import capped_buckets

    all_bands = [f"b{b}" for b in range(N_PHASH_BANDS)]
    sigs = (
        bands.where(F.col("err").isNull())
        .select(F.col("asset_id").cast("bigint").alias("doc_id"), *all_bands)
        # one decode+hash pass feeds all 4 band joins: without this the
        # expensive Python stage re-executes per join (the simhash lesson,
        # dedup.py:699 — and at 100 TB you persist the 20-byte signatures,
        # never the pixels)
        .localCheckpoint(eager=True)
    )
    # candidate pairs stay NARROW — (doc_a, doc_b) only — through the
    # band joins, the union and the dedup; signatures re-join ONCE for
    # the verify. The previous shape dragged all 8 signature columns
    # through every band join and a WIDE distinct: at sf10 (500k sigs,
    # ~15M candidate pairs — the documented N^2/2^16-per-band LSH mass)
    # that distinct was the dominant shuffle, measured 123 s vs 44 s for
    # this shape on the identical fixture (f10_100 28 -> ~10).
    cands = None
    for b in range(N_PHASH_BANDS):
        col = f"b{b}"
        banded, _dropped = capped_buckets(sigs, max_bucket, keys=(col,))
        a = banded.select(F.col(col).alias("_bv"),
                          F.col("doc_id").alias("doc_a"))
        c = banded.select(F.col(col).alias("_bv"),
                          F.col("doc_id").alias("doc_b"))
        p = (
            a.join(c, "_bv")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        cands = p if cands is None else cands.unionByName(p)
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(n).alias(f"a_{n}") for n in all_bands])
    sc = sigs.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(n).alias(f"c_{n}") for n in all_bands])
    hamming = None
    for n in all_bands:
        h = F.bit_count(F.col(f"a_{n}").bitwiseXOR(F.col(f"c_{n}")))
        hamming = h if hamming is None else hamming + h
    return (
        cands.distinct()
        .join(sa, "doc_a")
        .join(sc, "doc_b")
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- deterministic phash-image synthesis (the image_near_dup fixture) -------
# Each doc's 63-bit signature is CHOSEN from md5(str(base_id)) (bit j =
# bit (j%4) of hex nibble (j//4)), then an image is CONSTRUCTED whose
# phash equals it: the 32x32 IDCT of the 8x8 coefficient grid holding
# +-PHASH_AMP per chosen bit (DC carries the 128 gray mean), pixel-
# replicated to 64x64 and BMP-encoded. Mean-pooling 2x inverts the
# replication exactly; the DCT recovers the coefficients up to uint8
# rounding noise (|eps| << amplitude, verified by a margin test), and the
# mean threshold sits strictly between +A and -A whenever the bit count
# is in [1, 62] — so phash63(decode(synth)) == the md5 pattern, which a
# SQL twin can recompute. Docs with id % 10 == 1 reuse id-1's pattern
# with <= 2 deterministic bit flips: the PLANTED near-dup pairs.

def phash_fixture_bits(doc_id: int) -> list:
    """The 63 signature bits the fixture plants for doc_id."""
    import hashlib

    base = doc_id - 1 if doc_id % 10 == 1 else doc_id
    hx = hashlib.md5(str(base).encode()).hexdigest()
    bits = [(int(hx[j // 4], 16) >> (j % 4)) & 1 for j in range(PHASH_BITS)]
    if doc_id % 10 == 1:
        # XOR semantics (not set): if the two positions coincide the flips
        # cancel — exactly what the SQL twin's per-bit XOR computes
        bits[(doc_id * 7) % PHASH_BITS] ^= 1
        bits[(doc_id * 13) % PHASH_BITS] ^= 1
    return bits


def _phash_fixture_image(bits) -> "object":
    import numpy as np

    coef = np.zeros((32, 32))
    coef[0, 0] = 128.0 * 32.0  # orthonormal DC of a 128-mean 32x32 image
    for j, bit in enumerate(bits):
        u, v = divmod(j + 1, 8)
        coef[u, v] = PHASH_AMP if bit else -PHASH_AMP
    basis = _dct32_basis()
    img = basis.T @ coef @ basis
    out = np.rint(img)
    if out.min() < 0 or out.max() > 255:
        raise ValueError("phash fixture image clipped — amplitude too high")
    return out.astype(np.uint8)


def _bmp_gray64(img32) -> bytes:
    """2x pixel-replicate a 32x32 gray image and encode as a 24-bit BMP
    (bottom-up rows; 64*3 bytes/row is already 4-aligned)."""
    import struct as _struct

    import numpy as np

    g = np.repeat(np.repeat(np.asarray(img32, np.uint8), 2, 0), 2, 1)
    # bottom-up rows, 3 identical channels per pixel — one vectorized copy
    rows = np.repeat(g[::-1].reshape(64, 64, 1), 3, axis=2).tobytes()
    info = _struct.pack("<IiiHHIIiiII", 40, 64, 64, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return b"BM" + _struct.pack("<IHHI", 54 + len(rows), 0, 0, 54) + info + rows


def synthetic_phash_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(asset_id, payload): the deterministic perceptual-hash image corpus
    keyed off the documents table."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids.astype("string"),
                    "payload": [
                        _bmp_gray64(
                            _phash_fixture_image(phash_fixture_bits(int(i)))
                        )
                        for i in ids
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(
        batch_fn, "asset_id string, payload binary"
    )

"""Arithmetic-coded JPEG entropy decode (ITU-T T.81 Annexes D/F) — the QM
binary arithmetic decoder plus the DC/AC statistical models, closing the
last documented codec boundary (SOF9 sequential, SOFA progressive).

Everything here is transcribed from the PUBLIC spec's flowcharts:

- The QM decoder follows Annex D.2 (DECODE with conditional MPS/LPS
  exchange, RENORMD, byte-in with zero-feed past the data end). In T.81's
  QM coder the MPS subinterval sits at the BOTTOM of the interval and the
  LPS on top — note this is the OPPOSITE placement of the MQ descendant in
  JPEG 2000, an easy transcription trap. Registers: A starts 0x10000 (the
  encoder's CT starts 11 and bytes leave at C>>19), so the decoder's
  C-high window is the first SIXTEEN code bits — init loads two bytes and
  aligns with one 8-bit shift.
- The probability state machine is Table D.3 (113 adaptive states + the
  non-adaptive ~0.5 "fixed" bin used for AC sign and refinement bits).
- DC decisions per F.2.4.1 (zero/sign/magnitude-category decision tree
  conditioned on the PREVIOUS diff's classification against the L/U
  conditioning bounds); AC per F.2.4.2 (per-index EOB/zero/magnitude
  contexts with the Kx low/high-spectrum split); progressive refinement
  per G.2 (correction bits, newly-nonzero ±1<<Al with fixed-bin sign).

Verification boundary (stated honestly): this environment has no codec
library and no network, so there is no third-party arithmetic JPEG to
cross-decode. The pins are (a) an INDEPENDENT test-side encoder written
from the ENCODER flowcharts (D.1: CODELPS/CODEMPS/BYTEOUT/FLUSH) whose
output must decode to pixels EXACTLY equal to the huffman encoding of the
same coefficients, (b) property sweeps including trailing-zero-byte
discard (what real encoders emit) and a compression-ratio-vs-entropy
bound that a mistranscribed Qe table cannot pass, and (c) restart/DAC
conditioning/12-bit variants. Reference parity note: the reference engine
(kausaldb) has no image codecs at all — this module serves the
training-data pipeline's decode stage, where decode_coverage measures the
boundary share per corpus.

Scale: pure-Python bit loop — a correctness boundary closure for the
mapInPandas decode stage (embarrassingly parallel, per-row isolated), not
a throughput path; arithmetic JPEG is rare in real web corpora (historic
patent encumbrance kept encoders out of libjpeg defaults).
"""

from __future__ import annotations

# Table D.3: (Qe, NextIndexLPS, NextIndexMPS, SwitchMPS) for the 113
# adaptive states; index 113 is the non-adaptive "fixed" ~0.5 bin (used
# for AC sign and refinement decisions — NMPS=NLPS=113, no switch).
_QM_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]

_QM_QE = [t[0] for t in _QM_TABLE]
_QM_NLPS = [t[1] for t in _QM_TABLE]
_QM_NMPS = [t[2] for t in _QM_TABLE]
_QM_SW = [t[3] for t in _QM_TABLE]

FIXED_BIN_INDEX = 113

# statistics-area sizes (generous per-table bins, F.2.4 layouts):
# DC: 5 conditioning groups of 4 (S0/SS/SP/SN) at 0..19, X2..X15 at
# 20..33, magnitude bits at X+14 (34..48).
DC_STAT_BINS = 64
# AC: (SE, S0, X1) interleaved 3-per-k at 0..188, X3.. at 189 (k<=Kx) /
# 217 (k>Kx), magnitude bits at X+14 (up to 243).
AC_STAT_BINS = 256


class QmDecoder:
    """T.81 Annex D.2 QM arithmetic decoder over an UNSTUFFED entropy
    chunk (the caller removed FF00 stuffing and split at RSTn markers,
    exactly like the huffman path); reads zeros past the end per the
    spec's decode-past-marker convention. Statistics are caller-owned
    bytearrays of packed states: ``index | (mps << 7)``."""

    __slots__ = ("buf", "bp", "c", "a", "ct")

    def __init__(self, buf):
        self.buf = buf
        self.bp = 0
        # INITDEC: C-high = first 16 code bits; A at the encoder's 0x10000
        # starting scale. (JPEG2000's MQ aligns with a 7-bit shift against
        # A=0x8000 instead — the one-bit scale difference between the two
        # specs' register conventions.)
        self.c = self._byte() << 16
        self.c |= self._byte() << 8
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct = 0
        self.a = 0x10000

    def _byte(self) -> int:
        if self.bp >= len(self.buf):
            return 0
        b = self.buf[self.bp]
        self.bp += 1
        return b

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QM_QE[idx]
        a = self.a - qe
        if (self.c >> 16) < a:
            if a >= 0x8000:
                self.a = a
                return mps
            # renorm path: conditional exchange against the LPS width
            if a < qe:
                d = 1 - mps
                st[i] = ((mps ^ _QM_SW[idx]) << 7) | _QM_NLPS[idx]
            else:
                d = mps
                st[i] = (mps << 7) | _QM_NMPS[idx]
        else:
            self.c = (self.c - (a << 16)) & 0xFFFFFFFF
            if a < qe:
                d = mps
                st[i] = (mps << 7) | _QM_NMPS[idx]
            else:
                d = 1 - mps
                st[i] = ((mps ^ _QM_SW[idx]) << 7) | _QM_NLPS[idx]
            a = qe
        # RENORMD
        c, ct = self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c |= self._byte() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a, self.c, self.ct = a, c, ct
        return d


def new_dc_stats() -> bytearray:
    return bytearray(DC_STAT_BINS)


def new_ac_stats() -> bytearray:
    return bytearray(AC_STAT_BINS)


def new_fixed_bin() -> bytearray:
    return bytearray([FIXED_BIN_INDEX])


def decode_dc_diff(dec: QmDecoder, st: bytearray, ctx: int, lo: int,
                   up: int) -> tuple:
    """One DC difference per F.2.4.1: returns (diff, next_context).
    ``ctx`` is this component's conditioning category from its PREVIOUS
    block (0 zero / 4|8 small ± / 12|16 large ±); ``lo``/``up`` are the
    DAC L/U conditioning bounds (defaults 0/1)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = 0
    i = ctx + 2 + sign  # SP (positive) / SN (negative) doubles as X1
    if dec.decode(st, i):
        m = 1
        i = 20  # X2; X3.. follow consecutively
        while dec.decode(st, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("JPEG arithmetic DC magnitude overflow")
            i += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    v = m
    i += 14  # magnitude-bit context for this category
    m >>= 1
    while m:
        if dec.decode(st, i):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nctx


def decode_ac_band(dec: QmDecoder, st: bytearray, kx: int, coef, ss: int,
                   se: int, al: int, fixed: bytearray) -> None:
    """AC coefficients for one data unit per F.2.4.2 — sequential
    (ss=1, se=63, al=0) and progressive-first (G.2) share this flow.
    ``coef`` is the 64-slot ZIGZAG-ordered accumulator; ``kx`` the DAC
    low/high-spectrum conditioning split (default 5)."""
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            break  # EOB
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > se:
                raise ValueError("JPEG arithmetic AC run past band end")
        sign = dec.decode(fixed, 0)
        i = base + 2
        m = 0
        if dec.decode(st, i):
            m = 1
            if dec.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "JPEG arithmetic AC magnitude overflow"
                        )
                    i += 1
        v = m
        i += 14
        m >>= 1
        while m:
            if dec.decode(st, i):
                v |= m
            m >>= 1
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1


def decode_ac_refine(dec: QmDecoder, st: bytearray, coef, ss: int, se: int,
                     al: int, fixed: bytearray) -> None:
    """Progressive AC refinement per G.2: correction bit (context SE'+2)
    for every previously-nonzero coefficient, newly-nonzero arrive as
    ±1<<Al with fixed-bin sign; past the previous stage's end-of-block
    index an EOB decision gates each position."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex >= ss:
        if coef[kex]:
            break
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, base):
                break  # EOB: the rest of the band stays zero
        while True:
            if coef[k]:
                if dec.decode(st, base + 2):
                    coef[k] += p1 if coef[k] > 0 else m1
                break
            if dec.decode(st, base + 1):
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            base += 3
            if k > se:
                raise ValueError("JPEG arithmetic AC refinement past band")
        k += 1


def parse_dac(seg: bytes, dc_cond: dict, ac_cond: dict) -> None:
    """DAC segment (B.2.4.3): pairs of (Tc<<4 | Tb, Cs). Tc=0: DC
    conditioning Cs = (U<<4)|L with 0 <= L <= U <= 15; Tc=1: AC Kx in
    1..63. Mutates the conditioning dicts (DAC between scans re-points
    subsequent scans, like mid-file DHT)."""
    i = 0
    while i + 2 <= len(seg):
        tc, tb = seg[i] >> 4, seg[i] & 15
        cs = seg[i + 1]
        i += 2
        if tb > 3:
            raise ValueError(f"JPEG DAC table id {tb}")
        if tc == 0:
            lo, up = cs & 15, cs >> 4
            if lo > up:
                raise ValueError(f"JPEG DAC DC conditioning L={lo} > U={up}")
            dc_cond[tb] = (lo, up)
        elif tc == 1:
            if not 1 <= cs <= 63:
                raise ValueError(f"JPEG DAC AC Kx {cs}")
            ac_cond[tb] = cs
        else:
            raise ValueError(f"JPEG DAC class {tc}")

"""EXIF metadata extraction: a real TIFF/IFD walk over JPEG APP1 segments
(EXIF 2.3 / TIFF 6.0, public specs) — the provenance signal an image
curation pipeline filters and attributes by (camera, timestamp,
orientation, GPS) without ever decoding pixels.

Layering mirrors the other modality probes (`multimodal.py`):

- ``parse_exif`` — JPEG marker walk to APP1 ``Exif\\0\\0``, then the TIFF
  structure: byte-order mark (II little / MM big — BOTH are common in the
  wild), IFD0 entries (tag, type, count, inline-or-offset value), the
  Exif sub-IFD (0x8769) and GPS sub-IFD (0x8825) pointers. Value types
  BYTE/ASCII/SHORT/LONG/RATIONAL decode for real; ASCII strips the NUL
  terminator; RATIONAL stays exact-integer.
- GPS coordinates reduce to signed MICRO-DEGREES as one BIGINT
  (deg + min/60 + sec/3600, computed in integer arithmetic over the
  rational numerators/denominators) — float degrees would diverge
  between oracle engines.
- ``exif_stats`` — the map-only Arrow stage, per-row isolated: a corrupt
  EXIF block yields one err row; a JPEG WITHOUT an APP1 EXIF segment is
  has_exif=false, not an error (absence is the common case and must be
  cheap).
- ``EXIF_CLASSES`` / ``synth_exif_jpeg`` / ``synthetic_exif_assets`` —
  the deterministic fixture corpus keyed off doc_id: the DuckDB twin
  predicts every field from the id's closed forms while the Spark side
  walks REAL APP1/TIFF bytes in both byte orders, with both inline and
  offset-addressed values — an endianness or offset-arithmetic bug
  breaks the hash.

Scale: header-only map work; payload bytes never shuffle. Boundary
honesty: only the tags a curation pipeline uses are surfaced (make,
model, orientation, original timestamp, pixel dims, GPS); MakerNote and
thumbnail IFDs are skipped whole.

Reference parity note: the reference engine has no image support; this
serves the training-data pipeline's multimodal surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# tag numbers (EXIF 2.3 §4.6)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _find_app1_exif(data: bytes) -> bytes | None:
    """The APP1 EXIF payload (TIFF bytes) from a JPEG marker walk, or
    None when absent."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS/EOI: no APP1 will follow
            return None
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        if marker == 0xE1 and data[i + 4:i + 10] == b"Exif\x00\x00":
            return data[i + 10:i + 2 + ln]
        i += 2 + ln
    return None


def _read_ifd(tiff: bytes, off: int, bo: str) -> dict[int, tuple]:
    """One IFD: {tag: (type, count, raw_value_bytes)}; raises ValueError
    on truncation (per-row isolated by the stage)."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset past end")
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    entries = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            raise ValueError("EXIF IFD entry truncated")
        tag, typ, count = struct.unpack_from(bo + "HHI", tiff, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = tiff[base + 8:base + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, base + 8)
            if voff + size > len(tiff):
                raise ValueError("EXIF value offset past end")
            raw = tiff[voff:voff + size]
        entries[tag] = (typ, count, raw)
    return entries


def _ascii(v: tuple | None) -> str | None:
    if v is None or v[0] != 2:
        return None
    return v[2].split(b"\x00", 1)[0].decode("latin-1")


def _short_or_long(v: tuple | None, bo: str) -> int | None:
    if v is None:
        return None
    typ, _count, raw = v
    if typ == 3 and len(raw) >= 2:
        return struct.unpack_from(bo + "H", raw)[0]
    if typ == 4 and len(raw) >= 4:
        return struct.unpack_from(bo + "I", raw)[0]
    return None


def _rationals(v: tuple | None, bo: str) -> list[tuple[int, int]] | None:
    if v is None or v[0] != 5:
        return None
    out = []
    for i in range(v[1]):
        num, den = struct.unpack_from(bo + "II", v[2], 8 * i)
        out.append((num, den))
    return out


def _gps_udeg(rats, ref: str | None) -> int | None:
    """deg/min/sec rationals -> signed integer micro-degrees: exact
    integer arithmetic (udeg = round of (d + m/60 + s/3600) * 1e6 done
    over a common denominator) so both oracle engines agree bit-for-bit."""
    if not rats or len(rats) != 3:
        return None
    (dn, dd), (mn, md), (sn, sd) = rats
    if 0 in (dd, md, sd):
        return None
    num = dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    den = dd * md * sd * 3600
    udeg = (num * 1_000_000 + den // 2) // den
    return -udeg if ref in ("S", "W") else udeg


def parse_exif(data: bytes) -> dict:
    """Curation-relevant EXIF fields from JPEG bytes; has_exif=False when
    the APP1 segment is absent. Raises ValueError on corrupt structures
    (bad TIFF byte order, offsets past end, truncated IFDs)."""
    app1 = _find_app1_exif(data)
    out = {
        "has_exif": False, "make": None, "model": None, "orientation": None,
        "dt_original": None, "width": None, "height": None,
        "gps_lat_udeg": None, "gps_lon_udeg": None,
    }
    if app1 is None:
        return out
    if app1[:2] == b"II":
        bo = "<"
    elif app1[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark in EXIF")
    (magic,) = struct.unpack_from(bo + "H", app1, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic in EXIF")
    (ifd0_off,) = struct.unpack_from(bo + "I", app1, 4)
    ifd0 = _read_ifd(app1, ifd0_off, bo)
    out["has_exif"] = True
    out["make"] = _ascii(ifd0.get(_TAG_MAKE))
    out["model"] = _ascii(ifd0.get(_TAG_MODEL))
    out["orientation"] = _short_or_long(ifd0.get(_TAG_ORIENTATION), bo)
    exif_off = _short_or_long(ifd0.get(_TAG_EXIF_IFD), bo)
    if exif_off is not None:
        sub = _read_ifd(app1, exif_off, bo)
        out["dt_original"] = _ascii(sub.get(_TAG_DT_ORIGINAL))
        out["width"] = _short_or_long(sub.get(_TAG_PIXEL_X), bo)
        out["height"] = _short_or_long(sub.get(_TAG_PIXEL_Y), bo)
    gps_off = _short_or_long(ifd0.get(_TAG_GPS_IFD), bo)
    if gps_off is not None:
        gps = _read_ifd(app1, gps_off, bo)
        lat_ref = _ascii(gps.get(_GPS_LAT_REF))
        lon_ref = _ascii(gps.get(_GPS_LON_REF))
        out["gps_lat_udeg"] = _gps_udeg(
            _rationals(gps.get(_GPS_LAT), bo), lat_ref)
        out["gps_lon_udeg"] = _gps_udeg(
            _rationals(gps.get(_GPS_LON), bo), lon_ref)
    return out


def exif_stats(assets: DataFrame, id_col: str = "asset_id",
               payload_col: str = "payload") -> DataFrame:
    """(asset_id, has_exif, make, model, orientation, dt_original, width,
    height, gps_lat_udeg, gps_lon_udeg, err): map-only Arrow stage,
    per-row isolated."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                aid = str(aid)
                try:
                    r = parse_exif(
                        bytes(payload) if payload is not None else b"")
                    rows.append((aid, r["has_exif"], r["make"], r["model"],
                                 r["orientation"], r["dt_original"],
                                 r["width"], r["height"],
                                 r["gps_lat_udeg"], r["gps_lon_udeg"], None))
                except (ValueError, struct.error) as exc:
                    # has_exif stays non-null (False = no USABLE exif):
                    # a nullable boolean stringifies differently across
                    # engines in the driver compare, and "corrupt" is
                    # already carried by err
                    rows.append((aid, False, None, None, None, None, None,
                                 None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "has_exif", "make", "model",
                         "orientation", "dt_original", "width", "height",
                         "gps_lat_udeg", "gps_lon_udeg", "err"],
            )

    return assets.select(id_col, payload_col).mapInPandas(
        batch_fn,
        "asset_id string, has_exif boolean, make string, model string, "
        "orientation int, dt_original string, width bigint, height bigint, "
        "gps_lat_udeg bigint, gps_lon_udeg bigint, err string",
    )


# --- deterministic fixture (the exif_stats oracle) ---------------------------

EXIF_CLASSES = [
    "none",        # JPEG without APP1: has_exif=false
    "ii-basic",    # little-endian IFD0 (make/model/orientation)
    "mm-exif",     # big-endian + Exif sub-IFD (datetime/dims)
    "ii-gps",      # little-endian + GPS sub-IFD (rational micro-degrees)
    "corrupt",     # value offset past end: one err row
]


def _ifd_bytes(entries: list[tuple[int, int, bytes]], bo: str,
               ifd_off: int) -> bytes:
    """Serialize one IFD placing >4-byte values in a tail area after the
    entry table (offsets relative to the TIFF start = ifd_off-relative
    plus ifd_off)."""
    n = len(entries)
    tail_off = ifd_off + 2 + 12 * n + 4
    table = struct.pack(bo + "H", n)
    tail = b""
    for tag, typ, raw in entries:
        count = {2: len(raw), 5: len(raw) // 8}.get(typ, 1)
        if typ == 3:
            count = len(raw) // 2
        head = struct.pack(bo + "HHI", tag, typ, count)
        if len(raw) <= 4:
            table += head + raw.ljust(4, b"\x00")
        else:
            table += head + struct.pack(bo + "I", tail_off + len(tail))
            tail += raw
    return table + struct.pack(bo + "I", 0) + tail


def synth_exif_jpeg(cls: int, doc_id: int) -> bytes:
    """A minimal structurally-real JPEG whose APP1 EXIF encodes closed
    forms of doc_id (class-dependent; see EXIF_CLASSES)."""
    k = cls % len(EXIF_CLASSES)
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0]))
    if k == 0:
        return b"\xff\xd8" + sof + b"\xff\xd9"
    if k == 1:
        bo, pre = "<", b"II"
        entries = [
            (_TAG_MAKE, 2, f"maker{doc_id % 7}\x00".encode()),
            (_TAG_MODEL, 2, f"model{doc_id % 13}\x00".encode()),
            (_TAG_ORIENTATION, 3,
             struct.pack(bo + "H", 1 + doc_id % 8)),
        ]
        tiff = pre + struct.pack(bo + "HI", 42, 8) + _ifd_bytes(
            entries, bo, 8)
    elif k == 2:
        bo, pre = ">", b"MM"
        # IFD0 with the Exif pointer; sub-IFD follows IFD0's tail
        dt = (f"20{10 + doc_id % 15:02d}:{1 + doc_id % 12:02d}:"
              f"{1 + doc_id % 28:02d} 12:00:00\x00")
        ifd0_entries = [
            (_TAG_MAKE, 2, f"cam{doc_id % 5}\x00".encode()),
            (_TAG_EXIF_IFD, 4, struct.pack(bo + "I", 0)),  # patched below
        ]
        ifd0 = _ifd_bytes(ifd0_entries, bo, 8)
        sub_off = 8 + len(ifd0)
        sub = _ifd_bytes(
            [
                (_TAG_DT_ORIGINAL, 2, dt.encode()),
                (_TAG_PIXEL_X, 4,
                 struct.pack(bo + "I", 16 * (1 + doc_id % 100))),
                (_TAG_PIXEL_Y, 4,
                 struct.pack(bo + "I", 16 * (1 + doc_id % 80))),
            ],
            bo, sub_off,
        )
        ifd0 = _ifd_bytes(
            [
                (_TAG_MAKE, 2, f"cam{doc_id % 5}\x00".encode()),
                (_TAG_EXIF_IFD, 4, struct.pack(bo + "I", sub_off)),
            ],
            bo, 8,
        )
        tiff = pre + struct.pack(bo + "HI", 42, 8) + ifd0 + sub
    elif k == 3:
        bo, pre = "<", b"II"
        lat_d, lat_m, lat_s = doc_id % 90, doc_id % 60, (doc_id * 7) % 60
        lon_d, lon_m, lon_s = doc_id % 180, (doc_id * 3) % 60, \
            (doc_id * 11) % 60
        lat = struct.pack(bo + "IIIIII", lat_d, 1, lat_m, 1, lat_s * 100, 100)
        lon = struct.pack(bo + "IIIIII", lon_d, 1, lon_m, 1, lon_s * 100, 100)
        ns = b"S\x00" if doc_id % 2 else b"N\x00"
        ew = b"W\x00" if doc_id % 3 == 0 else b"E\x00"
        ifd0 = _ifd_bytes(
            [(_TAG_GPS_IFD, 4, struct.pack(bo + "I", 0))], bo, 8)
        gps_off = 8 + len(ifd0)
        gps = _ifd_bytes(
            [
                (_GPS_LAT_REF, 2, ns),
                (_GPS_LAT, 5, lat),
                (_GPS_LON_REF, 2, ew),
                (_GPS_LON, 5, lon),
            ],
            bo, gps_off,
        )
        ifd0 = _ifd_bytes(
            [(_TAG_GPS_IFD, 4, struct.pack(bo + "I", gps_off))], bo, 8)
        tiff = pre + struct.pack(bo + "HI", 42, 8) + ifd0 + gps
    else:  # corrupt: IFD0 offset points past the end
        bo, pre = "<", b"II"
        tiff = pre + struct.pack(bo + "HI", 42, 0xFFFF)
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
    return b"\xff\xd8" + seg + sof + b"\xff\xd9"


def synthetic_exif_assets(docs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """(asset_id, payload) keyed off the documents table, class =
    doc_id % len(EXIF_CLASSES)."""
    n_cls = len(EXIF_CLASSES)

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids.astype("string"),
                    "payload": [
                        synth_exif_jpeg(int(i) % n_cls, int(i)) for i in ids
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(
        batch_fn, "asset_id string, payload binary"
    )

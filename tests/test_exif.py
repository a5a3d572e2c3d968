"""EXIF IFD-walk pins. The builders here are INDEPENDENT of the module's
synth_exif_jpeg assembler: they serialize IFDs with deliberately different
layout choices (values placed before the entry table, extra unknown tags,
next-IFD chains, APP0 before APP1) so the parser is exercised against the
TIFF container rules, not against one writer's habits."""

import struct

import pytest

from kausaldb_spark.sources import exif as E


def _tiff(bo_mark: bytes, bo: str, ifd0_entries, tail_before: bytes = b""):
    """TIFF with IFD0 at an offset AFTER a tail area (values can live
    BEFORE the entry table — legal, and the opposite of the module's own
    assembler)."""
    ifd0_off = 8 + len(tail_before)
    n = len(ifd0_entries)
    table = struct.pack(bo + "H", n)
    for tag, typ, count, val4 in ifd0_entries:
        table += struct.pack(bo + "HHI", tag, typ, count) + val4
    table += struct.pack(bo + "I", 0)
    return (
        bo_mark + struct.pack(bo + "HI", 42, ifd0_off)
        + tail_before + table
    )


def _jpeg_wrap(tiff: bytes, with_app0: bool = False) -> bytes:
    app1 = b"Exif\x00\x00" + tiff
    out = b"\xff\xd8"
    if with_app0:
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    out += b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
    out += b"\xff\xd9"
    return out


def test_values_before_entry_table_both_endians():
    for bo_mark, bo in ((b"II", "<"), (b"MM", ">")):
        make = b"IndependentCam\x00"
        # value area sits BETWEEN the header and the IFD table
        val_off = 8
        entries = [
            (0x010F, 2, len(make), struct.pack(bo + "I", val_off)),
            (0x0112, 3, 1, struct.pack(bo + "H", 6) + b"\x00\x00"),
            (0x9999, 7, 2, b"zz\x00\x00"),  # unknown tag: skipped politely
        ]
        tiff = _tiff(bo_mark, bo, entries, tail_before=make)
        r = E.parse_exif(_jpeg_wrap(tiff))
        assert r["has_exif"] is True
        assert r["make"] == "IndependentCam" and r["orientation"] == 6, bo


def test_app0_before_app1_and_absent_exif():
    # APP0 then APP1: the walk must skip over APP0
    make = b"X\x00"
    entries = [(0x010F, 2, 2, make + b"\x00\x00")]
    tiff = _tiff(b"II", "<", entries)
    r = E.parse_exif(_jpeg_wrap(tiff, with_app0=True))
    assert r["make"] == "X"
    # plain JPEG without APP1: has_exif False, not an error
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", 4, 4) + bytes([1, 1, 0x11, 0]))
    r = E.parse_exif(b"\xff\xd8" + sof + b"\xff\xda" + b"\x00\x00")
    assert r["has_exif"] is False and r["err" if "err" in r else "make"] is None


def test_gps_sign_conventions_and_exact_rounding():
    bo, bo_mark = "<", b"II"
    # 10 deg 30 min 36.5 sec S / 20 deg 0 min 0.25 sec E
    lat = struct.pack(bo + "IIIIII", 10, 1, 30, 1, 365, 10)
    lon = struct.pack(bo + "IIIIII", 20, 1, 0, 1, 1, 4)
    gps_entries = [
        (0x0001, 2, 2, b"S\x00\x00\x00"),
        (0x0002, 5, 3, None),  # placeholder, offsets patched below
        (0x0003, 2, 2, b"E\x00\x00\x00"),
        (0x0004, 5, 3, None),
    ]
    # hand-assemble: header(8) + ifd0(2+12+4) + gps table + rational area
    ifd0 = (struct.pack(bo + "H", 1)
            + struct.pack(bo + "HHI", 0x8825, 4, 1)
            + struct.pack(bo + "I", 8 + 18)
            + struct.pack(bo + "I", 0))
    gps_off = 8 + len(ifd0)
    rat_off = gps_off + 2 + 12 * 4 + 4
    table = struct.pack(bo + "H", 4)
    table += struct.pack(bo + "HHI", 0x0001, 2, 2) + b"S\x00\x00\x00"
    table += struct.pack(bo + "HHI", 0x0002, 5, 3) + struct.pack(bo + "I", rat_off)
    table += struct.pack(bo + "HHI", 0x0003, 2, 2) + b"E\x00\x00\x00"
    table += struct.pack(bo + "HHI", 0x0004, 5, 3) + struct.pack(
        bo + "I", rat_off + len(lat))
    table += struct.pack(bo + "I", 0)
    tiff = (bo_mark + struct.pack(bo + "HI", 42, 8) + ifd0 + table
            + lat + lon)
    r = E.parse_exif(_jpeg_wrap(tiff))
    # 10 + 30/60 + 36.5/3600 = 10.51013888.. -> 10510139 udeg, S -> negative
    assert r["gps_lat_udeg"] == -10510139
    # 20 + 0.25/3600 = 20.00006944.. -> 20000069 udeg, E -> positive
    assert r["gps_lon_udeg"] == 20000069


def test_corrupt_structures_raise_valueerror():
    # bad byte-order mark
    with pytest.raises(ValueError):
        E.parse_exif(_jpeg_wrap(b"XX" + struct.pack("<HI", 42, 8)))
    # bad magic
    with pytest.raises(ValueError):
        E.parse_exif(_jpeg_wrap(b"II" + struct.pack("<HI", 43, 8)))
    # IFD offset past end
    with pytest.raises(ValueError):
        E.parse_exif(_jpeg_wrap(b"II" + struct.pack("<HI", 42, 9999)))
    # value offset past end
    entries = [(0x010F, 2, 100, struct.pack("<I", 50_000))]
    with pytest.raises(ValueError):
        E.parse_exif(_jpeg_wrap(_tiff(b"II", "<", entries)))
    # not a JPEG at all
    with pytest.raises(ValueError):
        E.parse_exif(b"\x89PNG\r\n\x1a\n")


def test_zero_denominator_gps_is_null_not_crash():
    bo = "<"
    lat = struct.pack(bo + "IIIIII", 10, 0, 0, 1, 0, 1)  # zero denominator
    ifd0 = (struct.pack(bo + "H", 1)
            + struct.pack(bo + "HHI", 0x8825, 4, 1)
            + struct.pack(bo + "I", 8 + 18)
            + struct.pack(bo + "I", 0))
    gps_off = 8 + len(ifd0)
    rat_off = gps_off + 2 + 12 * 2 + 4
    table = struct.pack(bo + "H", 2)
    table += struct.pack(bo + "HHI", 0x0001, 2, 2) + b"N\x00\x00\x00"
    table += struct.pack(bo + "HHI", 0x0002, 5, 3) + struct.pack(bo + "I", rat_off)
    table += struct.pack(bo + "I", 0)
    tiff = b"II" + struct.pack(bo + "HI", 42, 8) + ifd0 + table + lat
    r = E.parse_exif(_jpeg_wrap(tiff))
    assert r["gps_lat_udeg"] is None


def test_stage_per_row_isolation(spark):
    rows = [
        ("ok", bytearray(E.synth_exif_jpeg(1, 5))),
        ("none", bytearray(E.synth_exif_jpeg(0, 5))),
        ("bad", bytearray(E.synth_exif_jpeg(4, 5))),
        ("junk", bytearray(b"not a jpeg")),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in E.exif_stats(assets).collect()}
    assert got["ok"]["err"] is None and got["ok"]["make"] == "maker5"
    assert got["none"]["has_exif"] is False and got["none"]["err"] is None
    assert got["bad"]["err"] == "ValueError: EXIF IFD offset past end"
    assert got["bad"]["has_exif"] is False
    assert got["junk"]["err"].startswith("ValueError")


def test_fixture_classes_match_closed_forms():
    for did in (0, 1, 2, 3, 4, 101, 102, 103, 5001):
        k = did % len(E.EXIF_CLASSES)
        data = E.synth_exif_jpeg(k, did)
        if k == 4:
            with pytest.raises(ValueError):
                E.parse_exif(data)
            continue
        r = E.parse_exif(data)
        if k == 0:
            assert r["has_exif"] is False
        elif k == 1:
            assert r["make"] == f"maker{did % 7}"
            assert r["model"] == f"model{did % 13}"
            assert r["orientation"] == 1 + did % 8
        elif k == 2:
            assert r["make"] == f"cam{did % 5}"
            assert r["width"] == 16 * (1 + did % 100)
            assert r["dt_original"].endswith("12:00:00")
        elif k == 3:
            d, m, s = did % 90, did % 60, (did * 7) % 60
            udeg = ((d * 3600 + m * 60 + s) * 100 * 1_000_000 + 180_000) \
                // 360_000
            want = -udeg if did % 2 else udeg
            assert r["gps_lat_udeg"] == want, did

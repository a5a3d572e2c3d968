"""Charset sniffing + transcoding for the crawl front end (WHATWG
Encoding Standard labels + BOM/meta rules, public spec) — the decode
stage a real web corpus needs before HTML extraction: CommonCrawl bodies
are a charset zoo (cp1252 declared as latin-1, Shift_JIS, lying
Content-Type headers, BOM'd UTF-16), and a fixed ``F.decode(body,
'utf-8')`` silently mangles all of them.

Decision order (deliberately anti-mojibake, documented where it departs
from browser behavior):

1. **BOM** (UTF-8 / UTF-16LE / UTF-16BE) — wins over everything, per
   WHATWG "decode" hook.
2. **Strict-UTF-8 body with at least one multibyte sequence** — wins over
   HTTP/meta declarations. Browsers trust declarations; a curation
   pipeline must not (the classic mojibake source is a valid-UTF-8 body
   declared ``iso-8859-1``, which an 8-bit decode maps to ``Ã©``-style
   garbage without ever erroring). A pure-ASCII body falls through: any
   declared ASCII-superset yields identical text, so declarations keep
   their labeling role.
3. **Content-Type header** ``charset=`` parameter (WHATWG label table).
4. **``<meta charset>`` / ``<meta http-equiv>``** within the first 1024
   bytes (ASCII-compatible prescan, per the HTML spec's encoding
   sniffer). A meta-declared ``utf-16`` is treated as utf-8 (WHATWG
   rule: UTF-16 cannot be the outcome of the meta prescan).
5. **Fallback**: windows-1252.

windows-1252 always decodes with the TOTAL WHATWG table (the five bytes
undefined in the IANA codepage — 0x81 0x8D 0x8F 0x90 0x9D — map to the
corresponding C1 controls), so the fallback can never fail. A declared
codec that strict-fails on the actual bytes (a lying header) falls to
the windows-1252 total decode with ``charset_source='fallback'`` —
never ``errors='replace'`` on UTF-8, which would silently eat bytes.
UTF-16 without interior sanity is decoded with U+FFFD replacement for a
lone trailing byte (WHATWG behavior).

Spark surface: :func:`decode_text` is the map-only Arrow stage
(per-row isolated); :func:`synthetic_charset_assets` +
``CHARSET_CLASSES`` are the oracle fixture — the DuckDB twin predicts
(encoding, source, text) from doc_id closed forms while the Spark side
sniffs and transcodes REAL bytes in ten charset classes, so a wrong
label mapping, a missed BOM, or a trusted lying header breaks the hash.

Scale: header-prefix sniff + one decode per row, zero shuffles; payload
bytes never leave the scan stage. Reference parity note: the reference
engine ingests source code as UTF-8 only (`src/ingestion` assumes it);
this serves the training-data pipeline's crawl surface.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# WHATWG label table (subset: the labels that matter in web corpora).
# Values are (python codec, canonical name). Per the standard,
# iso-8859-1 / latin1 / ascii are all LABELS OF windows-1252.
_L1252 = ("__1252__", "windows-1252")
WHATWG_LABELS: dict[str, tuple[str, str]] = {
    **{lbl: ("utf-8", "utf-8") for lbl in (
        "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8", "x-unicode20utf8")},
    **{lbl: _L1252 for lbl in (
        "windows-1252", "cp1252", "x-cp1252", "iso-8859-1", "iso8859-1",
        "iso_8859-1", "latin1", "latin-1", "l1", "ascii", "us-ascii",
        "ansi_x3.4-1968", "iso-ir-100", "csisolatin1")},
    **{lbl: ("utf-16-le", "utf-16le") for lbl in (
        "utf-16", "utf-16le", "unicode", "ucs-2", "csunicode")},
    "utf-16be": ("utf-16-be", "utf-16be"),
    **{lbl: ("shift_jis", "shift_jis") for lbl in (
        "shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji", "ms932",
        "windows-31j", "csshiftjis")},
    **{lbl: ("euc_jp", "euc-jp") for lbl in ("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese")},
    **{lbl: ("gb18030", "gbk") for lbl in (
        "gbk", "gb2312", "gb_2312", "gb_2312-80", "x-gbk", "chinese", "csgb2312")},
    "gb18030": ("gb18030", "gb18030"),
    **{lbl: ("big5", "big5") for lbl in ("big5", "big5-hkscs", "cn-big5", "x-x-big5")},
    **{lbl: ("euc_kr", "euc-kr") for lbl in (
        "euc-kr", "korean", "ks_c_5601-1987", "csksc56011987", "windows-949")},
    **{lbl: ("koi8-r", "koi8-r") for lbl in ("koi8-r", "koi8", "cskoi8r", "koi8_r")},
    "koi8-u": ("koi8-u", "koi8-u"),
    **{lbl: ("cp1251", "windows-1251") for lbl in ("windows-1251", "cp1251", "x-cp1251")},
    **{lbl: ("iso8859-2", "iso-8859-2") for lbl in ("iso-8859-2", "iso8859-2", "latin2", "l2")},
    **{lbl: ("cp1250", "windows-1250") for lbl in ("windows-1250", "cp1250", "x-cp1250")},
    **{lbl: ("cp1254", "windows-1254") for lbl in (
        "windows-1254", "cp1254", "iso-8859-9", "latin5", "l5")},
    **{lbl: ("iso8859-15", "iso-8859-15") for lbl in ("iso-8859-15", "iso8859-15", "latin9", "l9")},
    **{lbl: ("cp1256", "windows-1256") for lbl in ("windows-1256", "cp1256", "x-cp1256")},
    **{lbl: ("cp874", "windows-874") for lbl in (
        "windows-874", "tis-620", "iso-8859-11", "dos-874")},
}

# WHATWG windows-1252: latin-1 byte identity on 0x00-0x7F/0xA0-0xFF,
# plus the 0x80-0x9F block below (None = keep the C1 control, i.e. the
# five bytes undefined in the IANA codepage).
_1252_C1 = [
    0x20AC, None, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, None, 0x017D, None,
    None, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, None, 0x017E, 0x0178,
]
_1252_TABLE = {
    0x80 + i: (cp if cp is not None else 0x80 + i)
    for i, cp in enumerate(_1252_C1)
}


def decode_windows_1252(body: bytes) -> str:
    """Total WHATWG windows-1252 decode: never fails on any byte."""
    return body.decode("latin-1").translate(_1252_TABLE)


_CHARSET_PARAM_RE = re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9._:+-]+)""", re.I)
_META_RE = re.compile(
    rb"""<meta\s[^>]{0,512}?(?:charset\s*=\s*["']?\s*([A-Za-z0-9._:+-]+)"""
    rb"""|content\s*=\s*["'][^"'>]{0,256}?charset\s*=\s*([A-Za-z0-9._:+-]+))""",
    re.I,
)


def _label(raw: bytes | str | None) -> tuple[str, str] | None:
    if raw is None:
        return None
    s = raw.decode("ascii", "replace") if isinstance(raw, bytes) else raw
    return WHATWG_LABELS.get(s.strip().lower())


def sniff_charset(body: bytes, content_type: str | None = None
                  ) -> tuple[str, str, str]:
    """(python_codec, canonical_name, source) for a raw HTTP body.
    source is one of bom / utf8_valid / header / meta / fallback; see the
    module docstring for the decision order and its rationale."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "utf-8", "bom"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", "utf-16le", "bom"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", "utf-16be", "bom"
    is_ascii = True
    try:
        body.decode("ascii")
    except UnicodeDecodeError:
        is_ascii = False
        try:
            body.decode("utf-8")
            return "utf-8", "utf-8", "utf8_valid"
        except UnicodeDecodeError:
            pass
    if content_type:
        m = _CHARSET_PARAM_RE.search(content_type.encode("ascii", "replace"))
        lab = _label(m.group(1)) if m else None
        if lab is not None:
            return lab[0], lab[1], "header"
    m = _META_RE.search(body[:1024])
    if m:
        lab = _label(m.group(1) or m.group(2))
        if lab is not None:
            codec, name = lab
            if name in ("utf-16le", "utf-16be"):
                # WHATWG: the meta prescan cannot yield UTF-16
                codec, name = "utf-8", "utf-8"
            return codec, name, "meta"
    if is_ascii:
        return "__1252__", "windows-1252", "fallback"
    return "__1252__", "windows-1252", "fallback"


def decode_body(body: bytes, content_type: str | None = None
                ) -> tuple[str, str, str]:
    """(text, canonical_encoding, source). Total: a declared codec that
    strict-fails on the bytes falls to the windows-1252 total decode
    (source becomes 'fallback'); UTF-16 decodes a lone trailing byte to
    U+FFFD."""
    codec, name, source = sniff_charset(body, content_type)
    if codec == "__1252__":
        return decode_windows_1252(body), name, source
    if codec in ("utf-16-le", "utf-16-be"):
        off = 2 if source == "bom" else 0
        return body[off:].decode(codec, "replace"), name, source
    try:
        return body.decode(codec), name, source
    except UnicodeDecodeError:
        return decode_windows_1252(body), "windows-1252", "fallback"


def decode_text(assets: DataFrame, id_col: str = "asset_id",
                body_col: str = "body",
                content_type_col: str | None = "content_type",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(asset_id, text, encoding, charset_source[, *keep_cols]): the
    map-only Arrow sniff+transcode stage, per-row isolated (decode_body
    is total, so err is reserved for a null body)."""
    cols = [id_col, body_col]
    if content_type_col:
        cols.append(content_type_col)
    cols += [c for c in keep_cols if c not in cols]

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "text": [], "encoding": [],
                "charset_source": [],
            }
            keeps = {c: pdf[c].tolist() for c in keep_cols}
            cts = (pdf[content_type_col].tolist() if content_type_col
                   else [None] * len(pdf))
            for aid, body, ct in zip(pdf[id_col], pdf[body_col], cts):
                if body is None:
                    text, enc, src = None, None, None
                else:
                    text, enc, src = decode_body(
                        bytes(body), None if ct is None else str(ct))
                out["asset_id"].append(str(aid))
                out["text"].append(text)
                out["encoding"].append(enc)
                out["charset_source"].append(src)
            for c in keep_cols:
                out[c] = keeps[c]
            yield pd.DataFrame(out)

    keep_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in assets.select(*keep_cols).schema.fields
    ) if keep_cols else ""
    return assets.select(*cols).mapInPandas(
        batch_fn,
        "asset_id string, text string, encoding string, "
        "charset_source string" + keep_schema,
    )


# --- deterministic fixture (the charset_detect oracle) -----------------------

CHARSET_CLASSES = [
    "ascii-header",    # pure ASCII, header says utf-8 -> header/utf-8
    "bom-utf8",        # UTF-8 BOM + multibyte body -> bom/utf-8
    "bom-utf16le",     # UTF-16LE BOM -> bom/utf-16le
    "header-1252",     # header windows-1252, curly-quote bytes -> header
    "meta-latin1",     # meta iso-8859-1 (a LABEL of 1252) -> meta
    "utf8-valid",      # undeclared valid multibyte UTF-8 -> utf8_valid
    "undeclared-8bit", # undeclared lone 0xE9 -> fallback/windows-1252
    "lying-header",    # header utf-8 but invalid bytes -> fallback
    "shift-jis",       # header shift_jis, real SJIS bytes -> header
    "c1-undefined",    # header 1252, 0x81 byte -> total table, header
]


def _class_payload(k: int, doc_id: int) -> tuple[bytes, str]:
    """(body_bytes, content_type) for class k — each a closed form of
    doc_id the DuckDB twin reproduces in SQL."""
    n = doc_id % 1000
    if k == 0:
        return (f"plain ascii {n}".encode("ascii"),
                "text/html; charset=utf-8")
    if k == 1:
        return (b"\xef\xbb\xbf" + f"café {n}".encode("utf-8"),
                "text/html")
    if k == 2:
        return (b"\xff\xfe" + f"naïve {n}".encode("utf-16-le"),
                "text/html")
    if k == 3:
        return (b"\x93quoted " + str(n).encode() + b"\x94 caf\xe9",
                'text/html; charset="windows-1252"')
    if k == 4:
        return ((b'<html><head><meta charset=iso-8859-1></head>'
                 b"<body>r\xe9sum\xe9 " + str(n).encode() + b"</body>"),
                "text/html")
    if k == 5:
        return (f"valid üñí {n}".encode("utf-8"), "text/html")
    if k == 6:
        return (b"lone caf\xe9 " + str(n).encode(), "text/html")
    if k == 7:
        return (b"bad \x93" + str(n).encode() + b"\x94",
                "text/html; charset=utf-8")
    if k == 8:
        # 0x93 0xFA = U+65E5, 0x96 0x7B = U+672C (Shift_JIS)
        return (b"\x93\xfa\x96{ " + str(n).encode(),
                "text/html; charset=Shift_JIS")
    return (b"ctrl \x81 " + str(n).encode(),
            "text/html; charset=windows-1252")


def synthetic_charset_assets(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """(asset_id, body, content_type) keyed off the documents table,
    class = doc_id % len(CHARSET_CLASSES)."""
    n_cls = len(CHARSET_CLASSES)

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            bodies, cts = [], []
            for i in ids:
                b, ct = _class_payload(int(i) % n_cls, int(i))
                bodies.append(b)
                cts.append(ct)
            yield pd.DataFrame({
                "asset_id": ids.astype("string"),
                "body": bodies,
                "content_type": cts,
            })

    return docs.select(id_col).mapInPandas(
        batch_fn, "asset_id string, body binary, content_type string"
    )

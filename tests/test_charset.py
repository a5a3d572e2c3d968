"""Charset sniff + transcode pins (sources/charset.py): decision-order
traps, the WHATWG windows-1252 total table, label aliasing, and the
WARC-chain auto-decode integration."""

import pytest

from kausaldb_spark.sources import charset as cs


# --- sniff decision order ----------------------------------------------------

def test_bom_beats_header():
    body = b"\xef\xbb\xbf" + "café".encode("utf-8")
    text, enc, src = cs.decode_body(body, "text/html; charset=shift_jis")
    assert (text, enc, src) == ("café", "utf-8", "bom")


def test_utf16le_bom():
    body = b"\xff\xfe" + "naïve".encode("utf-16-le")
    text, enc, src = cs.decode_body(body, "text/html; charset=utf-8")
    assert (text, enc, src) == ("naïve", "utf-16le", "bom")


def test_utf16be_bom():
    body = b"\xfe\xff" + "Ω".encode("utf-16-be")
    text, enc, src = cs.decode_body(body)
    assert (text, enc, src) == ("Ω", "utf-16be", "bom")


def test_valid_utf8_beats_lying_8bit_header():
    # the classic mojibake source: valid UTF-8 declared latin-1. A
    # browser would emit 'cafÃ©'; the pipeline must not.
    body = "café".encode("utf-8")
    text, enc, src = cs.decode_body(body, "text/html; charset=iso-8859-1")
    assert (text, enc, src) == ("café", "utf-8", "utf8_valid")


def test_pure_ascii_follows_header_label():
    text, enc, src = cs.decode_body(b"plain", "text/html; charset=utf-8")
    assert (text, enc, src) == ("plain", "utf-8", "header")


def test_header_1252_on_invalid_utf8():
    text, enc, src = cs.decode_body(
        b"\x93q\x94 caf\xe9", 'text/html; charset="windows-1252"')
    assert (text, enc, src) == ("“q” café", "windows-1252", "header")


def test_meta_charset_prescan():
    body = b"<html><head><meta charset=iso-8859-1></head><body>r\xe9</body>"
    text, enc, src = cs.decode_body(body, "text/html")
    assert enc == "windows-1252" and src == "meta"
    assert "ré" in text


def test_meta_http_equiv_content():
    body = (b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=koi8-r">\xc4\xc1')
    text, enc, src = cs.decode_body(body, None)
    assert (enc, src) == ("koi8-r", "meta")
    assert text.endswith("да")


def test_meta_outside_first_1024_bytes_is_ignored():
    body = b"x" * 1024 + b"<meta charset=shift_jis>\xe9"
    _text, enc, src = cs.decode_body(body, None)
    assert (enc, src) == ("windows-1252", "fallback")


def test_meta_utf16_is_treated_as_utf8():
    # WHATWG: the prescan cannot yield UTF-16 (pure-ASCII body, so the
    # utf8_valid rule does not preempt the meta label)
    body = b"<meta charset=utf-16>cafe"
    _text, enc, src = cs.decode_body(body, None)
    assert (enc, src) == ("utf-8", "meta")


def test_lying_utf8_header_falls_back():
    text, enc, src = cs.decode_body(b"bad \x93q\x94",
                                    "text/html; charset=utf-8")
    assert (text, enc, src) == ("bad “q”", "windows-1252", "fallback")


def test_undeclared_invalid_utf8_falls_back():
    text, enc, src = cs.decode_body(b"caf\xe9")
    assert (text, enc, src) == ("café", "windows-1252", "fallback")


def test_shift_jis_header():
    text, enc, src = cs.decode_body(b"\x93\xfa\x96{",
                                    "text/html; charset=Shift_JIS")
    assert (text, enc, src) == ("日本", "shift_jis", "header")


def test_unknown_label_falls_through():
    _t, enc, src = cs.decode_body(b"caf\xe9", "text/html; charset=klingon")
    assert (enc, src) == ("windows-1252", "fallback")


def test_declared_sjis_that_strict_fails_falls_back():
    # 0x81 0x20 is not a valid Shift_JIS sequence
    _t, enc, src = cs.decode_body(b"\x81 x", "text/html; charset=sjis")
    assert (enc, src) == ("windows-1252", "fallback")


def test_utf16_lone_trailing_byte_replaces():
    body = b"\xff\xfe" + "ab".encode("utf-16-le") + b"\x41"
    text, _enc, _src = cs.decode_body(body)
    assert text == "ab�"


# --- windows-1252 total table ------------------------------------------------

def test_1252_total_decode_all_256_bytes():
    text = cs.decode_windows_1252(bytes(range(256)))
    assert len(text) == 256
    assert text[0x80] == "€" and text[0x9F] == "Ÿ"
    assert text[0x93] == "“" and text[0xE9] == "é"
    # the five IANA-undefined bytes keep their C1 control codepoints
    for b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
        assert text[b] == chr(b)


@pytest.mark.parametrize("label,canon", [
    ("latin1", "windows-1252"), ("ISO-8859-1", "windows-1252"),
    ("ascii", "windows-1252"), ("UTF8", "utf-8"), ("x-sjis", "shift_jis"),
    ("gb2312", "gbk"), ("windows-949", "euc-kr"), ("tis-620", "windows-874"),
])
def test_label_aliases(label, canon):
    assert cs.WHATWG_LABELS[label.lower()][1] == canon


# --- fixture closed forms ----------------------------------------------------

def test_fixture_classes_decode_to_their_closed_forms():
    exp = {
        0: ("plain ascii 7", "utf-8", "header"),
        1: ("café 7", "utf-8", "bom"),
        2: ("naïve 7", "utf-16le", "bom"),
        3: ("“quoted 7” café", "windows-1252", "header"),
        4: ("<html><head><meta charset=iso-8859-1></head>"
            "<body>résumé 7</body>", "windows-1252", "meta"),
        5: ("valid üñí 7", "utf-8", "utf8_valid"),
        6: ("lone café 7", "windows-1252", "fallback"),
        7: ("bad “7”", "windows-1252", "fallback"),
        8: ("日本 7", "shift_jis", "header"),
        9: ("ctrl \x81 7", "windows-1252", "header"),
    }
    for k, want in exp.items():
        body, ct = cs._class_payload(k, 7)
        assert cs.decode_body(body, ct) == want, f"class {k}"


# --- Spark stage + WARC auto integration -------------------------------------

def test_decode_text_stage(spark):
    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    assets = cs.synthetic_charset_assets(docs)
    out = {r["asset_id"]: r for r in cs.decode_text(assets).collect()}
    assert len(out) == 20
    assert out["8"]["text"] == "日本 8" and out["8"]["encoding"] == "shift_jis"
    assert out["11"]["charset_source"] == "bom"
    assert out["17"]["charset_source"] == "fallback"


def test_warc_chain_auto_charset(spark, tmp_path):
    # a cp1252 page with a declaring header survives the charset=None
    # chain; the fixed-utf-8 chain would mangle its curly quotes
    from kausaldb_spark.sources import warc as wc

    html = b"<html><body><p>\x93Hello\x94 caf\xe9 world today</p></body></html>"
    rec = wc._warc_record_bytes(
        "response",
        wc._http_response_bytes(html, "text/html; charset=windows-1252"),
        record_id="urn:uuid:cp1252", target_uri="http://ex.com/a",
    )
    seg = tmp_path / "seg.warc"
    seg.write_bytes(rec)
    files = spark.read.format("binaryFile").load(
        str(seg)).select("path", "content")
    docs = wc.documents_from_warc_files(files, charset=None).collect()
    assert len(docs) == 1
    assert "“Hello” café world today" in docs[0]["text"]

"""PDF parser/extractor pins. The documents here are HAND-WRITTEN (raw
byte templates with real offsets, generation numbers, comments, and
incremental-update sections) — deliberately NOT built with the module's
own synth_pdf assembler, so the parser is exercised against the spec's
syntax surface rather than against the single shape its fixture emits."""

import zlib

import pytest

from kausaldb_spark.sources import pdf as P


def _wrap(body: bytes, version: str = "1.4") -> bytes:
    """Minimal envelope: header + body + a trailer pointing at object 1.
    Offsets are irrelevant to the scan parser but startxref is present so
    the file is structurally complete."""
    return (
        f"%PDF-{version}\n".encode() + body
        + b"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n"
    )


_ONE_PAGE = (
    b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
    b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
)


def _content_obj(num: int, content: bytes, extra: bytes = b"") -> bytes:
    return (
        f"{num} 0 obj << {extra.decode()} /Length {len(content)} >>\n"
        f"stream\n".encode() + content + b"\nendstream endobj\n"
    )


# --- tokenizer --------------------------------------------------------------

def test_literal_string_escapes():
    s, _ = P.parse_object(rb"(a\(b\)c \\ \n\t \101 \53 nested (x) done)", 0)
    assert s == b"a(b)c \\ \n\t A + nested (x) done"
    # line continuation: backslash-newline vanishes
    s, _ = P.parse_object(b"(ab\\\ncd)", 0)
    assert s == b"abcd"
    # \ooo stops at 3 digits; lone backslash drops
    s, _ = P.parse_object(rb"(\0533 \q)", 0)
    assert s == b"+3 q"


def test_hex_string_odd_pad_and_whitespace():
    s, _ = P.parse_object(b"<48 65 6C6C 6F2>", 0)
    assert s == b"Hello "  # odd nibble pads with 0 -> 0x20


def test_names_with_hash_escapes_and_dict_nesting():
    obj, _ = P.parse_object(
        b"<< /A#20B (v) /Nested << /K [1 2.5 -3 /X true false null] >> >>", 0
    )
    assert obj["A B"] == b"v"
    assert obj["Nested"]["K"] == [1, 2.5, -3, "X", True, False, None]
    assert isinstance(obj["Nested"]["K"][3], P.PdfName)


def test_refs_vs_numbers():
    arr, _ = P.parse_object(b"[ 1 0 R 1 0 2 ]", 0)
    assert arr == [P.PdfRef(1, 0), 1, 0, 2]


def test_comments_inside_objects():
    obj, _ = P.parse_object(b"<< /A % comment here\n 7 >>", 0)
    assert obj["A"] == 7


# --- filters ----------------------------------------------------------------

def test_ascii85_with_z_and_terminator():
    import base64

    payload = b"\x00\x00\x00\x00hello world, ascii85!"
    enc = base64.a85encode(payload) + b"~>"
    # a85encode does NOT use the z shortcut; craft one manually
    assert P._ascii85(enc) == payload
    assert P._ascii85(b"z~>") == b"\x00\x00\x00\x00"


def test_runlength_decode():
    # literal run (n=2 -> 3 bytes), repeat run (257-254=3 copies), EOD
    assert P._runlength(bytes([2]) + b"abc" + bytes([254]) + b"Z" +
                        bytes([128])) == b"abcZZZ"


def test_flate_with_png_up_predictor():
    rows = [b"\x01\x02\x03", b"\x01\x01\x01"]
    # forward Up filter: row0 unchanged (prev=0), row1 = cur - prev
    filtered = b"\x02" + rows[0] + b"\x02" + bytes(
        (rows[1][i] - rows[0][i]) & 0xFF for i in range(3))
    raw = zlib.compress(filtered)
    out = P._apply_filters(
        raw, P.PdfName("FlateDecode"),
        {"Predictor": 12, "Columns": 3, "Colors": 1, "BitsPerComponent": 8})
    assert out == b"".join(rows)


def test_filter_chain_hex_then_flate():
    body = b"BT (x) Tj ET"
    enc = zlib.compress(body).hex().encode() + b">"
    out = P._apply_filters(
        enc, [P.PdfName("ASCIIHexDecode"), P.PdfName("FlateDecode")], None)
    assert out == body


def test_lzw_is_the_documented_boundary():
    with pytest.raises(NotImplementedError):
        P._apply_filters(b"x", P.PdfName("LZWDecode"), None)


# --- document model ---------------------------------------------------------

def test_indirect_length_defined_after_stream():
    content = b"BT /F1 10 Tf 0 700 Td (after-length) Tj ET"
    body = (
        _ONE_PAGE
        + b"4 0 obj << /Length 5 0 R >>\nstream\n" + content
        + b"\nendstream endobj\n"
        + f"5 0 obj {len(content)} endobj\n".encode()
    )
    r = P.extract_pdf_text(_wrap(body))
    assert r["n_pages"] == 1 and r["text"] == "after-length"


def test_incremental_update_later_definition_wins():
    c1 = b"BT 0 700 Td (old text) Tj ET"
    c2 = b"BT 0 700 Td (new text) Tj ET"
    body = _ONE_PAGE + _content_obj(4, c1)
    # incremental update section: object 4 redefined after first trailer
    data = (
        _wrap(body)[: -len(b"%%EOF\n")]
        + _content_obj(4, c2)
        + b"trailer\n<< /Size 9 /Root 1 0 R /Prev 0 >>\nstartxref\n0\n%%EOF\n"
    )
    r = P.extract_pdf_text(data)
    assert r["text"] == "new text"


def test_false_object_header_inside_stream_payload_is_ignored():
    # a binary stream containing what LOOKS like "2 0 obj << junk"
    evil = b"junk 2 0 obj << /Type /Catalog >> endobj more"
    body = (
        _ONE_PAGE
        + _content_obj(4, b"BT 0 700 Td (safe) Tj ET")
        + f"5 0 obj << /Length {len(evil)} >>\nstream\n".encode()
        + evil + b"\nendstream endobj\n"
    )
    doc = P.PdfDocument(_wrap(body))
    # object 2 must still be the Pages node, not the evil catalog
    assert str(doc.objects[2].get("Type")) == "Pages"
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "safe"


def test_page_tree_order_with_nested_kids():
    body = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [5 0 R 3 0 R] /Count 3 >> endobj\n"
        b"5 0 obj << /Type /Pages /Parent 2 0 R /Kids [6 0 R 7 0 R] "
        b"/Count 2 >> endobj\n"
        b"6 0 obj << /Type /Page /Parent 5 0 R /Contents 8 0 R >> endobj\n"
        b"7 0 obj << /Type /Page /Parent 5 0 R /Contents 9 0 R >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 10 0 R >> endobj\n"
        + _content_obj(8, b"BT 0 1 Td (p-first) Tj ET")
        + _content_obj(9, b"BT 0 1 Td (p-second) Tj ET")
        + _content_obj(10, b"BT 0 1 Td (p-third) Tj ET")
    )
    r = P.extract_pdf_text(_wrap(body))
    # document order follows the tree (nested subtree first), not object
    # numbers
    assert r["n_pages"] == 3
    assert r["text"] == "p-first\np-second\np-third"


def test_objstm_expansion_and_no_toplevel_shadowing():
    inner = (
        b"1 0"  # placeholder; real pairs built below
    )
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Contents 4 0 R >>"),
    ]
    bodies = b""
    pairs = []
    for num, ob in objs:
        pairs.append(f"{num} {len(bodies)}")
        bodies += ob + b" "
    header = (" ".join(pairs) + " ").encode()
    payload = zlib.compress(header + bodies)
    body = (
        _content_obj(4, b"BT 0 1 Td (from objstm) Tj ET")
        + f"5 0 obj << /Type /ObjStm /N 3 /First {len(header)} "
          f"/Filter /FlateDecode /Length {len(payload)} >>\n"
          f"stream\n".encode() + payload + b"\nendstream endobj\n"
        # a TOP-LEVEL object 3 also exists: it must win over the packed one
        + b"3 0 obj << /Type /Page /Contents 4 0 R /Rotate 90 >> endobj\n"
    )
    doc = P.PdfDocument(_wrap(body, "1.5"))
    assert doc.objects[3].get("Rotate") == 90  # top-level beats packed
    assert str(doc.objects[1].get("Type")) == "Catalog"  # packed expanded
    r = P.extract_pdf_text(_wrap(body, "1.5"))
    assert r["text"] == "from objstm" and r["version"] == "1.5"


def test_contents_array_concatenation():
    body = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents [4 0 R 5 0 R] >> endobj\n"
        + _content_obj(4, b"BT 0 700 Td (part-a) Tj")
        + _content_obj(5, b"T* (part-b) Tj ET")
    )
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "part-a\npart-b"


def test_form_xobject_recursion_via_do():
    form = b"BT 0 1 Td (inside form) Tj ET"
    body = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R "
        b"/Resources << /XObject << /Fm1 5 0 R >> >> >> endobj\n"
        + _content_obj(4, b"BT 0 700 Td (before) Tj ET /Fm1 Do "
                          b"BT 0 1 Td (after) Tj ET")
        + _content_obj(5, form, extra=b"/Subtype /Form")
    )
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "before\ninside form\nafter"


def test_inline_image_skipped():
    content = (
        b"BT 0 700 Td (pre) Tj ET "
        b"BI /W 2 /H 2 /CS /RGB /BPC 8 ID \x00\x01(fake) Tj\xff EI "
        b"BT 0 1 Td (post) Tj ET"
    )
    body = _ONE_PAGE + _content_obj(4, content)
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "pre\npost"


def test_text_operators_quote_doublequote_tstar():
    content = (
        b"BT 0 700 Td (l1) Tj (l2) ' 1 2 (l3) \" T* (l4) Tj ET"
    )
    body = _ONE_PAGE + _content_obj(4, content)
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "l1\nl2\nl3\nl4"


def test_tj_array_mixed_elements():
    content = b"BT 0 700 Td [(a) -120 (b) 55 <2063> (d)] TJ ET"
    body = _ONE_PAGE + _content_obj(4, content)
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "ab cd"  # hex <2063> = ' c'; kerning never spaces


def test_encrypted_classifies_with_real_page_count():
    body = (
        _ONE_PAGE
        + _content_obj(4, b"BT 0 1 Td (secret) Tj ET")
        + b"9 0 obj << /Filter /Standard /V 1 /R 2 /P -44 >> endobj\n"
    )
    data = (
        b"%PDF-1.4\n" + body
        + b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 9 0 R >>\n"
          b"startxref\n0\n%%EOF\n"
    )
    r = P.extract_pdf_text(data)
    assert r["encrypted"] is True and r["n_pages"] == 1 and r["text"] is None


def test_not_a_pdf_and_no_pages():
    with pytest.raises(ValueError):
        P.extract_pdf_text(b"GIF89a not a pdf")
    r = P.extract_pdf_text(b"%PDF-1.7\njunk only")
    assert r["n_pages"] == 0 and r["version"] == "1.7"


def test_catalog_fallback_without_trailer():
    # xref-stream-era file: no 'trailer' keyword at all; catalog found by
    # /Type scan
    body = _ONE_PAGE + _content_obj(4, b"BT 0 700 Td (no-trailer) Tj ET")
    data = b"%PDF-1.5\n" + body + b"startxref\n0\n%%EOF\n"
    r = P.extract_pdf_text(data)
    assert r["text"] == "no-trailer"


# --- Spark stage -------------------------------------------------------------

def test_pdf_stage_per_row_isolation(spark):
    rows = [
        ("ok", bytearray(P.synth_pdf(0, 7))),
        ("enc", bytearray(P.synth_pdf(5, 8))),
        ("dam", bytearray(P.synth_pdf(6, 9))),
        ("junk", bytearray(b"not a pdf at all")),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in P.pdf_text_stats(assets).collect()}
    assert got["ok"]["err"] is None and got["ok"]["n_pages"] == 1
    assert got["ok"]["text"].startswith("doc 7 page 0 line 0")
    assert got["enc"]["err"] == "encrypted" and got["enc"]["encrypted"] is True
    assert got["dam"]["err"] == "no-pages"
    assert got["junk"]["err"].startswith("ValueError")


def test_synth_classes_match_closed_form():
    for k, (mode, n_pages, version) in enumerate(P.PDF_CLASSES):
        if mode in ("encrypted", "damaged"):
            continue
        for did in (k, 50 + k, 1234 + k):
            r = P.extract_pdf_text(P.synth_pdf(k, did))
            want = "\n".join(
                P.pdf_fixture_line(did, p, ln)
                for p in range(n_pages) for ln in range(3)
            )
            assert r["text"] == want and r["version"] == version, (k, did)


# --- ToUnicode CMaps (composite fonts) ---------------------------------------

def test_parse_tounicode_bfchar_bfrange_and_array_dst():
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0041> <0002> <00420043> endbfchar\n"
        b"1 beginbfrange <0010> <0012> <0061> endbfrange\n"
        b"1 beginbfrange <0020> <0022> [<0058> <0059005A> <005A>] endbfrange\n"
    )
    width, mapping = P.parse_tounicode(cmap)
    assert width == 2
    assert mapping[1] == "A" and mapping[2] == "BC"
    assert mapping[0x10] == "a" and mapping[0x12] == "c"
    assert mapping[0x20] == "X" and mapping[0x21] == "YZ"
    assert mapping[0x22] == "Z"


def test_font_text_width_split_and_fallback():
    font = P._FontMap(2, {0x0141: "A", 0x0142: "B"})
    assert P._font_text(b"\x01\x41\x01\x42", font) == "AB"
    # unmapped code falls back to its latin-1 bytes
    assert P._font_text(b"\x01\x41\x00Q", font) == "A\x00Q"
    # trailing odd byte survives as latin-1
    assert P._font_text(b"\x01\x41Z", font) == "AZ"


def test_type0_font_with_tounicode_in_document():
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0120> <017E> <0020> endbfrange\n"
    )
    text = "Hi CMap!"
    codes = "".join(f"{ord(c) + 0x100:04x}" for c in text)
    body = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R /Resources "
        b"<< /Font << /Fx 5 0 R /Fplain 7 0 R >> >> >> endobj\n"
        + _content_obj(
            4,
            (f"BT /Fx 10 Tf 0 700 Td <{codes}> Tj "
             f"/Fplain 10 Tf 0 -14 Td (latin line) Tj ET").encode())
        + b"5 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H "
          b"/ToUnicode 6 0 R >> endobj\n"
        + _content_obj(6, cmap)
        + b"7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> "
          b"endobj\n"
    )
    r = P.extract_pdf_text(_wrap(body))
    # Tf switches mid-page: CMap font then simple font; a decoder that
    # ignored the CMap would emit the raw 2-byte code units instead
    assert r["text"] == "Hi CMap!\nlatin line"


def test_form_xobject_inherits_font_but_does_not_leak_changes():
    cmap = b"1 beginbfchar <0041> <0058> endbfchar\n"  # 'A' code -> 'X'
    form = b"BT 0 1 Td <0041> Tj ET"  # uses the INHERITED CMap font
    body = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R /Resources "
        b"<< /Font << /Fc 5 0 R >> /XObject << /Fm 7 0 R >> >> >> endobj\n"
        + _content_obj(
            4, b"BT /Fc 10 Tf 0 700 Td <0041> Tj ET /Fm Do "
               b"BT 0 1 Td <0041> Tj ET")
        + b"5 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >> "
          b"endobj\n"
        + _content_obj(6, cmap)
        + _content_obj(7, form, extra=b"/Subtype /Form")
    )
    r = P.extract_pdf_text(_wrap(body))
    assert r["text"] == "X\nX\nX"


def test_synth_type0_class_applies_cmap():
    data = P.synth_pdf(7, 42)
    r = P.extract_pdf_text(data)
    assert r["text"].startswith("doc 42 page 0 line 0")
    # the raw content stream contains NO ascii text — only 2-byte codes
    doc = P.PdfDocument(data)
    content = doc.content_bytes(doc.pages()[0])
    assert b"doc 42" not in content

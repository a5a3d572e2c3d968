"""WARC source pins (sources/warc.py) against an INDEPENDENT test-side
writer — records and gzip members are assembled by hand from the ISO 28500
layout here, never by the module under test."""

import gzip
import os

import pandas as pd
import pytest

from kausaldb_spark.sources import html as hx
from kausaldb_spark.sources import warc as wc

CRLF = b"\r\n"


def make_record(wtype, uri, content, rid="<urn:uuid:1>", extra=()):
    hdr = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2026-08-16T00:00:00Z",
    ]
    if uri:
        hdr.append(b"WARC-Target-URI: " + uri.encode())
    hdr.extend(extra)
    hdr.append(b"Content-Length: " + str(len(content)).encode())
    return CRLF.join(hdr) + CRLF + CRLF + content + CRLF + CRLF


def make_http(body, status=200, ctype="text/html", chunked=False, extra=()):
    if chunked:
        wire = b""
        for i in range(0, len(body), 7):
            chunk = body[i : i + 7]
            wire += f"{len(chunk):x}".encode() + CRLF + chunk + CRLF
        wire += b"0" + CRLF + CRLF
        te = (b"Transfer-Encoding: chunked",)
    else:
        wire, te = body, ()
    hdr = [
        f"HTTP/1.1 {status} X".encode(),
        b"Content-Type: " + ctype.encode(),
        *te,
        *extra,
    ]
    return CRLF.join(hdr) + CRLF + CRLF + wire


def test_plain_multi_record_and_type_filter():
    data = (
        make_record("warcinfo", "", b"software: test")
        + make_record("request", "http://a.com/", b"GET / HTTP/1.1\r\n\r\n")
        + make_record("response", "http://a.com/", make_http(b"<p>hi</p>"))
        + make_record("metadata", "http://a.com/", b"k: v")
    )
    recs = list(wc.iter_warc_records(data))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "request", "response", "metadata",
    ]
    # binary-safe: a body containing CRLFCRLF must not split the record
    tricky = make_http(b"a\r\n\r\nb\r\n\r\nc")
    data2 = make_record("response", "http://b.com/", tricky) + make_record(
        "response", "http://c.com/", make_http(b"z")
    )
    recs2 = list(wc.iter_warc_records(data2))
    assert len(recs2) == 2 and recs2[0]["content"] == tricky


def test_gzip_member_concatenation():
    members = [
        gzip.compress(make_record("response", f"http://h{i}.com/", make_http(b"x" * i)))
        for i in range(3)
    ]
    recs = list(wc.iter_warc_records(b"".join(members)))
    assert [r["headers"]["warc-target-uri"] for r in recs] == [
        "http://h0.com/", "http://h1.com/", "http://h2.com/",
    ]


def test_truncated_record_raises_after_yielding_prefix():
    good = make_record("response", "http://a.com/", make_http(b"ok"))
    bad = make_record("response", "http://b.com/", make_http(b"yyyy"))[:-10]
    it = wc.iter_warc_records(good + bad)
    assert next(it)["headers"]["warc-target-uri"] == "http://a.com/"
    with pytest.raises(ValueError):
        list(it)


def test_http_split_and_chunked_decode():
    r = wc.split_http_response(make_http(b"hello world", chunked=True))
    assert r["status"] == 200
    assert r["headers"]["content-type"] == "text/html"
    assert r["body"] == b"hello world"
    with pytest.raises(ValueError):
        wc.split_http_response(b"not http at all")


def test_host_of():
    assert wc._host_of("https://User@Sub.Example.COM:8443/p?q#f") == "sub.example.com"
    assert wc._host_of("http://plain.org/x") == "plain.org"
    assert wc._host_of("no-scheme.net/path") == "no-scheme.net"


def _write_segments(tmpdir):
    """Two segments: one plain, one gzipped; mixed types, statuses and
    content types; one corrupt third file."""
    payload_html = make_http(
        hx.synth_html(0, 7, "alpha beta gamma").encode()
    )
    seg1 = (
        make_record("warcinfo", "", b"software: test")
        + make_record("response", "https://a.example.com/x", payload_html)
        + make_record("response", "https://b.example.com/y",
                      make_http(b"{}", ctype="application/json"))
    )
    seg2 = b"".join(
        [
            gzip.compress(
                make_record(
                    "response",
                    "https://c.example.com:8080/z",
                    make_http(
                        hx.synth_html(3, 8, "delta epsilon").encode(),
                        chunked=True,
                    ),
                )
            ),
            gzip.compress(
                make_record("response", "https://dead.example.com/e",
                            make_http(b"gone", status=404))
            ),
        ]
    )
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "seg1.warc"), "wb") as f:
        f.write(seg1)
    with open(os.path.join(tmpdir, "seg2.warc.gz"), "wb") as f:
        f.write(seg2)
    with open(os.path.join(tmpdir, "seg3.warc"), "wb") as f:
        f.write(b"WARC/1.0\r\nbroken")


def test_read_warc_records_spark(spark, tmp_path):
    d = str(tmp_path / "warc")
    _write_segments(d)
    df = wc.read_warc_records(spark, d)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: file tasks -> rows
    rows = df.collect()
    errs = [r for r in rows if r["error"] is not None]
    recs = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and "seg3" in errs[0]["warc_file"]
    assert sorted(r["target_uri"] for r in recs) == [
        "https://a.example.com/x",
        "https://b.example.com/y",
        "https://c.example.com:8080/z",
        "https://dead.example.com/e",
    ]
    assert all(r["warc_type"] == "response" for r in recs)


def test_warc_to_documents_end_to_end(spark, tmp_path):
    d = str(tmp_path / "warc2")
    _write_segments(d)
    docs = wc.warc_to_documents(spark, d)
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    out = {r["source"]: r for r in docs.collect()}
    # only the two 200-status text/html pages survive; json + 404 + corrupt drop
    assert set(out) == {"a.example.com", "c.example.com"}
    assert out["a.example.com"]["text"] == "alpha beta gamma"
    # class 3 wraps payload in nav/footer boilerplate the extractor drops
    assert out["c.example.com"]["text"] == "delta epsilon"
    assert out["a.example.com"]["lang"] == "und"
    assert out["a.example.com"]["n_chars"] == len("alpha beta gamma")
    assert out["a.example.com"]["doc_id"] > 0
    # content-addressed ids: re-reading yields identical ids
    again = {r["source"]: r["doc_id"] for r in wc.warc_to_documents(spark, d).collect()}
    assert again == {s: r["doc_id"] for s, r in out.items()}


def test_host_regex_matches_pure_twin(spark):
    uris = [
        "https://User@Sub.Example.COM:8443/p?q#f",
        "http://plain.org/x",
        "no-scheme.net/path",
        "https://h.io",
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"target_uri": uris}))
    got = [
        r[0]
        for r in sdf.select(
            wc.F.lower(
                wc.F.regexp_extract(
                    "target_uri",
                    r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?:#]+)",
                    1,
                )
            )
        ).collect()
    ]
    assert got == [wc._host_of(u) for u in uris]


def test_synthetic_segments_roundtrip_and_traps_dropped(spark):
    """The warc_ingest fixture writer: segments parse through the real
    chain, trap records (warcinfo / 404 / text-plain) are dropped, chunked
    and gzip-member variants decode to the same logical result."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en", "srca"),   # seg 0 (gz), chunked (0%3==0)
            (1, "gamma delta", "en", "srcb"),  # seg 1 (plain)
            (16, "epsilon", "en", "srca"),     # seg 0 (gz), plain CL
        ],
        "doc_id long, text string, lang string, source string",
    )
    files = wc.synthetic_warc_files(docs, n_segments=16)
    fl = {r["path"]: bytes(r["content"]) for r in files.collect()}
    assert set(fl) == {
        "synthetic://crawl/segment-00000.warc.gz",
        "synthetic://crawl/segment-00001.warc",
    }
    assert fl["synthetic://crawl/segment-00000.warc.gz"][:2] == b"\x1f\x8b"
    # every record (incl. traps) parses; the ingest chain keeps only docs
    all_recs = list(
        wc.iter_warc_records(fl["synthetic://crawl/segment-00000.warc.gz"])
    )
    assert len(all_recs) == 5  # warcinfo + 2 docs + 404 + text/plain traps
    out = {
        r["source"]: r
        for r in wc.documents_from_warc_files(files).collect()
    }
    assert set(out) == {"srca.example.org", "srcb.example.org"}
    texts = sorted(
        r["text"] for r in wc.documents_from_warc_files(files).collect()
    )
    # class k = doc_id % 6: 0 -> bare <p>, 1 -> script traps, 4 -> word/li
    assert texts == ["alpha beta", "epsilon", "gamma delta"]


def test_synth_segment_roundtrip_hypothesis():
    """Property: any batch of (doc_id, source, html) rows — including
    html bodies containing CRLF runs, 0xFF bytes after encoding, gzip
    magic lookalikes, and empty strings — survives synth_warc_segment ->
    iter_warc_records -> split_http_response EXACTLY, in both framings
    (plain and gzip-membered), chunked and content-length alike."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body_alphabet = st.text(
        ["a", "b", " ", "\r", "\n", "\x1f", "\x8b", "é", "ÿ", "<", ">"],
        max_size=40,
    )
    rows_st = st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["s1", "s2"]),
                  body_alphabet),
        min_size=0, max_size=5,
    )

    @settings(max_examples=40, deadline=None)
    @given(rows=rows_st, gz=st.booleans())
    def check(rows, gz):
        # distinct ids keep the expected map unambiguous
        rows = [(i * 7 + k, s, h) for k, (i, s, h) in enumerate(rows)]
        blob = wc.synth_warc_segment(rows, gzip_members=gz)
        got = {}
        n_other = 0
        for rec in wc.iter_warc_records(blob):
            h = rec["headers"]
            if h.get("warc-type") != "response":
                n_other += 1
                continue
            resp = wc.split_http_response(rec["content"])
            if resp["status"] != 200:
                continue
            if "text/html" not in resp["headers"].get("content-type", ""):
                continue
            uri = h["warc-target-uri"]
            got[uri] = resp["body"].decode("utf-8")
        assert n_other == 1  # the warcinfo record
        want = {
            f"https://{s}.example.org/doc/{i}": h for i, s, h in rows
        }
        assert got == want

    check()

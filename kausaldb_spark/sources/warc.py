"""WARC (Web ARChive, ISO 28500) source — crawl-archive ingestion.

Web-scale training corpora arrive as WARC segment files (CommonCrawl ships
~100k gzipped ~1 GB segments per crawl). This is the adapter from that
physical format to the engine's canonical relations, completing the crawl
chain: WARC segment -> HTTP responses -> ``sources/html`` extraction ->
canonical ``documents``.

Format facts the parser implements (all from the public ISO 28500 spec and
the CommonCrawl layout):

- a WARC file is a sequence of records: a CRLF-terminated header block
  (``WARC/1.x`` version line + ``Name: value`` fields), one empty line, a
  content block of exactly ``Content-Length`` bytes, then two CRLFs;
- ``.warc.gz`` is a CONCATENATION of gzip members, one record per member —
  the property that makes per-record random access (and per-record
  streaming decompression) possible without a global index;
- a ``response`` record's content block is a raw HTTP/1.x response:
  status line, headers, CRLFCRLF, body (possibly ``Transfer-Encoding:
  chunked``, stored as transferred).

Scale notes (100 TB):
- parallelism is per segment FILE (``binaryFile`` scan): 100k segments =
  100k tasks, which is exactly how production crawl pipelines schedule
  WARC work — gzip members are not splittable mid-file and don't need to
  be at that file count;
- gzipped input is decompressed MEMBER-BY-MEMBER (``zlib.decompressobj``
  + ``unused_data``), so per-task transient memory is one record, not one
  decompressed segment;
- a corrupt segment/record degrades to an error row (same per-row error
  isolation contract as ``sources/multimodal``), never a failed job;
- the output of ``warc_to_documents`` should be written to parquet once
  and analytics run on that — the WARC scan is ingest-once, like the
  raw-text reader in ``sources/corpus``.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# pure parsers (unit-pinned against an independent test-side WARC writer)
# ---------------------------------------------------------------------------


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time."""
    rest = data
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield out
        rest = d.unused_data
    if rest.strip(b"\x00"):  # gzip allows zero padding at EOF
        raise ValueError("trailing non-gzip bytes after last member")


def _parse_records_from(buf: bytes, pos: int) -> Iterator[dict]:
    """Parse consecutive WARC records from ``buf`` starting at ``pos``."""
    n = len(buf)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        hdr_end = buf.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated record header")
        lines = buf[pos:hdr_end].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad version line {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("truncated record content")
        yield {
            "headers": headers,
            "content": buf[body_start : body_start + clen],
        }
        pos = body_start + clen


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {lowercased-name: value}, "content": bytes}``
    per record, for plain and member-gzipped WARC alike. Raises ValueError
    on structural corruption (the Spark layer converts that to an error
    row; records yielded before the corruption point are kept)."""
    if data[:2] == _GZIP_MAGIC:
        for member in _iter_gzip_members(data):
            yield from _parse_records_from(member, 0)
    else:
        yield from _parse_records_from(data, 0)


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body."""
    out, pos = [], 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated chunk-size line")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        size = int(size_token, 16)
        if size == 0:
            return b"".join(out)
        start = eol + 2
        if start + size > len(body):
            raise ValueError("truncated chunk")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip chunk-terminating CRLF


def split_http_response(payload: bytes) -> dict:
    """Split a raw HTTP response into status/headers/body; decodes chunked
    transfer-encoding. Returns ``{"status": int, "headers": dict,
    "body": bytes}``; raises ValueError on a non-HTTP payload."""
    if not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    hdr_end = payload.find(_CRLF + _CRLF)
    if hdr_end < 0:
        raise ValueError("truncated HTTP header block")
    lines = payload[:hdr_end].split(_CRLF)
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad status line {lines[0][:40]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().decode("ascii", "replace").lower()] = (
            v.strip().decode("utf-8", "replace")
        )
    body = payload[hdr_end + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return {"status": int(parts[1]), "headers": headers, "body": body}


def _host_of(uri: str) -> str:
    """Registered host of a target URI ('' when unparseable)."""
    rest = uri.split("://", 1)[-1]
    host = rest.split("/", 1)[0].split("?", 1)[0]
    host = host.rsplit("@", 1)[-1].split(":", 1)[0]
    return host.lower()


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_RECORD_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "payload binary, error string"
)


def parse_warc_files(
    files: DataFrame, types: tuple = ("response",)
) -> DataFrame:
    """(warc_file, record_id, warc_type, target_uri, warc_date,
    content_type, payload, error) — one row per WARC record of a kept
    type, plus at most one error row per structurally corrupt file
    (records parsed before the corruption point are kept). ``files`` is
    (path string, content binary) — a ``binaryFile`` scan in production
    (see :func:`read_warc_records`) or a synthesized segment relation in
    the oracle fixture. One Arrow ``mapInPandas`` parse stage; map-only.
    """
    keep = {t.lower() for t in types} if types else None

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for fname, data in zip(pdf["path"], pdf["content"]):
                try:
                    for rec in iter_warc_records(bytes(data)):
                        h = rec["headers"]
                        wtype = h.get("warc-type", "").lower()
                        if keep is not None and wtype not in keep:
                            continue
                        rows.append(
                            (
                                fname,
                                h.get("warc-record-id", ""),
                                wtype,
                                h.get("warc-target-uri", ""),
                                h.get("warc-date", ""),
                                h.get("content-type", ""),
                                rec["content"],
                                None,
                            )
                        )
                except ValueError as exc:
                    rows.append(
                        (fname, "", "", "", "", "", None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "payload", "error",
                ],
            )

    return files.select("path", "content").mapInPandas(
        batch_fn, _RECORD_SCHEMA
    )


def read_warc_records(
    spark: SparkSession, path: str, types: tuple = ("response",)
) -> DataFrame:
    """The production entry point: ``binaryFile`` scan (parallelism = one
    task per segment file, the CommonCrawl layout) ->
    :func:`parse_warc_files`."""
    return parse_warc_files(
        spark.read.format("binaryFile").load(path).select("path", "content"),
        types=types,
    )


_HTTP_SCHEMA = (
    "warc_file string, record_id string, target_uri string, "
    "warc_date string, http_status int, http_content_type string, "
    "body binary, error string"
)


def warc_http_responses(records: DataFrame) -> DataFrame:
    """Split response-record payloads into HTTP status / content-type /
    body (chunked transfer decoded). Map-only Arrow stage; per-row error
    isolation (a malformed HTTP payload becomes an error row)."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                if r.error is not None or r.payload is None:
                    rows.append(
                        (r.warc_file, r.record_id, r.target_uri,
                         r.warc_date, None, None, None, r.error)
                    )
                    continue
                try:
                    resp = split_http_response(bytes(r.payload))
                    rows.append(
                        (
                            r.warc_file, r.record_id, r.target_uri,
                            r.warc_date, resp["status"],
                            resp["headers"].get("content-type", ""),
                            resp["body"], None,
                        )
                    )
                except ValueError as exc:
                    rows.append(
                        (r.warc_file, r.record_id, r.target_uri,
                         r.warc_date, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "target_uri", "warc_date",
                    "http_status", "http_content_type", "body", "error",
                ],
            )

    return records.mapInPandas(batch_fn, _HTTP_SCHEMA)


def warc_to_documents(
    spark: SparkSession, path: str, charset: str = "utf-8"
) -> DataFrame:
    """The full crawl chain from a segment directory: ``binaryFile`` scan
    -> :func:`documents_from_warc_files`. Write the result to parquet and
    analyze THAT — the WARC scan is ingest-once."""
    return documents_from_warc_files(
        spark.read.format("binaryFile").load(path).select("path", "content"),
        charset=charset,
    )


def documents_from_warc_files(files: DataFrame,
                              charset: str | None = "utf-8") -> DataFrame:
    """The full crawl chain over a (path, content) relation: WARC records
    -> 200-status ``text/html`` responses -> ``sources/html`` extraction ->
    canonical documents schema (content-addressed doc ids, source = target
    host, lang left to the downstream ``lang_id`` stage). Map-only until
    the caller's first aggregation.

    ``charset``: a fixed encoding keeps the decode in pure codegen
    (``F.decode``) for corpora known to be single-charset; ``None``
    switches to the WHATWG sniff+transcode Arrow stage
    (``sources/charset.decode_text``) — BOM / valid-UTF-8 / Content-Type
    header / meta prescan / windows-1252 fallback — which real mixed
    crawl data requires (same map-only shape, per-row total)."""
    from kausaldb_spark.sources import corpus as cp
    from kausaldb_spark.sources import html as hx

    http = warc_http_responses(parse_warc_files(files))
    responses = (
        http.where(F.col("error").isNull())
        .where(F.col("http_status") == 200)
        .where(F.lower(F.col("http_content_type")).contains("text/html"))
    )
    if charset is None:
        from kausaldb_spark.sources import charset as cset

        decoded = cset.decode_text(
            responses.select(
                F.xxhash64("warc_file", "record_id", "target_uri").alias(
                    "asset_id"),
                F.col("body"),
                F.col("http_content_type").alias("content_type"),
                "target_uri",
            ),
            keep_cols=("target_uri",),
        )
        pages = decoded.select(
            F.col("asset_id").cast("bigint").alias("doc_id"),
            F.col("text").alias("html"),
            "target_uri",
        )
    else:
        pages = responses.select(
            # transient key: extract_html_text's id contract is a bigint
            # column; the PERSISTED id is the content-address from
            # conform(). target_uri rides THROUGH the extraction stage
            # (keep_cols) — a join-back to this frame would re-run the
            # whole WARC parse chain a second time, a 2x scan at 100 TB.
            F.xxhash64("warc_file", "record_id", "target_uri").alias(
                "doc_id"
            ),
            F.decode(F.col("body"), charset).alias("html"),
            "target_uri",
        )
    extracted = hx.extract_html_text(pages, keep_cols=("target_uri",))
    # host extraction stays JVM-side (regex in codegen, no UDF); its pure
    # twin _host_of is what the unit tests pin the regex against
    docs = extracted.select(
        F.col("text_clean").alias("text"),
        F.lower(
            F.regexp_extract(
                "target_uri",
                r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?:#]+)",
                1,
            )
        ).alias("source"),
    )
    return cp.conform(docs, id_col=None, lang_col=None, source_col="source")


# ---------------------------------------------------------------------------
# deterministic synthetic WARC corpus (oracle fixture — same discipline as
# html.synthetic_html_docs / multimodal.synthetic_format_assets: the DuckDB
# twin predicts the LOGICAL ingest result from (doc_id, text, source)
# alone, while the Spark side must decode real gzip members, real chunked
# HTTP and real markup to hash-match)
# ---------------------------------------------------------------------------

_WARC_DATE = "2026-01-01T00:00:00Z"
N_WARC_SEGMENTS = 16


def _http_response_bytes(body: bytes, content_type: str, status: int = 200,
                         chunked: bool = False) -> bytes:
    reason = {200: "OK", 404: "Not Found"}.get(status, "X")
    head = [f"HTTP/1.1 {status} {reason}".encode(),
            b"Content-Type: " + content_type.encode()]
    if chunked:
        head.append(b"Transfer-Encoding: chunked")
        chunks, pos = [], 0
        while pos < len(body):
            part = body[pos : pos + 13]
            chunks.append(f"{len(part):x}".encode() + _CRLF + part + _CRLF)
            pos += 13
        chunks.append(b"0" + _CRLF + _CRLF)
        payload = b"".join(chunks)
    else:
        head.append(f"Content-Length: {len(body)}".encode())
        payload = body
    return _CRLF.join(head) + _CRLF + _CRLF + payload


def _warc_record_bytes(warc_type: str, content: bytes, *,
                       record_id: str, target_uri: str = "") -> bytes:
    hdr = [b"WARC/1.0",
           b"WARC-Type: " + warc_type.encode(),
           b"WARC-Record-ID: <" + record_id.encode() + b">",
           b"WARC-Date: " + _WARC_DATE.encode()]
    if target_uri:
        hdr.append(b"WARC-Target-URI: " + target_uri.encode())
    if warc_type == "response":
        hdr.append(b"Content-Type: application/http; msgtype=response")
    hdr.append(f"Content-Length: {len(content)}".encode())
    return _CRLF.join(hdr) + _CRLF + _CRLF + content + _CRLF + _CRLF


def synth_warc_segment(rows, gzip_members: bool) -> bytes:
    """One structurally-real WARC segment from [(doc_id, source, html)]:
    a warcinfo record, one response per doc (chunked transfer when
    doc_id % 3 == 0), plus two trap responses the ingest filter must drop
    (a 404 and a text/plain 200). ``gzip_members`` emits the CommonCrawl
    one-gzip-member-per-record concatenation."""
    import gzip as _gz

    recs = [_warc_record_bytes(
        "warcinfo", b"software: synthetic-fixture\r\n",
        record_id="urn:uuid:info",
    )]
    for doc_id, source, html in rows:
        body = html.encode("utf-8")
        recs.append(_warc_record_bytes(
            "response",
            _http_response_bytes(body, "text/html; charset=utf-8",
                                 chunked=(doc_id % 3 == 0)),
            record_id=f"urn:uuid:doc-{doc_id}",
            target_uri=f"https://{source}.example.org/doc/{doc_id}",
        ))
    recs.append(_warc_record_bytes(
        "response", _http_response_bytes(b"gone", "text/html", status=404),
        record_id="urn:uuid:trap-404",
        target_uri="https://trap.example.org/404",
    ))
    recs.append(_warc_record_bytes(
        "response", _http_response_bytes(b"robots: none", "text/plain"),
        record_id="urn:uuid:trap-plain",
        target_uri="https://trap.example.org/robots.txt",
    ))
    if gzip_members:
        return b"".join(
            _gz.compress(r, compresslevel=1, mtime=0) for r in recs
        )
    return b"".join(recs)


def synthetic_warc_files(docs: DataFrame,
                         n_segments: int = N_WARC_SEGMENTS) -> DataFrame:
    """(path, content) — the documents table packed into ``n_segments``
    WARC segment blobs (segment = doc_id % n, even segments gzip-membered,
    odd segments plain), each response body the ``html.synth_html`` markup
    of the doc. ONE keyed shuffle to co-locate each segment's docs (fixture
    scale; a real crawl arrives already segmented on disk)."""
    from kausaldb_spark.sources import html as hx

    n_cls = len(hx.HTML_CLASSES)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_seg"].iloc[0])
        rows = sorted(
            (int(i), str(s), hx.synth_html(int(i) % n_cls, int(i), str(t)))
            for i, s, t in zip(pdf["doc_id"], pdf["source"], pdf["text"])
        )
        blob = synth_warc_segment(
            [(i, s, h) for i, s, h in rows], gzip_members=(seg % 2 == 0)
        )
        ext = "warc.gz" if seg % 2 == 0 else "warc"
        return pd.DataFrame(
            {"path": [f"synthetic://crawl/segment-{seg:05d}.{ext}"],
             "content": [blob]}
        )

    return (
        docs.select("doc_id", "source", "text")
        .withColumn("_seg", (F.col("doc_id") % n_segments).cast("int"))
        .groupBy("_seg")
        .applyInPandas(build, "path string, content binary")
    )

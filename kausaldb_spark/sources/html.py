"""HTML -> text extraction (the first stage of a real web-corpus pipeline).

The reference ingests source files and text documents
(``/root/reference/src/ingestion/pipeline.zig``); a 100 TB training-data
corpus, by contrast, overwhelmingly arrives as crawled HTML. This module
supplies that missing front end, Spark-first:

- ``extract_html_text``: one Arrow-batched ``mapInPandas`` stage turning an
  ``html`` string column into clean text + link/boilerplate stats. Map-only
  (zero shuffles) — it rides the corpus scan exactly like ``c4_rules``, so
  at 100 TB it is embarrassingly parallel and never the bottleneck.
- ``extract_links``: the same tokenizer emitting one row per anchor
  (``doc_id, url, anchor_text``) — feeds ``text.extract_domains`` /
  ``domain_flags`` blocklists and link-graph construction.
- a deterministic synthetic HTML corpus (``HTML_CLASSES`` /
  ``synthetic_html_docs``) with the same oracle discipline as
  ``multimodal.FORMAT_CLASSES``: the DuckDB twin recomputes the EXPECTED
  extraction from (doc_id, text) alone, while the Spark side must actually
  tokenize real markup — entity decoding, script/comment traps, attribute
  quoting, link-density boilerplate — to hash-match.

Extraction contract (what the oracle and the unit pins assert):

1. ``<script>``/``<style>``/``<template>``/``<noscript>`` subtree text is
   dropped; comments and CDATA are dropped; entities (named + numeric) are
   decoded.
2. Block-level boundaries (``p div br hr li ul ol h1..h6 tr table nav
   header footer section article aside main blockquote pre form dl dt dd
   figure figcaption address center title``) split the output into lines;
   inline tags (``span a b i em strong code ...``) do not.
3. Each line is whitespace-normalized (runs collapsed to one space,
   trimmed); empty lines vanish.
4. Boilerplate rule (Readability/jusText-style link density, made exact):
   a line whose non-whitespace characters are >= ``LINK_DENSITY_MAX``
   (0.8) inside ``<a>`` elements is dropped and counted in
   ``n_dropped_boiler``. Pure-navigation lines are 100% anchored, body
   prose is 0% — the rule is deterministic on real nav/footer markup, not
   a tuned heuristic.
5. ``n_links`` counts every ``<a>`` start tag, including ones on dropped
   lines (the link graph exists even when the text is boilerplate).

Parsing uses the stdlib tolerant tokenizer (``html.parser``), run inside
Arrow batches — never row-at-a-time Python. At 100 TB the stage is
CPU-bound Python; the batch boundary is the documented cost and the
alternative (a JVM-side regex strip) cannot implement entity decoding,
comment traps, or link density correctly.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LINK_DENSITY_MAX = 0.8

# content inside these elements never reaches the output
_SUPPRESS = {"script", "style", "template", "noscript"}

# tags that terminate the current output line (HTML block-level display
# plus explicit breaks); everything else is inline
_BLOCK = {
    "p", "div", "br", "hr", "li", "ul", "ol", "h1", "h2", "h3", "h4",
    "h5", "h6", "tr", "table", "thead", "tbody", "tfoot", "nav", "header",
    "footer", "section", "article", "aside", "main", "blockquote", "pre",
    "form", "fieldset", "dl", "dt", "dd", "figure", "figcaption",
    "address", "center", "title", "body", "html", "head",
}


class _Extractor(HTMLParser):
    """Line-building tokenizer implementing the module contract."""

    def __init__(self) -> None:
        # convert_charrefs=True decodes named + numeric entities into
        # handle_data text (the k=2 fixture class exists to prove it)
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self.n_links = 0
        self.n_dropped = 0
        self.links: list[tuple[str, str]] = []  # (url, anchor_text)
        self._buf: list[str] = []
        self._suppress = 0
        self._anchor = 0
        self._anchor_buf: list[str] = []
        self._anchor_href: str | None = None
        self._nonws = 0
        self._anchored_nonws = 0

    # -- line assembly ---------------------------------------------------
    def _flush_line(self) -> None:
        text = " ".join("".join(self._buf).split())
        nonws, anchored = self._nonws, self._anchored_nonws
        self._buf, self._nonws, self._anchored_nonws = [], 0, 0
        if not text:
            return
        if nonws > 0 and anchored / nonws >= LINK_DENSITY_MAX:
            self.n_dropped += 1
            return
        self.lines.append(text)

    # -- tokenizer callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SUPPRESS:
            self._suppress += 1
            return
        if self._suppress:
            return
        if tag == "a":
            self.n_links += 1
            self._anchor += 1
            if self._anchor == 1:
                self._anchor_buf = []
                self._anchor_href = next(
                    (v for k, v in attrs if k == "href" and v), None
                )
        if tag in _BLOCK:
            self._flush_line()

    def handle_startendtag(self, tag, attrs):
        # <br/> and friends: same boundary semantics as a start tag. A
        # self-closing suppress tag (<script/>, XHTML-style) is an EMPTY
        # element: close it immediately, or the unmatched _suppress
        # increment would silently swallow the rest of the document.
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _SUPPRESS:
            self._suppress = max(0, self._suppress - 1)
            return
        if self._suppress:
            return
        if tag == "a" and self._anchor:
            self._anchor -= 1
            if self._anchor == 0:
                anchor_text = " ".join("".join(self._anchor_buf).split())
                self.links.append((self._anchor_href or "", anchor_text))
                self._anchor_href = None
        if tag in _BLOCK:
            self._flush_line()

    def handle_data(self, data):
        if self._suppress or not data:
            return
        self._buf.append(data)
        n = sum(1 for c in data if not c.isspace())
        self._nonws += n
        if self._anchor:
            self._anchored_nonws += n
            self._anchor_buf.append(data)

    def close(self):
        super().close()
        self._flush_line()


def extract_text(html: str) -> dict:
    """Extract one HTML document per the module contract. Returns
    ``{"text_clean", "n_links", "n_dropped_boiler", "links"}``."""
    p = _Extractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # the stdlib tokenizer is tolerant by design; a genuinely
        # unparseable tail keeps whatever was extracted before it
        p._flush_line()
    return {
        "text_clean": "\n".join(p.lines),
        "n_links": p.n_links,
        "n_dropped_boiler": p.n_dropped,
        "links": p.links,
    }


def extract_html_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, keep_cols..., text_clean, n_links, n_dropped_boiler) — the
    extraction stage.

    One Arrow ``mapInPandas`` pass, map-only: no shuffle, no join; the
    stage fuses onto the source scan. ``keep_cols`` carries metadata
    (target_uri, crawl date, ...) THROUGH the stage so a consumer never
    has to self-join back to the pre-extraction frame — on a crawl-scale
    input that join would re-run the whole upstream parse chain. Per-row
    failures cannot occur by construction (the tokenizer is tolerant), so
    there is no error column."""
    keep = list(keep_cols)
    in_schema = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )
    out_schema = ", ".join(
        [f"{id_col} long"]
        + [f"{c} {in_schema[c]}" for c in keep]
        + ["text_clean string", "n_links int", "n_dropped_boiler int"]
    )

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [extract_text(h) for h in pdf[html_col].astype("string")]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "text_clean": pd.Series(
                        [r["text_clean"] for r in rows], dtype="string"
                    ),
                    "n_links": pd.Series(
                        [r["n_links"] for r in rows], dtype="int32"
                    ),
                    "n_dropped_boiler": pd.Series(
                        [r["n_dropped_boiler"] for r in rows], dtype="int32"
                    ),
                }
            )
            for i, c in enumerate(keep):
                out.insert(i + 1, c, pdf[c].reset_index(drop=True))
            yield out

    return df.select(id_col, *keep, html_col).mapInPandas(
        batch_fn, out_schema
    )


def extract_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, anchor_text) — one row per ``<a>`` with an href. Feeds
    ``text.extract_domains``/``domain_flags`` and link-graph builds; the
    same single tokenizer pass as ``extract_html_text``, map-only."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, urls, texts = [], [], []
            for i, h in zip(
                pdf[id_col].astype("int64"), pdf[html_col].astype("string")
            ):
                for url, anchor in extract_text(h)["links"]:
                    if url:
                        ids.append(int(i))
                        urls.append(url)
                        texts.append(anchor)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "url": pd.Series(urls, dtype="string"),
                    "anchor_text": pd.Series(texts, dtype="string"),
                }
            )

    return df.select(id_col, html_col).mapInPandas(
        batch_fn, f"{id_col} long, url string, anchor_text string"
    )


# ---------------------------------------------------------------------------
# deterministic synthetic HTML corpus (oracle fixture)
# ---------------------------------------------------------------------------

# class k = doc_id % 6 -> (n_links, n_dropped_boiler, word_lines).
# word_lines=True means the payload is emitted one word per <li>, so the
# expected text_clean is the corpus text with spaces replaced by newlines;
# otherwise expected text_clean == the (whitespace-normalized) corpus text.
# The DuckDB twin is GENERATED from this table (__spark_entry__), so the
# taxonomy cannot drift from the markup builder below.
HTML_CLASSES: list[tuple[int, int, bool]] = [
    (0, 0, False),  # k=0 bare paragraph
    (0, 0, False),  # k=1 script/style/comment traps
    (0, 0, False),  # k=2 numeric-entity-encoded payload in inline spans
    (4, 2, False),  # k=3 nav (3 links) + footer (1 link) boilerplate
    (0, 0, True),   # k=4 one word per <li>
    (1, 1, False),  # k=5 attribute quoting traps, uppercase tags, <br/>
]


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _ent(s: str) -> str:
    """Every char as a numeric entity (hex/dec alternating)."""
    return "".join(
        f"&#x{ord(c):x};" if i % 2 == 0 else f"&#{ord(c)};"
        for i, c in enumerate(s)
    )


def synth_html(k: int, doc_id: int, text: str) -> str:
    """Structurally real markup for class ``k`` wrapping ``text`` so that a
    correct extractor recovers exactly the HTML_CLASSES-predicted output."""
    e = _esc(text)
    if k == 0:
        return f"<html><body><p>{e}</p></body></html>"
    if k == 1:
        return (
            "<html><head><style>p { color: red; }</style>"
            '<script>if (a<b) { s = "<p>script trap</p>"; }</script></head>'
            "<body><!-- <p>comment trap</p> -->"
            f"<p>{e}</p><script>var y=2;</script></body></html>"
        )
    if k == 2:
        words = text.split()
        parts = [
            f"<span>{_ent(w)}</span>" if i % 2 == 0 else f"<b>{_esc(w)}</b>"
            for i, w in enumerate(words)
        ]
        return f"<html><body><p>{' '.join(parts)}</p></body></html>"
    if k == 3:
        nav = " ".join(
            f'<a href="https://nav{j}.example.com/{doc_id}">{lbl}</a>'
            for j, lbl in enumerate(("Home", "About", "Contact"))
        )
        return (
            f"<html><body><nav>{nav}</nav><p>{e}</p>"
            f'<footer><a href="https://nav9.example.com/{doc_id}">Privacy'
            "</a></footer></body></html>"
        )
    if k == 4:
        items = "".join(f"<li>{_esc(w)}</li>" for w in text.split())
        return f"<html><body><ul>{items}</ul></body></html>"
    if k == 5:
        return (
            '<HTML><BODY><DIV CLASS="x>y" data-q=\'a<b\'>'
            f"<P>{e}</P><BR/>"
            f'<A HREF="https://f{doc_id}.example.com/x">ref</A>'
            "</DIV></BODY></HTML>"
        )
    raise ValueError(f"unknown HTML class {k}")


def synthetic_html_docs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) keyed off the documents table — same discipline as
    ``multimodal.synthetic_format_assets``: the oracle recomputes expected
    extraction from (id % 6, text) alone while the Spark side must
    tokenize the actual markup."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "html": pd.Series(
                        [
                            synth_html(int(i) % len(HTML_CLASSES), int(i), t)
                            for i, t in zip(ids, pdf["text"].astype("string"))
                        ],
                        dtype="string",
                    ),
                }
            )

    return docs.select(id_col, "text").mapInPandas(
        batch_fn, f"{id_col} long, html string"
    )

"""HTML -> text extraction pins (sources/html.py).

The oracle-gated driver entry (`html_extract`) proves the class taxonomy on
the full corpus; these tests pin the extractor CONTRACT itself on crafted
and generated markup — the cases a hash mismatch would only report, not
localize.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kausaldb_spark.sources import html as hx


def _x(html):
    return hx.extract_text(html)


def test_script_style_comment_suppressed_including_traps():
    r = _x(
        "<html><head><style>p {a: 1}</style>"
        '<script>if (a<b) { s = "<p>trap</p>"; }</script></head>'
        "<body><!-- <p>comment trap</p> --><p>real</p>"
        "<noscript>hidden</noscript><template>tmpl</template></body>"
    )
    assert r["text_clean"] == "real"
    assert r["n_links"] == 0 and r["n_dropped_boiler"] == 0


def test_entities_decoded_named_and_numeric():
    r = _x("<p>a &amp; b &lt;c&gt; &#x41;&#66;</p>")
    assert r["text_clean"] == "a & b <c> AB"


def test_block_vs_inline_boundaries():
    r = _x("<div>one <span>two</span> <b>three</b></div><p>four</p>five<br>six")
    assert r["text_clean"] == "one two three\nfour\nfive\nsix"


def test_whitespace_collapsed_within_lines_and_empty_lines_dropped():
    r = _x("<p>  a \t b\n c  </p><p>   </p><p>d</p>")
    assert r["text_clean"] == "a b c\nd"


def test_link_density_drops_pure_nav_but_counts_links():
    r = _x(
        '<nav><a href="u1">Home</a> <a href="u2">About</a></nav>'
        '<p>body text with a single <a href="u3">link</a> inside prose</p>'
    )
    # nav line is 100% anchored -> dropped; prose line is ~7% -> kept
    assert r["text_clean"] == "body text with a single link inside prose"
    assert r["n_links"] == 3
    assert r["n_dropped_boiler"] == 1


def test_link_density_threshold_is_nonws_chars():
    # 4 anchored non-ws chars of 5 total = 0.8 -> dropped (>= threshold)
    r = _x('<p><a href="u">abcd</a> e</p>')
    assert r["text_clean"] == ""
    assert r["n_dropped_boiler"] == 1
    # 4 of 6 = 0.67 -> kept
    r = _x('<p><a href="u">abcd</a> ef</p>')
    assert r["text_clean"] == "abcd ef"


def test_uppercase_tags_and_attribute_quoting_traps():
    r = _x(
        '<DIV CLASS="x>y" data-q=\'a<b\'><P>payload</P>'
        '<A HREF="https://e.com/1">ref</A></DIV>'
    )
    assert r["text_clean"] == "payload"
    assert r["n_links"] == 1 and r["n_dropped_boiler"] == 1


def test_malformed_tail_keeps_extracted_prefix():
    r = _x("<p>kept</p><p>also kept<unclosed attr=")
    assert r["text_clean"].startswith("kept\nalso kept")


def test_extract_links_payloads():
    r = _x(
        '<p><a href="https://a.com/x">first link</a> and '
        "<a>no-href anchor</a></p>"
    )
    assert r["links"] == [("https://a.com/x", "first link"), ("", "no-href anchor")]


def test_empty_and_none_input():
    assert _x("")["text_clean"] == ""
    assert _x(None)["text_clean"] == ""


WORDS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(words=WORDS, doc_id=st.integers(min_value=0, max_value=10**9))
def test_all_classes_round_trip(words, doc_id):
    """Every HTML_CLASSES builder wraps arbitrary word payloads such that
    extraction recovers exactly the class-predicted output — the same
    invariant the DuckDB twin asserts corpus-wide."""
    text = " ".join(words)
    norm_words = text.split()
    for k, (n_links, n_dropped, word_lines) in enumerate(hx.HTML_CLASSES):
        r = _x(hx.synth_html(k, doc_id, text))
        expected = "\n".join(norm_words) if word_lines else " ".join(norm_words)
        assert r["text_clean"] == expected, (k, text)
        assert r["n_links"] == n_links
        assert r["n_dropped_boiler"] == n_dropped


def test_spark_stage_matches_pure_python_and_is_map_only(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(12)),
            "text": [f"alpha beta{i} gamma delta" for i in range(12)],
        }
    )
    docs = spark.createDataFrame(pdf)
    out = hx.extract_html_text(hx.synthetic_html_docs(docs))
    # map-only: the whole chain fuses onto the scan, zero shuffles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(12):
        exp = hx.extract_text(hx.synth_html(i % 6, i, pdf["text"][i]))
        assert got[i]["text_clean"] == exp["text_clean"]
        assert got[i]["n_links"] == exp["n_links"]
        assert got[i]["n_dropped_boiler"] == exp["n_dropped_boiler"]


def test_extract_links_spark(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 4], "text": ["a b", "c d"]})
    )
    # class 3 = nav+footer (4 hrefs), class 4 = list (0 hrefs)
    links = hx.extract_links(hx.synthetic_html_docs(docs)).collect()
    by_doc = {}
    for r in links:
        by_doc.setdefault(r["doc_id"], []).append(r["url"])
    assert sorted(by_doc[3]) == [
        "https://nav0.example.com/3",
        "https://nav1.example.com/3",
        "https://nav2.example.com/3",
        "https://nav9.example.com/3",
    ]
    assert 4 not in by_doc


def test_self_closing_suppress_tag_does_not_swallow_document():
    """r11 ADVICE: an XHTML-style <script src=.../> must be treated as an
    EMPTY element — before the fix the unmatched _suppress increment
    silently dropped all text after it."""
    r = _x('<p>before</p><script src="x.js"/><p>after</p>')
    assert r["text_clean"] == "before\nafter"
    r2 = _x("<p>a</p><template/><noscript/><style/><p>b</p>")
    assert r2["text_clean"] == "a\nb"
    # a real (paired) script is still suppressed afterwards
    r3 = _x('<script src="x.js"/><script>var a = "<p>t</p>";</script><p>ok</p>')
    assert r3["text_clean"] == "ok"

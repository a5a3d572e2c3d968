"""Link-graph curation signals (functions/linkgraph.py). The three driver
entries (`link_graph`, `anchor_topk`, `link_pagerank`) hash-gate the full
corpus; these pin the operator contracts and the fixture coupling the
twins rely on."""

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.functions import linkgraph as lg
from kausaldb_spark.sources import html as hx


def _pagerank_ref(edges, n_iter=5):
    """Independent integer-ppm PageRank model (plain dict arithmetic)."""
    e = sorted(set(edges))
    nodes = sorted({x for p in e for x in p})
    out = {}
    for s, _d in e:
        out[s] = out.get(s, 0) + 1
    r = {n: lg.PR_INIT_PPM for n in nodes}
    for _ in range(n_iter):
        m = dict.fromkeys(nodes, 0)
        for s, d in e:
            m[d] += r[s] // out[s]
        r = {
            n: lg.PR_BASE_PPM + (lg.PR_DAMP_NUM * m[n]) // lg.PR_DAMP_DEN
            for n in nodes
        }
    return r


def test_pagerank_matches_integer_model(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
             ("a", "b")]  # parallel edge must collapse
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["rank_ppm"] for r in lg.pagerank(df, 5).collect()}
    assert got == _pagerank_ref(edges, 5)
    # hub ordering sanity: c (3 in-edges) outranks b (1)
    assert got["c"] > got["b"]
    # dangling node d never receives mass -> floor rank
    assert got["d"] == lg.PR_BASE_PPM


def test_pagerank_iteration_count_matters(spark):
    edges = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    r1 = {r["host"]: r["rank_ppm"] for r in lg.pagerank(df, 1).collect()}
    assert r1 == _pagerank_ref(edges, 1)


def test_anchor_topk_ties_and_k(spark):
    rows = [
        (1, "https://t.example.com/x", "alpha beta"),
        (2, "https://t.example.com/y", "beta gamma"),
        (3, "https://t.example.com/z", "  Beta   ALPHA "),
        (4, "https://u.example.com/", ""),
    ]
    links = spark.createDataFrame(
        rows, "doc_id long, url string, anchor_text string"
    )
    got = [
        (r["dst_host"], r["term"], r["n_anchors"], r["rank"])
        for r in lg.anchor_terms_topk(links, k=2)
        .orderBy("dst_host", "rank").collect()
    ]
    # beta(3) > alpha(2) > gamma(1); k=2 cuts gamma; empty anchor drops;
    # tokens lowercase + whitespace-normalized
    assert got == [
        ("t.example.com", "beta", 3, 1),
        ("t.example.com", "alpha", 2, 2),
    ]


def test_fixture_links_match_twin_prediction_per_class():
    """The _LINKS_CTE twin prediction (class 3 -> nav0/1/2/9 with
    Home/About/Contact/Privacy, class 5 -> f{id} with 'ref', others none)
    must match what the REAL extractor pulls from the real markup."""
    text = "some page words here"
    expected = {
        3: [
            (f"https://nav0.example.com/{9}", "Home"),
            (f"https://nav1.example.com/{9}", "About"),
            (f"https://nav2.example.com/{9}", "Contact"),
            (f"https://nav9.example.com/{9}", "Privacy"),
        ],
        5: [(f"https://f{11}.example.com/x", "ref")],
    }
    for k in range(len(hx.HTML_CLASSES)):
        doc_id = k + 6  # keeps doc_id % 6 == k
        html = hx.synth_html(k, doc_id, text)
        got = hx.extract_text(html)["links"]
        want = expected.get(k, [])
        # normalize the expected ids for the k=3 / k=5 rows above
        want = [
            (u.replace("/9", f"/{doc_id}").replace("f11", f"f{doc_id}"), a)
            for (u, a) in want
        ]
        assert got == want, (k, got, want)


def test_link_edges_host_extraction(spark):
    docs = spark.createDataFrame(
        [(1, "srca"), (2, "srcb")], "doc_id long, source string"
    )
    links = spark.createDataFrame(
        [
            (1, "https://User@Sub.Example.COM:8443/p?q", "x"),
            (2, "no-scheme.net/path", "y"),
        ],
        "doc_id long, url string, anchor_text string",
    )
    got = sorted(
        map(tuple, lg.link_edges(links, docs, host_suffix=".example.org")
            .collect())
    )
    assert got == [
        ("srca.example.org", "sub.example.com"),
        ("srcb.example.org", "no-scheme.net"),
    ]


def test_link_graph_counts_multiplicity(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")],
        "src_host string, dst_host string",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in lg.link_graph(edges).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_crawl_frontier_composition(spark):
    """canonicalize -> robots -> anti-join fetched -> per-host cap, on a
    crafted relation exercising every gate at once (the driver entry
    hash-gates the corpus-wide composition)."""
    from kausaldb_spark.sources import frontier as fr
    from kausaldb_spark.sources import robots as rb

    links = spark.createDataFrame(
        [
            # spelling variants of ONE page (port + fragment + tracking)
            (1, "https://A.example.com:443/p?utm_source=x#frag", "t"),
            (2, "https://a.example.com/p", "t"),
            (3, "https://a.example.com/q", "t"),
            (4, "https://a.example.com/r", "t"),
            (5, "https://blocked.example.com/x", "t"),
            (6, "https://seen.example.com/old?utm_y=1", "t"),
            (7, "ftp://not-http.example.com/x", "t"),
        ],
        "doc_id long, url string, anchor_text string",
    )
    fetched = spark.createDataFrame(
        [("https://SEEN.example.com/old",)], "url string"
    )
    hosts = spark.createDataFrame(
        [("blocked.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, content string",
    )
    rules = rb.robots_rules(hosts, "bot")
    got = sorted(
        (r["url"], r["host"], r["slot"])
        for r in fr.crawl_frontier(
            links, fetched=fetched, rules=rules, per_host_cap=2
        ).collect()
    )
    # a.example.com: variants collapse to /p, then /q, /r -> cap 2 keeps
    # /p, /q; blocked host robots-denied; seen url (canonicalized on BOTH
    # sides) anti-joined; ftp excluded
    assert got == [
        ("https://a.example.com/p", "a.example.com", 1),
        ("https://a.example.com/q", "a.example.com", 2),
    ]

"""Link-graph curation signals for web corpora.

A crawl's link structure is a first-class quality prior for training-data
curation (host-level centrality feeds spam/boilerplate demotion the same
way Gopher rules feed document gates), and anchor text is the classic
external description of a page. This module derives both from the
``sources.html.extract_links`` relation:

- :func:`link_edges` / :func:`link_graph` — the host-level directed graph
  (src host -> dst host, multiplicity), pure codegen (the host extraction
  is the same regex the WARC ingest path pins against its pure twin);
- :func:`anchor_terms_topk` — per-destination-host top-k anchor terms
  (salted two-phase top-k is unnecessary here: the per-(host, term)
  aggregate is the heavy reduction and it map-side-combines);
- :func:`pagerank` — fixed-iteration damped PageRank in INTEGER ppm
  arithmetic, so the result is bit-exact across engines (floats would
  diverge under join-order-dependent summation; the DuckDB oracle runs
  the identical integer recursion as a recursive CTE).

Scale shape (100 TB): the edge list is slim (two host strings per anchor)
and every stage is one keyed shuffle with map-side combine. PageRank is
``n_iter`` joins over (node, rank) — the canonical iterative-dataflow
shape; at cluster scale, checkpoint the rank relation every few
iterations to truncate lineage (documented, not needed at test scale with
n_iter <= 8). Dangling-node mass is dropped, not redistributed — for a
QUALITY PRIOR the absolute normalization is irrelevant (ranks are used
ordinally) and dropping keeps the arithmetic exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: same public-URI host regex the WARC ingest path uses (pinned against
#: the pure-python twin in tests/test_warc.py)
HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?:#]+)"

#: PageRank constants in parts-per-million: rank starts at 1.0 (1_000_000
#: ppm), damping 0.85 -> r' = 150_000 + (850 * in_mass) DIV 1000, all in
#: bigint arithmetic (exact in both engines)
PR_INIT_PPM = 1_000_000
PR_BASE_PPM = 150_000
PR_DAMP_NUM, PR_DAMP_DEN = 850, 1000


def host_of(url: Column) -> Column:
    """Registered host of a URL, lowercased ('' when unparseable)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def link_edges(
    links: DataFrame, docs: DataFrame, id_col: str = "doc_id",
    source_col: str = "source", host_suffix: str = "",
) -> DataFrame:
    """(src_host, dst_host) — one row per anchor, hosts lowercased.
    ``links`` is the extract_links relation (doc_id, url, anchor_text);
    ``docs`` supplies each doc's own host (its ``source`` column, plus an
    optional ``host_suffix`` for corpora whose source is a bare label).
    One slim join on doc_id (AQE broadcasts the smaller side)."""
    src = docs.select(
        F.col(id_col),
        F.lower(F.concat(F.col(source_col), F.lit(host_suffix))).alias(
            "src_host"
        ),
    )
    return links.join(src, id_col).select(
        "src_host", host_of(F.col("url")).alias("dst_host")
    )


def link_graph(edges: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the weighted host graph. One keyed
    shuffle with map-side combine."""
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("bigint").alias("n_links")
    )


def anchor_terms_topk(links: DataFrame, k: int = 3) -> DataFrame:
    """(dst_host, term, n_anchors, rank) — the top-``k`` anchor-text terms
    pointing at each host (rank 1 = most frequent; ties break to the
    lexicographically smaller term, so the relation is deterministic).
    The (host, term) count map-side-combines; the per-host top-k is a
    bounded window over the already-reduced relation."""
    from pyspark.sql.window import Window

    terms = links.select(
        host_of(F.col("url")).alias("dst_host"),
        F.explode(
            F.split(F.trim(F.lower(F.col("anchor_text"))), r"\s+")
        ).alias("term"),
    ).where(F.col("term") != "")
    counts = terms.groupBy("dst_host", "term").agg(
        F.count("*").cast("bigint").alias("n_anchors")
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_anchors").desc(), F.col("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def pagerank(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """(host, rank_ppm) — damped PageRank after exactly ``n_iter``
    synchronous iterations, in bigint ppm arithmetic (see module header).
    Parallel edges collapse first (DISTINCT) so multiplicity doesn't skew
    out-degree; every node appearing as src or dst participates.

    The deduped edge relation is PERSISTED for the computation: it is
    consumed by every iteration (plus the node/out-degree derivations),
    and without the cache each iteration would re-evaluate the edge
    lineage — for a crawl-derived graph that is a full corpus re-parse
    per iteration. The cached relation is slim (two host strings per
    edge); it stays cached for the session (the caller can
    ``.unpersist()`` it via the DataFrame lineage if the session is
    long-lived — the bench/driver sessions are per-run)."""
    from pyspark import StorageLevel

    e = edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    ranks = nodes.select("host", F.lit(PR_INIT_PPM).cast("bigint").alias("r"))
    contrib_edges = e.join(outdeg, "src")
    for _ in range(n_iter):
        mass = (
            contrib_edges.join(
                ranks.withColumnRenamed("host", "src"), "src"
            )
            .select("dst", F.expr("r DIV d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("m"))
        )
        ranks = nodes.join(
            mass.withColumnRenamed("dst", "host"), "host", "left"
        ).select(
            "host",
            (
                F.lit(PR_BASE_PPM)
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(m, 0L)) DIV {PR_DAMP_DEN}"
                )
            ).cast("bigint").alias("r"),
        )
    return ranks.select("host", F.col("r").alias("rank_ppm"))

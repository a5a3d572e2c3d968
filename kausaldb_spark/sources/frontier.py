"""Crawl-frontier assembly — "what do we fetch next".

The discovery half of an incremental crawl: take the outlinks the last
batch's pages surfaced (``sources.html.extract_links``), reduce them to a
deterministic, polite, deduplicated fetch list. Composes the gated
primitives end-to-end:

    outlinks ──canonical_url──▶ distinct candidates
             ──filter_urls_by_robots──▶ admissible
             ──anti-join fetched──▶ novel
             ──per-host cap──▶ the next batch

Scale shape: canonicalization is pure codegen at scan throughput; the
candidate set reduces by DISTINCT before anything touches it (one keyed
shuffle of slim url strings); the robots gate broadcasts; the fetched
anti-join is url-keyed (both sides canonical, so it prunes); the per-host
politeness cap is a bounded window over the already-reduced relation —
per-host state is ``per_host_cap`` rows. Nothing here scales with corpus
TEXT, only with the link relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kausaldb_spark.functions import text as tx
from kausaldb_spark.functions.linkgraph import host_of


def crawl_frontier(
    links: DataFrame,
    fetched: DataFrame | None = None,
    rules: DataFrame | None = None,
    per_host_cap: int = 100,
    url_col: str = "url",
    n_salts: int = 32,
) -> DataFrame:
    """(url, host, slot) — the next crawl batch. ``url`` is canonical;
    ``slot`` (1-based, <= ``per_host_cap``) is the url's deterministic
    position within its host (ordered by canonical url, so two engines —
    and two runs — produce the identical batch). ``fetched`` is any
    relation with ``url_col`` (canonicalized here too, so spelling
    variants of an already-fetched page can't re-enter the frontier);
    ``rules`` is a :func:`kausaldb_spark.sources.robots.robots_rules`
    relation.

    The politeness cap is the exact salted TWO-PHASE top-k (the
    stratified_sample pattern): a mega-host with 10^8 discovered urls
    must never funnel through one window sort task — phase 1 caps each
    (host, crc32(url) % n_salts) slice, phase 2 re-ranks the
    <= n_salts * cap survivors per host exactly. Row-identical to the
    single-window form (the global per-host top-k is a subset of the
    union of per-salt top-ks)."""
    cand = (
        links.select(tx.canonical_url(F.col(url_col)).alias("url"))
        .where(F.col("url").rlike(r"^https?://"))
        .distinct()
    )
    if rules is not None:
        from kausaldb_spark.sources.robots import filter_urls_by_robots

        cand = filter_urls_by_robots(cand, rules)
    if fetched is not None:
        seen = fetched.select(
            tx.canonical_url(F.col(url_col)).alias("url")
        ).distinct()
        cand = cand.join(seen, "url", "left_anti")
    with_host = cand.select(
        "url", host_of(F.col("url")).alias("host")
    ).withColumn("_salt", F.crc32(F.col("url")) % n_salts)
    w_local = Window.partitionBy("host", "_salt").orderBy("url")
    survivors = (
        with_host.withColumn("_lrnk", F.row_number().over(w_local))
        .where(F.col("_lrnk") <= per_host_cap)
    )
    w_exact = Window.partitionBy("host").orderBy("url")
    return (
        survivors.withColumn("slot", F.row_number().over(w_exact).cast("int"))
        .where(F.col("slot") <= per_host_cap)
        .select("url", "host", "slot")
    )


def fetch_schedule(due_urls: DataFrame, crawl_delays: DataFrame | None = None,
                   default_delay_s: int = 5,
                   batch_window_s: int = 3600) -> DataFrame:
    """Politeness scheduling — "when do we fetch it". Assigns every due
    URL a per-host time slot: rank within its host by (score_ppm DESC,
    url) — deterministic, highest-value first — then
    ``slot_s = (rank-1) * delay``; URLs whose slot falls outside
    ``batch_window_s`` defer to the next cycle (``fits = 0``, kept so the
    deferral is countable, never silently dropped).

    ``crawl_delays`` is an optional (host, delay_s) relation (e.g. from
    robots.txt Crawl-delay lines); absent hosts use ``default_delay_s``.

    Scale shape: ONE window shuffle keyed by host over the already-due
    sliver (urls + integers, never content); the per-host row count is
    bounded upstream by the frontier cap, so no skewed-host window state.
    Output: (url, host, rank, delay_s, slot_s, fits)."""
    with_host = due_urls.withColumn("_h", host_of(F.col("url")))
    if crawl_delays is not None:
        with_host = with_host.join(
            F.broadcast(
                crawl_delays.select(
                    F.col("host").alias("_h"),
                    F.col("delay_s").cast("int").alias("_d"),
                )
            ),
            "_h", "left",
        )
    else:
        with_host = with_host.withColumn("_d", F.lit(None).cast("int"))
    delay = F.coalesce(F.col("_d"), F.lit(int(default_delay_s)))
    rank = F.row_number().over(
        Window.partitionBy("_h").orderBy(
            F.col("score_ppm").desc(), F.col("url")
        )
    )
    out = with_host.select(
        "url", F.col("_h").alias("host"),
        rank.alias("rank"), delay.cast("int").alias("delay_s"),
    ).withColumn(
        "slot_s", ((F.col("rank") - 1) * F.col("delay_s")).cast("bigint")
    ).withColumn(
        "fits", (F.col("slot_s") < F.lit(int(batch_window_s))).cast("int")
    )
    return out

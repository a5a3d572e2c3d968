"""robots.txt (RFC 9309, the Robots Exclusion Protocol) — crawl-pipeline
URL admission.

A production crawl pipeline filters its frontier (and retroactively, its
archive) against each host's robots rules; a training-data pipeline that
ingests crawl archives needs the same gate to honor exclusions. This
module implements the RFC 9309 semantics the public spec defines:

- **groups**: consecutive ``User-agent`` lines share the rule block that
  follows; the group whose user-agent token is the LONGEST match for the
  crawler's product token applies, with ``*`` as the fallback group;
- **rule matching**: ``Allow``/``Disallow`` values match as path
  prefixes, with ``*`` matching any character sequence and a trailing
  ``$`` anchoring the end of the path;
- **decision**: among all matching rules the MOST SPECIFIC (most octets
  in the pattern) wins; an Allow/Disallow tie at equal specificity
  resolves to Allow; no matching rule (or no robots.txt) means allowed;
  an empty ``Disallow:`` value matches nothing.

Percent-encoding equivalence (the RFC's %-normalization clause) is out of
scope and documented: the synthetic fixtures and crawl sources here emit
already-normalized paths.

Scale shape: robots relations are tiny (one row per host); parsing is a
map-only Arrow stage over the robots corpus, and the URL gate is a
BROADCAST join of (host -> compiled rule array) followed by pure-codegen
regexp matching + a struct max — the per-URL decision never leaves the
JVM, so the gate runs at frontier-scan throughput.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: java.util.regex metacharacters to escape in rule literals (Spark's
#: rlike is java regex; python's re.escape over-escapes but stays valid
#: in java for the characters robots paths can contain — EXCEPT we build
#: the pattern by hand below to keep the two engines' escaping identical)
_RE_SPECIALS = r"\.^$+?()[]{}|"


def _rule_regex(pattern: str) -> str:
    """Compile a robots path pattern to an anchored regex: ``*`` -> ``.*``,
    trailing ``$`` -> end anchor, everything else literal. The SAME string
    is a valid python and java regex (escaping by explicit backslash, no
    character-class shortcuts), so the pure twin and the Spark gate match
    identically."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if anchored_end:
        out.append("$")
    return "".join(out)


def parse_robots_txt(content: str, user_agent: str) -> list[dict]:
    """The rules applying to ``user_agent``: ``[{"allow": bool,
    "pattern": str, "re": str, "plen": int}]``. Group selection per RFC
    9309: the group(s) whose user-agent token is the longest match for
    ``user_agent`` (case-insensitive substring-token match, ``*``
    fallback); multiple groups for the same token merge."""
    ua = user_agent.lower()
    groups: dict[str, list] = {}
    current_tokens: list[str] = []
    last_was_ua = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            tok = value.lower()
            if last_was_ua:
                current_tokens.append(tok)
            else:
                current_tokens = [tok]
            for t in current_tokens:
                groups.setdefault(t, [])
            last_was_ua = True
        elif field in ("allow", "disallow"):
            last_was_ua = False
            if not current_tokens:
                continue  # rules before any user-agent line: ignored
            if not value and field == "disallow":
                continue  # empty Disallow matches nothing
            if not value:
                continue
            rule = {
                "allow": field == "allow",
                "pattern": value,
                "re": _rule_regex(value),
                "plen": len(value),
            }
            for t in current_tokens:
                groups[t].append(rule)
        else:
            last_was_ua = False  # sitemap/crawl-delay/... end the UA run
    # longest user-agent token that is a prefix-token match of ours
    best = None
    for tok in groups:
        if tok != "*" and (ua == tok or ua.startswith(tok)):
            if best is None or len(tok) > len(best):
                best = tok
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def robots_decision(rules: list[dict], path: str) -> bool:
    """True = allowed. Most-octets rule wins; Allow wins ties; no match
    (or no rules) allows."""
    best_len, best_allow = -1, True
    for r in rules:
        if re.match(r["re"], path):
            if r["plen"] > best_len or (
                r["plen"] == best_len and r["allow"] and not best_allow
            ):
                best_len, best_allow = r["plen"], r["allow"]
    return best_allow if best_len >= 0 else True


_RULES_SCHEMA = (
    "host string, rules array<struct<allow:boolean,re:string,plen:int>>"
)


def robots_rules(
    robots: DataFrame, user_agent: str,
    host_col: str = "host", content_col: str = "content",
) -> DataFrame:
    """(host, rules) — each host's compiled rule array for ``user_agent``.
    One map-only Arrow stage over the (tiny) robots corpus; the result is
    the broadcast side of :func:`filter_urls_by_robots`."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                rules = parse_robots_txt(str(content or ""), user_agent)
                rows.append(
                    (
                        host,
                        [(r["allow"], r["re"], r["plen"]) for r in rules],
                    )
                )
            yield pd.DataFrame(rows, columns=["host", "rules"])

    return robots.select(host_col, content_col).mapInPandas(
        batch_fn, _RULES_SCHEMA
    )


def _path_of(url: Column) -> Column:
    """URL path ('/' when absent) — pure codegen."""
    p = F.regexp_extract(url, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/]*(/.*)?$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def filter_urls_by_robots(
    urls: DataFrame, rules: DataFrame, url_col: str = "url",
    keep_denied: bool = False,
) -> DataFrame:
    """Gate a URL relation against per-host robots rules. Adds
    ``robots_allowed``; drops denied rows unless ``keep_denied``.

    Plan: broadcast the (host, rules) sliver, then the whole decision is
    codegen — ``filter(rules, r -> regexp_like(path, r.re))`` keeps the
    matching rules, and the RFC's most-octets/Allow-wins order is ONE
    ``array_max`` over ``struct(plen, allow)`` (struct ordering is
    field-by-field, exactly the tie rule). No Python per URL."""
    from kausaldb_spark.functions.linkgraph import host_of

    with_host = urls.withColumn("_h", host_of(F.col(url_col))).withColumn(
        "_p", _path_of(F.col(url_col))
    )
    joined = with_host.join(
        F.broadcast(rules.withColumnRenamed("host", "_h")), "_h", "left"
    )
    matched = F.filter(
        F.coalesce(
            F.col("rules"),
            F.array().cast(
                "array<struct<allow:boolean,re:string,plen:int>>"
            ),
        ),
        lambda r: F.regexp_like(F.col("_p"), r["re"]),
    )
    best = F.array_max(
        F.transform(
            matched, lambda r: F.struct(r["plen"].alias("plen"),
                                        r["allow"].alias("allow"))
        )
    )
    out = joined.withColumn(
        "robots_allowed", F.coalesce(best["allow"], F.lit(True))
    ).drop("_h", "_p", "rules")
    if keep_denied:
        return out
    return out.where(F.col("robots_allowed")).drop("robots_allowed")


def sitemap_directives(robots: DataFrame, host_col: str = "host",
                       content_col: str = "content") -> DataFrame:
    """(host, sitemap_url) from ``Sitemap:`` lines — RFC 9309 §2.3 / the
    sitemaps.org cross-submission mechanism. Sitemap records are
    FILE-WIDE (independent of any user-agent group), so this is a
    separate extraction from the per-agent rule compile — and unlike the
    rule parse it is PURE CODEGEN: one split + regexp per line, riding
    the (tiny) robots corpus scan with no Python.

    Tolerances: case-insensitive field name, surrounding whitespace,
    trailing comments, CRLF. Absolute http(s) URLs pass through;
    host-relative ``/path`` (seen in the wild, not spec) resolves against
    the robots host; anything else is malformed and dropped."""
    line = F.explode(F.split(F.col(content_col), r"\r?\n")).alias("_line")
    url = F.trim(
        F.regexp_extract(F.col("_line"), r"(?i)^\s*sitemap\s*:\s*([^#]*)", 1)
    )
    with_url = (
        robots.select(F.col(host_col).alias("host"), line)
        .select("host", url.alias("_u"))
        .where(F.col("_u") != "")
    )
    resolved = (
        F.when(F.col("_u").rlike(r"(?i)^https?://"), F.col("_u"))
        .when(
            F.col("_u").startswith("/"),
            F.concat(F.lit("https://"), F.col("host"), F.col("_u")),
        )
    )
    return (
        with_url.select("host", resolved.alias("sitemap_url"))
        .where(F.col("sitemap_url").isNotNull())
    )


def parse_crawl_delay(content: str, user_agent: str) -> int | None:
    """The ``Crawl-delay`` (seconds) applying to ``user_agent``, or None.
    Not in RFC 9309 but honored by most crawlers; it BELONGS TO A GROUP,
    so selection follows the same longest-user-agent-token rule as the
    Allow/Disallow compile. Fractional values round UP (politeness errs
    slow); invalid values are ignored."""
    ua = user_agent.lower()
    delays: dict[str, int] = {}
    current_tokens: list[str] = []
    last_was_ua = False
    seen: dict[str, bool] = {}
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            tok = value.lower()
            if last_was_ua:
                current_tokens.append(tok)
            else:
                current_tokens = [tok]
            for t in current_tokens:
                seen.setdefault(t, True)
            last_was_ua = True
        elif field == "crawl-delay":
            last_was_ua = False
            try:
                import math

                d = math.ceil(float(value))
            except ValueError:
                continue
            if d >= 0:
                for t in current_tokens:
                    delays.setdefault(t, int(d))
        else:
            last_was_ua = False
    best = None
    for tok in seen:
        if tok != "*" and (ua == tok or ua.startswith(tok)):
            if best is None or len(tok) > len(best):
                best = tok
    if best is not None:
        return delays.get(best)
    return delays.get("*")


def crawl_delay_directives(robots: DataFrame, user_agent: str,
                           host_col: str = "host",
                           content_col: str = "content") -> DataFrame:
    """(host, delay_s) for hosts declaring a Crawl-delay that applies to
    ``user_agent`` — the broadcast side of
    ``sources/frontier.fetch_schedule``. Same map-only Arrow shape as
    :func:`robots_rules` (the robots corpus is tiny — one row per host)."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                d = parse_crawl_delay(str(content or ""), user_agent)
                if d is not None:
                    rows.append((host, d))
            yield pd.DataFrame(rows, columns=["host", "delay_s"])

    return robots.select(host_col, content_col).mapInPandas(
        batch_fn, "host string, delay_s int"
    )

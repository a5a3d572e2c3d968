"""True 100x scale rehearsal (r10 verdict item 1): bench the top-expensive
operators at sf10 = 100x of sf0.1 and gate their scaling factors.

Until r10 the 100 TB scale argument interpolated from the sf1 (10x)
gauntlet. This runs the actual 100x volume on the box (sf10 is ~1.7 GB
compressed / ~60 M lineitem rows / 500 k documents — well inside 128 GiB
local[32]) and records, per query:

    t_01      sf0.1 median from BENCH_LOCAL.json (the round record)
    t_1       sf1 median from BENCH_sf1_local.json
    t_10      this run's sf10 time (single run — at multi-second
              durations the local ±50% band is proportionally small)
    f100      t_10 / t_01   (100x-volume factor)
    f10_100   t_10 / t_1    (the 10x -> 100x leg: catches superlinearity
              that only kicks in past the sf1 knee)

GATES (written to BENCH_sf10.json, exit code carries the verdict):
  - zero query errors at sf10;
  - every gated query's f100 <= F100_MAX (linear-in-volume + headroom:
    a query that is exactly proportional to data lands at ~100 only if
    its sf0.1 time had zero fixed overhead — observed factors sit far
    below that because per-job overhead amortizes; anything ABOVE
    proportional is a superlinear plan and fails);
  - every gated query's f10_100 <= F10_100_MAX (10x data -> at most
    ~linear on the already-warm leg, with noise headroom).

Queries under 1 s at sf0.1 are overhead-bound there, so their f100 is
reported but gated only on the f10_100 leg. store_materialize and
graph_build are one-time layout builds: reported + gated on f10_100 only
(their sf0.1 time includes fixed session warmup that makes f100
meaningless).

Usage: python tools/bench_sf10.py [--rebuild]
Builds .sf10 via tools/make_sf1.py (N_COPIES=100) if absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORDS = os.path.join(REPO, "bench_records")
SF10_DIR = os.path.join(REPO, ".sf10")

# the top-expensive operator set the r10 verdict names, plus the worst
# sf1 scalers (token_count_bpe 2.64x) and the one-time layout builds
TOP_QUERIES = [
    "gopher_repetition",
    "minhash_near_dup",
    "near_dup_clusters",
    "simhash_band",
    "semantic_dedup",
    "duplicate_spans",
    "topo_sort",
    "lm_perplexity",
    "ngram_jaccard",
    "contamination",
    "token_count_bpe",
    "store_materialize",  # pulls the whole store leg (bucketed gates too)
    "html_extract",  # r11 s3: Python-CPU map-only crawl front end
    "pq_recall",     # r11 s3: sampled-codebook ANN (size-independent train)
    # r12 (verdict item 1): the full session-3 set joins the 100x record
    "hashed_features",   # one keyed shuffle w/ map-side combine
    "animation_stats",   # Python-CPU LZW decode + composite, map-only
    "decode_coverage",   # header-sniff map-only
    "warc_ingest",       # end-to-end crawl chain (new r12)
    "link_pagerank",     # iterative joins over the persisted edge sliver
    "robots_filter",     # broadcast rules + codegen regexp gate
    "crawl_frontier",    # canonical -> robots -> anti-join -> host cap
    # r12 sessions 4-8: every key the chunks run is watched — factors and
    # gates must cover the full gauntlet, not a subset (an unwatched key
    # is an unmeasured scale claim)
    "audio_stats", "video_probe", "image_near_dup",
    "pdf_extract", "jsonl_ingest", "exif_stats", "charset_detect",
    "csv_ingest", "nb_classifier", "sitemap_parse", "compression_band",
    "robots_sitemaps", "recrawl_priority", "fetch_schedule",
]

F100_MAX = 100.0   # proportional-to-volume ceiling for >=1 s queries
F10_100_MAX = 15.0  # 10x data on the 10x->100x leg, +50% headroom

ONE_TIME = {"store_materialize", "graph_build"}

# The sf10 leg runs as THREE per-family chunks, each a fresh bench.py
# process, with a cooldown between them. Motivation (measured, r11): a
# single 17-minute full-load invocation showed late-position queries
# 3-6x their isolated times (gopher_repetition 192 s in-sequence vs
# 55-59 s in three separate controlled runs; lm_perplexity 54 s vs
# 17-18 s) with no GC/session-state explanation (a forced driver+JVM GC
# between legs changed nothing) and zero steal at idle — consistent
# with sustained-load throttling of the virtualized box, not with any
# plan property. Chunking bounds each sustained-load window, the
# cooldown lets the box recover, and a fresh JVM per family removes
# cross-family block-manager debris. The text/dedup chunks also skip
# the (irrelevant to them) 4-minute graph materialization via bench.py's
# need_graph rule.
CHUNKS = [
    ("text", ["gopher_repetition", "lm_perplexity", "token_count_bpe",
              "contamination", "ngram_jaccard", "duplicate_spans",
              "simhash_band",
              # r11 session 3: the crawl front end is Python-CPU map-only —
              # exactly the shape that must prove flat-per-byte at 100x
              "html_extract",
              # r12: the rest of the session-3 set + the e2e crawl chain
              "animation_stats", "decode_coverage", "warc_ingest",
              "link_pagerank", "robots_filter", "crawl_frontier",
              # r12 session 4: the three new modality ops — all map-only
              # Arrow decode/probe shapes that must stay flat-per-byte
              "audio_stats", "video_probe",
              # r12 session 6: PDF text extraction — map-only Arrow parse;
              # JSONL ingest — pure-codegen from_json at scan throughput
              "pdf_extract", "jsonl_ingest",
              # r12 session 7: EXIF provenance + charset sniff/transcode —
              # same map-only probe shapes
              "exif_stats", "charset_detect",
              # r12 session 8: CSV front door (pure-codegen from_csv) +
              # integer NB classifier (bounded-model broadcast join)
              "csv_ingest", "nb_classifier",
              # r12 session 8: sitemap discovery — one from_xml JVM stage
              "sitemap_parse",
              # r12 session 8: zlib band gate — Arrow deflate, map-only
              "compression_band",
              # r12 session 8: crawl scheduling legs — codegen extraction +
              # one slim url join
              "robots_sitemaps", "recrawl_priority", "fetch_schedule"]),
    ("dedup", ["minhash_near_dup", "near_dup_clusters", "semantic_dedup",
               # r12 session 4: banded perceptual-hash join at 100x volume
               "image_near_dup",
               # r11 session 3: sampled-codebook training must stay
               # corpus-size-independent; encode+ADC ride the scan
               "pq_recall", "hashed_features"]),
    ("graph-store", ["topo_sort", "store_materialize"]),
]
COOLDOWN_SEC = 90


def main() -> None:
    if "--recompute" in sys.argv:
        # Re-evaluate the gate from the LAST sf10 run's record
        # (BENCH_LOCAL_sf10.0.json — bench.py's by-path artifact) against
        # the CURRENT sf0.1/sf1 records. For when a baseline leg had to be
        # re-run (e.g. it was measured on a loaded box) but the expensive
        # 100x leg itself is clean and unchanged.
        rec10 = json.load(
            open(os.path.join(RECORDS, "BENCH_LOCAL_sf10.0.json"))
        )
        _evaluate(rec10)
        return
    if "--rebuild" in sys.argv or not os.path.exists(
        os.path.join(SF10_DIR, "documents.parquet")
    ):
        print("[bench_sf10] building .sf10 (100 copies of sf0.1) ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py")],
            env=dict(os.environ, N_COPIES="100", OUT_DIR=SF10_DIR),
            check=True, timeout=3600,
        )

    import time

    # chunk runs are BENCH_ONLY subsets, so bench.py writes them under the
    # _partial suffix (a partial record must never clobber a full one);
    # the merged full record below goes to the unsuffixed name
    artifact = os.path.join(RECORDS, "BENCH_LOCAL_sf10.0_partial.json")
    merged_queries: dict = {}
    total = 0.0
    for i, (label, names) in enumerate(CHUNKS):
        if i:
            print(f"[bench_sf10] cooldown {COOLDOWN_SEC}s ...", flush=True)
            time.sleep(COOLDOWN_SEC)
        # remove any prior artifact so a crashed chunk can't be scored
        # off a stale record
        if os.path.exists(artifact):
            os.remove(artifact)
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=SF10_DIR,
            SPARK_GRAFT_BENCH_ONLY=",".join(names),
            SPARK_GRAFT_BENCH_RUNS="1",
        )
        print(f"[bench_sf10] chunk {label}: {names} ...", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        # read the FULL by-path artifact, not the compact stdout line:
        # the compact line elides dict-valued query entries, which
        # includes per-query {"err": ...} records — the r11 sf10
        # store_materialize failure passed the error gate unseen through
        # the line-only path
        if not os.path.exists(artifact):
            print(p.stdout[-2000:])
            print(p.stderr[-2000:])
            raise SystemExit(f"chunk {label}: bench.py wrote no record")
        rec = json.load(open(artifact))
        merged_queries.update(rec.get("queries", {}))
        v = rec.get("value")
        if isinstance(v, (int, float)):
            total += v
    rec10 = {"queries": merged_queries, "value": round(total, 3)}
    # persist the merged record so --recompute scores the same data
    with open(os.path.join(RECORDS, "BENCH_LOCAL_sf10.0.json"), "w") as fh:
        json.dump(
            {"metric": "bench_total_sf10_chunked", "value": rec10["value"],
             "unit": "sec", "queries": merged_queries, "sf": 10.0},
            fh, indent=1,
        )
        fh.write("\n")
    _evaluate(rec10)


def _evaluate(rec10: dict) -> None:
    rec01 = json.load(open(os.path.join(RECORDS, "BENCH_LOCAL.json")))
    # prefer the newest sf1 record: bench.py writes BENCH_LOCAL_sf1.0.json,
    # round_close records BENCH_sf1_local.json
    sf1_paths = [
        os.path.join(RECORDS, p)
        for p in ("BENCH_LOCAL_sf1.0.json", "BENCH_sf1_local.json")
    ]
    sf1_paths = [p for p in sf1_paths if os.path.exists(p)]
    rec1 = json.load(open(max(sf1_paths, key=os.path.getmtime)))
    q01, q1, q10 = rec01["queries"], rec1["queries"], rec10["queries"]

    rows, flags, errs = {}, [], []
    watch = list(TOP_QUERIES) + ["graph_build"]
    for name in watch:
        t10 = q10.get(name)
        if isinstance(t10, dict):  # {"err": ...}
            errs.append({"query": name, "err": t10.get("err")})
            continue
        if not isinstance(t10, (int, float)):
            continue
        t01, t1 = q01.get(name), q1.get(name)
        row: dict = {"t_01": t01, "t_1": t1, "t_10": t10}
        if isinstance(t01, (int, float)) and t01 > 0:
            row["f100"] = round(t10 / t01, 2)
        if isinstance(t1, (int, float)) and t1 > 0:
            row["f10_100"] = round(t10 / t1, 2)
        rows[name] = row
        one_time = name in ONE_TIME
        overhead_bound = not isinstance(t01, (int, float)) or t01 < 1.0
        if not one_time and not overhead_bound and row.get("f100", 0) > F100_MAX:
            flags.append({"query": name, "leg": "f100", "factor": row["f100"]})
        # a query under 1 s at sf1 is overhead-bound THERE, so its
        # f10_100 measures overhead amortization, not plan scaling —
        # reported but gated on the f100 leg alone (same rationale as
        # the f100 leg's own t_01 >= 1 s rule)
        sf1_overhead_bound = not isinstance(t1, (int, float)) or t1 < 1.0
        if not sf1_overhead_bound and row.get("f10_100", 0) > F10_100_MAX:
            flags.append(
                {"query": name, "leg": "f10_100", "factor": row["f10_100"]}
            )

    # any other error the sf10 run surfaced (store leg, graph build, ...)
    for name, v in q10.items():
        if isinstance(v, dict) and not any(e["query"] == name for e in errs):
            errs.append({"query": name, "err": v.get("err")})

    gate_pass = not flags and not errs
    out = {
        "metric": "bench_sf10_gate",
        "sf": 10.0,
        "gate_pass": gate_pass,
        "gates": {"f100_max": F100_MAX, "f10_100_max": F10_100_MAX},
        "factors": rows,
        "flags": flags,
        "errors": errs,
        "sf10_total_sec": rec10.get("value"),
        "store_bucketed_join_exchange_free": q10.get(
            "store_bucketed_join_exchange_free"
        ),
    }
    os.makedirs(RECORDS, exist_ok=True)
    with open(os.path.join(RECORDS, "BENCH_sf10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    raise SystemExit(0 if gate_pass else 1)


if __name__ == "__main__":
    main()

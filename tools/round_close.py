"""Standing round-close gate (r9 verdict item 8): sf1 + skew gauntlets as
ONE command with recorded thresholds, so scale drift is gated, not
eyeballed.

Runs, in order (each step skippable if its artifact is fresh):

1. ``bench.py`` at sf0.1   -> BENCH_LOCAL.json         (the per-round record)
2. ``tools/make_sf1.py``   -> .sf1/ (if absent)
3. ``bench.py`` at sf1     -> BENCH_sf1_local.json     (10x-volume rehearsal)
4. ``tools/bench_skew.py`` -> BENCH_skew_local.json    (adversarial skew)

then evaluates THREE gates and writes ``ROUND_CLOSE.json``:

- **regression gate** (sf0.1): no query > 2x its BASELINE_MEDIANS entry
  (bench.py already computes this — re-checked here from the record);
- **scale gate** (sf1/sf0.1): every query's observed 10x-volume factor
  must be <= SCALE_FACTOR_MAX (sub-second sf0.1 queries are
  overhead-bound and only reported); the five r9-new ops additionally
  gate against their recorded sf1 medians in SF1_MEDIANS at 2x — the
  same-round 13.4 -> 30.1 s gopher_repetition drift the r9 verdict
  flagged is exactly what this catches;
- **skew gate**: BENCH_skew gate_pass (zero errors, caps bind with
  non-empty drop reports, no material unexplained straggler).

Exit code 0 iff all three pass. Usage:

    python tools/round_close.py [--skip-sf01] [--skip-sf1] [--skip-skew]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# r11 verdict item 8: every per-run bench artifact lives under ONE
# canonical path in bench_records/ — the gates read exactly these
RECORDS = os.path.join(REPO, "bench_records")

# observed 10x-data factor ceiling for queries >= 1 s at sf0.1: linear
# scaling with noise headroom (the sf1 gauntlets have run at <= ~4x for
# every gated query since r7; 6x flags a real superlinearity without
# tripping on a noisy run)
SCALE_FACTOR_MAX = 6.0

# truly superlinear on the 10x leg: past linear growth plus noise headroom.
# Factors in (SCALE_FACTOR_MAX, SUPERLINEAR_MAX] are LINEAR-class and only
# watched — but ONLY for the ops below: a map-only Python-CPU op with no
# fixed overhead to amortize honestly lands near 10x on 10x data. A
# shuffle-bearing op past SCALE_FACTOR_MAX still FAILS (r11 ADVICE: the
# blanket watch-band had weakened the gate for exactly the ops it exists
# to catch — a near-superlinear join/agg regression would have passed).
SUPERLINEAR_MAX = 11.0

# per-doc map-only ops (scan -> score/extract -> tiny agg): no shuffle
# whose cost could grow superlinearly, nothing to amortize. Everything
# NOT in this set keeps SCALE_FACTOR_MAX as its hard failure threshold.
MAP_ONLY_LINEAR = {
    "html_extract", "decode_coverage", "animation_stats",
    "gopher_repetition", "gopher_rules", "c4_rules", "lm_perplexity",
    "quality_score", "lang_id", "compression_ratio", "token_count",
    "token_count_bpe", "repetition_score", "normalize_text", "pii_scan",
    "domain_filter",
    # r12 session 6: PDF extraction is synth + parse mapInPandas, no
    # shuffle (the stats tuple never aggregates)
    "pdf_extract",
    # r12 session 7: EXIF is the same shape — jpeg synth + header-walk
    # probe mapInPandas, zero shuffles; charset sniff/transcode likewise
    "exif_stats", "charset_detect",
    # r12 session 8: pure-codegen line/XML parses and the Arrow deflate —
    # all scan->classify shapes with zero shuffles (nb_classifier,
    # recrawl_priority and fetch_schedule carry joins/windows and KEEP
    # the hard 6x ceiling)
    "csv_ingest", "sitemap_parse", "robots_sitemaps", "compression_band",
}

# sf1 medians recorded r10 (quiet box, .sf1 = deterministic 10x of sf0.1)
# for the ops the r9 verdict named, each gated at 2x its recording — the
# same discipline as BASELINE_MEDIANS at sf0.1. The r9 same-round
# 13.4 -> 30.1 s gopher_repetition drift is exactly what this catches.
# Re-record when a formulation changes. Note gopher_repetition runs
# SUB-linear at 10x: the r10 map-only shape amortizes per-job overhead.
SF1_MEDIANS = {
    # r11 re-anchor: .sf1 rebuilt on the 32-part-file layout (the old
    # 10-file fixture capped scan parallelism at 10) and the dedup verify
    # re-shaped (candidate-sliver prune, no shingle persist) — single-run
    # values from BENCH_LOCAL_sf1.0.json on the final r11 tree, gated at
    # 2x like BASELINE_MEDIANS
    "gopher_repetition": 6.9,
    "c4_rules": 0.4,
    "hybrid_rrf": 2.3,
    "ann_recall": 1.3,
    "pack_best_fit": 1.7,
    "semantic_dedup": 9.4,  # the repartitioned bucketed write costs the
    #   store path, not this; the 7.0->9.4 move is the 32-file fixture
    #   changing the k-means input split shape (within the 2x gate)
    # r11 additions: the ops the sf10 gauntlet exercised hardest
    "minhash_near_dup": 6.1,
    "near_dup_clusters": 6.2,
    "topo_sort": 6.7,
    "simhash_band": 3.4,
    # r12 (verdict item 3): quiet median-of-5 on the idle box — 3.43 s
    # (runs 3.36-6.73; the r11 sf1 record's 8.98x factor was contention).
    # The factor is EXPLAINED and bounded: the gated entry pins n_bits=8
    # (static oracle), whose candidate pair mass is quadratic by
    # construction (N^2/512: measured 877k pairs at sf1 vs ~8.8k at
    # sf0.1) while wall time grows only ~5-7x — the verify is cheap per
    # candidate. The production path (n_bits=None auto-scaling) keeps
    # pair mass LINEAR in N (N*target/2: measured 1.65M at 7 auto bits),
    # taking over past the ~128k-vector crossover.
    "embedding_near_dup": 3.4,
    # r12 session 4/5: the three new modality ops (quiet single runs on
    # the idle box; image_near_dup after the localCheckpoint fix). Scale
    # ladder receipts: audio 0.80->4.11->5.34 (f100 6.7), video 0.54->
    # 0.77->0.97 (f100 1.8), phash 4.34->6.08->88.3 (f10_100 14.5 — the
    # 16-bit-band candidate mass is quadratic-until-cap, the documented
    # LSH contract; at 100 TB the band width scales with corpus size)
    "audio_stats": 4.1, "video_probe": 0.8, "image_near_dup": 6.1,
    # r12 session 6: PDF extraction at sf1 (quiet median-of-3; 10x factor
    # 2.3 — map-only Arrow parse amortizes like the other modality ops);
    # JSONL ingest at sf1 (quiet median-of-3; 10x factor 1.1 — from_json
    # codegen rides the scan)
    "pdf_extract": 3.5, "jsonl_ingest": 0.8,
    # r12 session 7: EXIF at sf1 (quiet median-of-3; 10x factor 1.4 —
    # header-walk probe rides the scan like video_probe)
    "exif_stats": 0.8,
    # r12: link PageRank at sf1 (quiet median-of-3; 10x factor 1.5 — the
    # five iteration joins amortize, edges persisted once)
    "link_pagerank": 5.8,
    # r12 session 8: quiet sf1 run on the idle box (10x factors all
    # 1.2-2x — overhead-bound shapes: codegen parses, bounded-model
    # joins, one politeness window)
    "charset_detect": 0.7, "csv_ingest": 0.4, "nb_classifier": 2.2,
    "sitemap_parse": 0.6, "compression_band": 0.6,
    "robots_sitemaps": 0.3, "recrawl_priority": 1.0,
    "fetch_schedule": 0.7,
    # r13 (verdict item 9): events family 10x rehearsal — the window/
    # sessionize shapes were spread-declined at sf0.1 and unproven at 10x.
    # Quiet r12-tree sf1 record (BENCH_sf1_local.json): events_funnel
    # 1.288 s (sf0.1 1.09 — factor 1.2), sessionize 0.622 s (sf0.1 0.55 —
    # factor 1.1): overhead-dominated, linear-class. Gated at 2x like the
    # rest so a superlinear drift in the sessionize window shape trips
    # the round close, not a judge.
    "events_funnel": 1.3, "sessionize": 0.7,
}


def _run_bench(sf_dir: str, out_name: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    os.makedirs(RECORDS, exist_ok=True)
    with open(os.path.join(RECORDS, out_name), "w") as fh:
        json.dump(rec, fh, indent=1)
    return rec


def _eval_factors(q01: dict, q1: dict) -> tuple:
    """Classify every query's 10x factor: superlinear failure, map-only
    linear watch (allowlisted only), or pass. Returns (scale_flags,
    linear_watch, factors)."""
    scale_flags, linear_watch, factors = [], [], {}
    for name, t0 in q01.items():
        t1 = q1.get(name)
        if not isinstance(t0, (int, float)) or not isinstance(t1, (int, float)):
            continue
        if name.startswith(("store_materialize", "graph_build", "ingest_", "e2e_")):
            continue  # one-time builds / sf-independent paths
        f = t1 / t0 if t0 > 0 else float("inf")
        factors[name] = round(f, 2)
        if t0 < 1.0:
            continue  # overhead-bound at sf0.1: reported, not gated
        ceiling = SUPERLINEAR_MAX if name in MAP_ONLY_LINEAR else SCALE_FACTOR_MAX
        if f > ceiling:
            scale_flags.append({"query": name, "factor": round(f, 2)})
        elif f > SCALE_FACTOR_MAX:
            # map-only allowlisted op in (6, 11]: designed near-10x
            # behavior, watched for the record
            linear_watch.append({"query": name, "factor": round(f, 2)})
    return scale_flags, linear_watch, factors


def _box_state() -> dict:
    """Load average + 5 s CPU steal share — recorded in the artifact so a
    reader can tell a code regression from a contended host. Motivated by
    a measured day of host noise: every many-small-job leg (topo peel,
    k-means, incremental sync) ran 2-4x its calm-box recording while pure
    CPU and raw disk stayed green, with loadavg >10 at zero runnable
    user processes."""
    import time

    def cpu():
        f = open("/proc/stat").readline().split()
        return int(f[4]), int(f[8])  # idle, steal

    i0, s0 = cpu()
    time.sleep(5)
    i1, s1 = cpu()
    total = (i1 - i0) + (s1 - s0)
    la1, la5, la15 = open("/proc/loadavg").read().split()[:3]
    return {
        "loadavg": [float(la1), float(la5), float(la15)],
        "steal_share_5s": round((s1 - s0) / total, 4) if total else 0.0,
    }


def main() -> None:
    argv = sys.argv[1:]
    gates: dict = {}
    box = _box_state()

    # -- 1. sf0.1 ----------------------------------------------------------
    if "--skip-sf01" in argv and os.path.exists(f"{RECORDS}/BENCH_LOCAL.json"):
        rec01 = json.load(open(f"{RECORDS}/BENCH_LOCAL.json"))
    else:
        print("[round_close] bench @ sf0.1 ...", flush=True)
        rec01 = _run_bench("/root/testdata/sf0.1", "BENCH_LOCAL.json")
    gates["regression"] = {
        "regressions_2x": rec01.get("regressions_2x", []),
        "ratio_geomean": rec01.get("ratio_geomean"),
        # r10 verdict item 7: the daemon round-trip keys gate like every
        # other BASELINE_MEDIANS entry (2x via regressions_2x above) —
        # surfaced here explicitly so e2e drift is visible in ROUND_CLOSE,
        # not buried in the bench record
        "e2e": {
            k: rec01.get("queries", {}).get(k)
            for k in ("e2e_find", "e2e_find_cold", "e2e_show", "e2e_show_cold")
        },
        "pass": not rec01.get("regressions_2x"),
    }

    # -- 2+3. sf1 ----------------------------------------------------------
    sf1_dir = os.path.join(REPO, ".sf1")
    if "--skip-sf1" in argv and os.path.exists(f"{RECORDS}/BENCH_sf1_local.json"):
        rec1 = json.load(open(f"{RECORDS}/BENCH_sf1_local.json"))
    else:
        if not os.path.exists(os.path.join(sf1_dir, "documents.parquet")):
            print("[round_close] building .sf1 ...", flush=True)
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "make_sf1.py")],
                check=True, timeout=3600,
            )
        print("[round_close] bench @ sf1 ...", flush=True)
        rec1 = _run_bench(sf1_dir, "BENCH_sf1_local.json")
    q01, q1 = rec01.get("queries", {}), rec1.get("queries", {})
    scale_flags, linear_watch, factors = _eval_factors(q01, q1)
    sf1_flags = []
    for name, med in SF1_MEDIANS.items():
        t1 = q1.get(name)
        if isinstance(t1, (int, float)) and t1 > 2.0 * med:
            sf1_flags.append({"query": name, "sf1_sec": t1, "recorded": med})

    # Flag RETEST (r11 session 3): a flagged query is re-measured ISOLATED
    # in a fresh process and the gate takes the better of the two numbers.
    # Motivation, measured: on a contended-host day the same
    # gm.materialize ran 34-141 s across an hour with BOTH an old and the
    # current tree on both sides of each other — in-sequence sf1 numbers
    # from such a window fail queries whose isolated runs are green. A
    # REAL regression reproduces isolated; a noisy-neighbor window does
    # not. The retest also repairs the factor map for the record.
    retested: dict = {}
    flagged = sorted(
        {f["query"] for f in scale_flags} | {f["query"] for f in sf1_flags}
    )
    if flagged:
        print(f"[round_close] retesting flagged isolated: {flagged}",
              flush=True)
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=sf1_dir,
            SPARK_GRAFT_BENCH_ONLY=",".join(flagged),
            SPARK_GRAFT_BENCH_RUNS="1",
        )
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [
                ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{")
            ][-1]
            iso = json.loads(line).get("queries", {})
        except Exception as exc:  # noqa: BLE001 — keep the original flags
            iso = {}
            retested["error"] = str(exc)[:200]
        for name in flagged:
            t_iso = iso.get(name)
            if isinstance(t_iso, (int, float)):
                # record BOTH timings (r11 ADVICE: no silent
                # min-substitution) and re-gate on the ISOLATED number —
                # a real regression reproduces isolated, whichever
                # direction the number moves
                retested[name] = {
                    "in_sequence": q1.get(name), "isolated": t_iso,
                }
                q1[name] = t_iso
        # re-evaluate both flag sets on the isolated numbers
        scale_flags, linear_watch, factors = _eval_factors(q01, q1)
        sf1_flags = []
        for name, med in SF1_MEDIANS.items():
            t1 = q1.get(name)
            if isinstance(t1, (int, float)) and t1 > 2.0 * med:
                sf1_flags.append(
                    {"query": name, "sf1_sec": t1, "recorded": med}
                )
    gates["scale"] = {
        "retested_isolated": retested,
        "factor_max": SCALE_FACTOR_MAX,
        "superlinear_max": SUPERLINEAR_MAX,
        "superlinear": scale_flags,
        "linear_watch": linear_watch,
        "sf1_median_2x": sf1_flags,
        "n_errors_sf1": rec1.get("n_errors", 0),
        "pass": not scale_flags and not sf1_flags and not rec1.get("n_errors"),
        "factors": factors,
    }

    # -- 4. skew -----------------------------------------------------------
    if "--skip-skew" in argv and os.path.exists(f"{RECORDS}/BENCH_skew_local.json"):
        recs = json.load(open(f"{RECORDS}/BENCH_skew_local.json"))
    else:
        print("[round_close] skew gauntlet ...", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_skew.py")],
            capture_output=True, text=True, timeout=3600,
        )
        line = [
            ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")
        ][-1]
        recs = json.loads(line)
    gates["skew"] = {
        "gate_pass": recs.get("gate_pass"),
        "n_errors": recs.get("n_errors"),
        "caps": recs.get("caps"),
        "worst_straggler": (recs.get("straggler") or {}).get("worst"),
        "pass": recs.get("gate_pass") is True,
    }

    # -- 5. sf10 (optional, r11) ------------------------------------------
    # the 100x gauntlet is expensive (~35 min); round_close consumes its
    # record when present (run tools/bench_sf10.py to refresh), gating on
    # its own verdict. --with-sf10 forces a fresh run.
    sf10_path = os.path.join(RECORDS, "BENCH_sf10.json")
    if "--with-sf10" in argv:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_sf10.py")],
            timeout=7200,
        )
    if os.path.exists(sf10_path):
        rec10 = json.load(open(sf10_path))
        gates["scale_100x"] = {
            "gate_pass": rec10.get("gate_pass"),
            "flags": rec10.get("flags"),
            "n_errors": len(rec10.get("errors") or []),
            "pass": rec10.get("gate_pass") is True,
        }

    ok = all(g["pass"] for g in gates.values())
    box["loadavg_end"] = [float(x) for x in
                          open("/proc/loadavg").read().split()[:3]]
    out = {"metric": "round_close", "pass": ok, "gates": gates,
           "box_state": box}
    with open(os.path.join(REPO, "ROUND_CLOSE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({**out, "gates": {
        k: {kk: vv for kk, vv in v.items() if kk != "factors"}
        for k, v in gates.items()
    }}, separators=(",", ":")))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

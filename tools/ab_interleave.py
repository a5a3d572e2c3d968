"""Interleaved A/B bench: HEAD vs a prior git rev, same box-hours.

Usage:
    python tools/ab_interleave.py --rev <git-rev> --keys k1,k2 [--passes 3]
                                  [--label name]

Why (r12 verdict item 1): cross-day medians on this host are contaminated
by CPU-steal waves, so a single bench run cannot adjudicate "regression vs
noise". This tool runs the SAME key subset against HEAD and against a
worktree of the prior rev in strict alternation (A B B A A B ... balanced
order), each pass a fresh `bench.py` process with BENCH_RUNS=1, and stamps
every pass with loadavg + /proc/stat steal delta. A real code regression
shows up in EVERY pass regardless of which box-window it landed in; a wave
inflates whichever side happened to run inside it and averages out across
the interleave.

Writes bench_records/AB_<label>.json:
    {"rev": ..., "keys": [...], "passes": {"head": [{...timings, box}],
     "prev": [...]}, "medians": {...}, "ratio": {key: head/prev}}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steal() -> int:
    with open("/proc/stat", encoding="ascii") as fh:
        return int(fh.readline().split()[8])


def _loadavg() -> float:
    with open("/proc/loadavg", encoding="ascii") as fh:
        return float(fh.read().split()[0])


def _run_bench(repo_dir: str, keys: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = keys
    env["SPARK_GRAFT_BENCH_RUNS"] = env.get("AB_BENCH_RUNS", "1")
    s0, l0 = _steal(), _loadavg()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo_dir, env=env, capture_output=True, text=True, timeout=3600,
    )
    s1, l1 = _steal(), _loadavg()
    line = ""
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    rec: dict = {"rc": proc.returncode}
    try:
        parsed = json.loads(line)
        rec["queries"] = parsed.get("queries", {})
    except (json.JSONDecodeError, ValueError):
        rec["queries"] = {}
        rec["stdout_tail"] = proc.stdout[-500:]
        rec["stderr_tail"] = proc.stderr[-500:]
    rec["box"] = {
        "loadavg_start": l0, "loadavg_end": l1,
        "steal_sec": round((s1 - s0) / 100.0, 1),
    }
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", required=True)
    ap.add_argument("--keys", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    wt = f"/tmp/kdb_ab_{args.rev[:12].replace('/', '_')}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.rev],
            cwd=REPO, check=True,
        )

    passes: dict[str, list[dict]] = {"head": [], "prev": []}
    # balanced alternation: pass i runs (head, prev) on even i, (prev, head)
    # on odd i — neither side systematically inherits a warmer page cache or
    # a particular box window
    for i in range(args.passes):
        order = (
            [("head", REPO), ("prev", wt)]
            if i % 2 == 0
            else [("prev", wt), ("head", REPO)]
        )
        for side, repo_dir in order:
            rec = _run_bench(repo_dir, args.keys)
            passes[side].append(rec)
            qsum = {
                k: v for k, v in rec["queries"].items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)
            }
            print(f"pass {i} {side}: {qsum} box={rec['box']}", flush=True)

    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    medians: dict[str, dict[str, float]] = {}
    ratio: dict[str, float] = {}
    for k in keys:
        med: dict[str, float] = {}
        for side in ("head", "prev"):
            vals = [
                p["queries"][k] for p in passes[side]
                if isinstance(p["queries"].get(k), (int, float))
                and not isinstance(p["queries"].get(k), bool)
            ]
            if vals:
                med[side] = round(statistics.median(vals), 3)
        medians[k] = med
        if med.get("head") and med.get("prev"):
            ratio[k] = round(med["head"] / med["prev"], 3)

    label = args.label or args.rev[:12]
    out_path = os.path.join(REPO, "bench_records", f"AB_{label}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(
            {"rev": args.rev, "keys": keys, "passes": passes,
             "medians": medians, "ratio_head_over_prev": ratio},
            fh, indent=1,
        )
        fh.write("\n")
    print(f"wrote {out_path}")
    print(json.dumps({"medians": medians, "ratio": ratio}))


if __name__ == "__main__":
    main()

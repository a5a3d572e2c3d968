"""Per-query scaling-factor report: sf1 bench vs an sf0.1 bench.

Usage: python tools/scaling_report.py SF01_JSON SF1_JSON

For every query present in both runs, prints t_sf1 / t_sf01 (the observed
scale factor at 10x data) and classifies it:

- <= ~12x  : linear-or-better (10x data, plus noise headroom)
- 12x..20x : superlinear — investigate (often a log-factor or a fixed
             per-partition overhead crossing a threshold)
- > 20x    : scale bug candidate

Sub-second sf0.1 queries are noise-dominated (fixed Spark job overhead of
~0.2-0.5 s swamps the data-dependent part), so their factors are reported
but flagged 'overhead-bound' instead of classified.
"""

from __future__ import annotations

import json
import sys


def load(p: str) -> dict:
    with open(p) as f:
        txt = f.read().strip()
    try:
        d = json.loads(txt)
        # driver-recorded BENCH_r*.json wraps the bench line under 'parsed'
        return d.get("parsed", d)
    except json.JSONDecodeError:
        pass
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {p}")


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    base, big = load(a)["queries"], load(b)["queries"]
    rows = []
    for name, t0 in sorted(base.items()):
        t1 = big.get(name)
        if not isinstance(t0, (int, float)) or not isinstance(t1, (int, float)):
            continue
        factor = t1 / t0 if t0 > 0 else float("inf")
        if name.startswith("store_bucketed"):
            continue
        if t0 < 1.0:
            cls = "overhead-bound"
        elif factor <= 12:
            cls = "linear-or-better"
        elif factor <= 20:
            cls = "superlinear"
        else:
            cls = "SCALE-BUG?"
        rows.append((factor, name, t0, t1, cls))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'factor':>7s}  class")
    for factor, name, t0, t1, cls in rows:
        print(f"{name:34s} {t0:8.2f} {t1:8.2f} {factor:6.1f}x  {cls}")
    flagged = [r for r in rows if r[4] in ("superlinear", "SCALE-BUG?")]
    print(f"\n{len(rows)} compared; {len(flagged)} flagged "
          f"({', '.join(r[1] for r in flagged) or 'none'})")


if __name__ == "__main__":
    main()

"""Benchmark harness (BASELINE.md §3).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with the noop sink (full computation of every output
column, no driver collect). graph_build = one-time derivation + snapshot
materialization cost, reported separately; per-query numbers are post-warm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "point_lookup",
    "batch_lookup_100",
    "filter_metadata_eq",
    "filter_compound",
    "keyword_search",
    "find_by_name",
    "callers_1hop",
    "bfs_depth3",
    "bidirectional",
    "topo_sort",
    "snapshot_view",
    "exact_dedup",
    "token_count",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from kausaldb_spark import graphmodel as gm
    from kausaldb_spark.session import get_spark

    spark = get_spark("kausaldb-bench")
    qs = entry_mod.queries()

    t0 = time.monotonic()
    g = gm.graph(spark, sf_dir)
    g["visible"].count()
    g["edges_vis"].count()
    build_sec = time.monotonic() - t0

    timings: dict[str, float] = {"graph_build": round(build_sec, 3)}
    total = build_sec
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

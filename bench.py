"""Benchmark harness (BASELINE.md §3).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology:
- every query forced via the noop sink (full computation of all output
  columns, no driver collect);
- per-query time = median of N_RUNS runs (local timings showed ±50% noise);
- per-query ERROR ISOLATION (VERDICT r4 §Wrong #2): one failing query records
  an "err" entry and the run continues; exit 0 as long as >=1 query succeeds,
  so a single regression can never erase the whole round's numbers again;
- graph_build = one-time derivation + snapshot/edge materialization,
  reported separately (it's the fixture cost, amortized across all queries
  in a session — the production path reads a materialized BlockStore with
  parquet pushdown instead, see kausaldb_spark.storage).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RUNS = 3

BENCH_QUERIES = [
    # reference-parity ops (BASELINE.md §3 table)
    "point_lookup",
    "batch_lookup_100",
    "filter_metadata_eq",
    "filter_compound",
    "keyword_search",
    "find_by_name",
    "callers_1hop",
    "bfs_depth3",
    "bfs_depth5",
    "bidirectional",
    "topo_sort",
    "snapshot_view",
    "context_blocks",
    # pipeline ops
    "exact_dedup",
    "line_dedup",
    "minhash_near_dup",
    "near_dup_clusters",
    "ngram_jaccard",
    "simhash_pairs",
    "simhash_band",
    "contamination",
    "token_count",
    "token_count_bpe",
    "split_assignment",
    "lang_id",
    "quality_score",
    "pii_scan",
    "repetition_score",
    "ann_topk",
    "ann_lsh",
    "embedding_near_dup",
    "events_hourly",
    "sessionize",
    "events_asof",
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

    # JVM/codegen warmup: the first job of a fresh session pays ~3-5 s of
    # classloading that has nothing to do with the measured query (every
    # other query already runs on a warm session; graph_build shouldn't be
    # the one entry that eats the cold start)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    total = 0.0
    n_ok = 0

    try:
        t0 = time.monotonic()
        g = gm.graph(spark, sf_dir)
        g["visible"].count()
        g["edges_vis"].count()
        build_sec = time.monotonic() - t0
        timings["graph_build"] = round(build_sec, 3)
        total += build_sec
        n_ok += 1
    except Exception as exc:  # noqa: BLE001 — isolation: record, keep benching
        errors["graph_build"] = _err_tail(exc)
        timings["graph_build"] = {"err": _err_tail(exc)}

    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        runs = []
        try:
            for _ in range(N_RUNS):
                t0 = time.monotonic()
                _force(qs[name](spark, sf_dir))
                runs.append(time.monotonic() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[name] = _err_tail(exc)
            timings[name] = {"err": _err_tail(exc)}
            continue
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        total += med
        n_ok += 1

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["n_errors"] = len(errors)
    print(json.dumps(out))
    spark.stop()
    if n_ok == 0:
        sys.exit(1)


def _err_tail(exc: Exception, limit: int = 300) -> str:
    """Last `limit` chars of the exception text — enough to diagnose, small
    enough to keep the one-line JSON readable."""
    msg = f"{type(exc).__name__}: {exc}"
    return msg[-limit:] if len(msg) > limit else msg


if __name__ == "__main__":
    main()

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
  parquet pushdown instead, see kausaldb_spark.storage);
- STORE PATH (r6): the same point/batch/filter/traversal gates are also run
  against a materialized *bucketed* BlockStore (blocks by id, edges by src —
  storage.materialize_bucketed), reported as store_* keys. store_materialize
  is the one-time layout cost; store_bucketed_join_exchange_free records
  whether a src-keyed edge self-join plans without a shuffle Exchange (the
  co-located-join property a 100 TB deployment maintains);
- REGRESSION GATE (r6): per-query ratio vs the round-1 medians recorded in
  BASELINE.md §4 — emits ratio_geomean + regressions (>1.5x) +
  regressions_2x (>2x) in the JSON; informational, never crashes the run.
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
    "duplicate_spans",
    "term_match_topk",
    "bm25_topk_ppm",
    "source_overlap",
    "minhash_near_dup",
    "near_dup_clusters",
    "ngram_jaccard",
    "simhash_pairs",
    "simhash_band",
    "contamination",
    "token_count",
    "token_count_bpe",
    "split_assignment",
    "normalize_text",
    "mixture_weights",
    "compression_ratio",
    "lang_id",
    "quality_score",
    "pii_scan",
    "repetition_score",
    "domain_filter",
    "length_quantiles",
    "pack_sequences",
    "importance_resample",
    "ann_topk",
    "ann_lsh",
    "embedding_near_dup",
    "semantic_dedup",
    "events_hourly",
    "events_quantiles",
    "events_funnel",
    "cohort_retention",
    "sliding_rollup",
    "sessionize",
    "events_asof",
]


# BASELINE.md §4 round-1 recorded medians (local[32], sf0.1). graph_build is
# excluded (fixture cost, noisy by design); queries added after round 1 have
# no baseline and are skipped by the gate.
BASELINE_MEDIANS = {
    "point_lookup": 0.33, "batch_lookup_100": 0.59, "filter_metadata_eq": 0.65,
    "filter_compound": 0.57, "keyword_search": 0.45, "find_by_name": 0.44,
    "callers_1hop": 2.0, "bfs_depth3": 2.9, "bfs_depth5": 3.3,
    "bidirectional": 3.6, "topo_sort": 5.9, "snapshot_view": 0.12,
    "context_blocks": 4.5, "exact_dedup": 0.40, "minhash_near_dup": 6.2,
    "near_dup_clusters": 7.0, "ngram_jaccard": 11.6, "simhash_pairs": 3.8,
    "contamination": 3.7, "token_count": 0.16, "token_count_bpe": 0.25,
    "split_assignment": 0.15, "lang_id": 0.91, "quality_score": 0.38,
    "ann_topk": 0.49, "ann_lsh": 0.44, "embedding_near_dup": 0.39,
    "events_hourly": 0.41, "sessionize": 0.44,
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, timings, errors, name, n_runs=N_RUNS):
    """Median-of-n with per-query error isolation. Returns the median or
    None on error."""
    import statistics as _st
    import time as _t

    runs = []
    try:
        for _ in range(n_runs):
            t0 = _t.monotonic()
            fn()
            runs.append(_t.monotonic() - t0)
    except Exception as exc:  # noqa: BLE001 — isolation
        errors[name] = _err_tail(exc)
        timings[name] = {"err": _err_tail(exc)}
        return None
    med = _st.median(runs)
    timings[name] = round(med, 3)
    return med


def _bench_store_path(spark, sf_dir, timings, errors):
    """The production read path: one bucketed materialization, then the
    point/batch/filter/traversal gates against the catalog tables. Returns
    seconds added to the total."""
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from kausaldb_spark import graphmodel as gm
    from kausaldb_spark.operators import filtering as flt
    from kausaldb_spark.operators import lookup as lk
    from kausaldb_spark.operators import traversal as tv
    from kausaldb_spark.storage import BlockStore

    added = 0.0
    t0 = time.monotonic()
    try:
        g = gm.graph(spark, sf_dir)
        store = BlockStore(spark, tempfile.mkdtemp(prefix="kdb_bench_store_"))
        store.append_blocks(g["visible"], resequence=False)
        # edges_vis is endpoint-restricted by construction (graphmodel
        # anti-joins both endpoints against the invisible set) — bulk
        # re-materialization skips the redundant endpoint re-check
        store.append_edges(g["edges_vis"], assume_endpoints_exist=True)
        store.materialize_bucketed("bench")
        blocks_b = spark.table("bench_blocks_b")
        edges_b = spark.table("bench_edges_b")
    except Exception as exc:  # noqa: BLE001
        errors["store_materialize"] = _err_tail(exc)
        timings["store_materialize"] = {"err": _err_tail(exc)}
        return added
    sec = time.monotonic() - t0
    timings["store_materialize"] = round(sec, 3)
    added += sec

    # the co-located-join property: a src-keyed edge self-join must plan
    # WITHOUT a shuffle (Exchange hashpartitioning) over the bucketed
    # tables. Broadcast is disabled for the audit — at bench scale the
    # planner broadcasts the small side (also shuffle-free, but that
    # escape hatch vanishes at 100 TB; bucketing is what remains)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a, b = edges_b.alias("a"), edges_b.alias("b")
            j = a.join(b, F.col("a.src") == F.col("b.src")).select(F.col("a.dst"))
            plan = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        timings["store_bucketed_join_exchange_free"] = (
            "Exchange hashpartitioning" not in plan
        )
    except Exception as exc:  # noqa: BLE001
        errors["store_plan_audit"] = _err_tail(exc)

    md5 = entry_mod._md5
    meta_expr = flt.Expr.and_(
        flt.Expr.cond(flt.TARGET_METADATA, "eq", "const", "unit_type"),
        flt.Expr.cond(flt.TARGET_METADATA, "eq", "catalog", "codebase"),
    )
    gates = {
        "store_point_lookup": lambda: _force(lk.find_block(blocks_b, md5("C1"))),
        "store_batch_lookup_100": lambda: _force(
            lk.find_blocks_batched(blocks_b, entry_mod._ids_range(spark, "C", 100))
        ),
        "store_filter_metadata_eq": lambda: _force(
            flt.filtered_query(blocks_b, meta_expr).select("id", "unit_id", "sequence")
        ),
        "store_callers_1hop": lambda: _force(
            tv.bfs(edges_b, [entry_mod.S3], tv.INCOMING,
                   tv.EdgeFilter.only("calls"), max_depth=1)
            .where(F.col("depth") == 1)
            .join(blocks_b, "id")
            .select("id", "unit_id", "codebase", "depth")
        ),
        "store_bfs_depth3": lambda: _force(
            tv.bfs(edges_b, [entry_mod.C42], tv.OUTGOING, max_depth=3)
            .select("id", "depth")
        ),
    }
    for name, fn in gates.items():
        med = _timed(fn, timings, errors, name)
        if med is not None:
            added += med
    return added


def _bench_incremental_dedup(spark, sf_dir, timings, errors) -> float:
    """Incremental dedup split into its two real-world costs (r6 verdict
    Wrong #2): the per-CORPUS index build (one-time; re-run only when the
    corpus is recut) and the per-BATCH steady-state check against the
    persisted index (the number that matters in production — the corpus is
    never re-hashed). The old conflated `incremental_dedup` key timed both
    per run and read 5.4 s when the batch-side cost is sub-second."""
    import tempfile

    from pyspark.sql import functions as F

    from kausaldb_spark.functions import dedup as dd

    full = dd.dedup_corpus(spark, sf_dir)
    base = full.where(F.col("doc_id") < dd.EXACT_COPY_OFFSET)
    new = full.where(F.col("doc_id") >= dd.EXACT_COPY_OFFSET)
    idx_path = tempfile.mkdtemp(prefix="kdb_bench_idx_")
    total = 0.0

    def build():
        dd.minhash_index(base).write.mode("overwrite").parquet(idx_path)

    med = _timed(build, timings, errors, "incremental_dedup_index_build", n_runs=1)
    if med is None:
        return total
    total += med
    idx = spark.read.parquet(idx_path)

    def batch():
        _force(dd.near_dup_vs_corpus(new, base, index=idx))

    med = _timed(batch, timings, errors, "incremental_dedup_batch")
    if med is not None:
        total += med
    return total


def _regression_gate(timings: dict) -> dict:
    """Per-query ratio vs BASELINE_MEDIANS. Informational — never raises."""
    import math

    ratios = {}
    for name, base in BASELINE_MEDIANS.items():
        cur = timings.get(name)
        if isinstance(cur, (int, float)) and base > 0:
            ratios[name] = cur / base
    if not ratios:
        return {}
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    return {
        "ratio_geomean": round(geomean, 3),
        "regressions": sorted(n for n, r in ratios.items() if r > 1.5),
        "regressions_2x": sorted(n for n, r in ratios.items() if r > 2.0),
    }


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
        gm.materialize(spark, sf_dir)
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
        # sub-second queries get medians of 5 (r6 verdict Wrong #1: four
        # such lookups drifted >1.5x purely on 3-run noise — at <1 s each,
        # the extra runs cost nothing and stabilize the regression gate)
        n_runs = 5 if BASELINE_MEDIANS.get(name, 99.0) < 1.0 else N_RUNS
        runs = []
        try:
            for _ in range(n_runs):
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

    # incremental dedup: index-build + steady-state batch, reported as two
    # keys (the conflated single key hid the sub-second batch cost)
    try:
        total += _bench_incremental_dedup(spark, sf_dir, timings, errors)
        n_ok += 1
    except Exception as exc:  # noqa: BLE001
        errors["incremental_dedup_split"] = _err_tail(exc)

    # production read path: materialized bucketed store (r6). Reported under
    # its own total so `value` stays the fixture-path number that rounds 1-5
    # recorded (comparable across BENCH_r*.json); store_* per-query keys
    # still land in `queries`.
    store_total = 0.0
    try:
        store_total = _bench_store_path(spark, sf_dir, timings, errors)
    except Exception as exc:  # noqa: BLE001 — never lose the fixture numbers
        errors["store_path"] = _err_tail(exc)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "store_path_sec": round(store_total, 3),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    try:
        out.update(_regression_gate(timings))
    except Exception as exc:  # noqa: BLE001
        errors["regression_gate"] = _err_tail(exc)
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

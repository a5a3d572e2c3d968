"""Capture .explain("formatted") for every declared query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before"). Queries whose construction itself fails record the error text so
a broken query is visible rather than silently absent. Graph-backed queries
share one session fixture derivation, like bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    only = set(sys.argv[2:]) or None
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from kausaldb_spark.session import get_spark

    spark = get_spark("kausaldb-plans")
    qs = entry_mod.queries()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            text = f"ERROR constructing/explaining {name}: {exc}\n"
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

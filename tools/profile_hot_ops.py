"""Per-sub-step wall-clock profile of the expensive bench legs.

Usage: python tools/profile_hot_ops.py [leg ...]
Legs: store ingest frontier graph warc anim

Times each internal stage of the hot operators separately (noop-forced)
so optimization targets the real cost, not a guess. Not a bench — single
runs, quiet box assumed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{time.monotonic() - t0:8.2f}s  {label}", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    legs = set(sys.argv[1:]) or {"store", "ingest", "frontier", "graph"}
    from pyspark.sql import functions as F

    from kausaldb_spark.session import get_spark

    spark = get_spark("kausaldb-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if "graph" in legs:
        from kausaldb_spark import graphmodel as gm

        t("graph_build (materialize)", lambda: gm.materialize(spark, SF_DIR))

    if "store" in legs:
        import tempfile

        from kausaldb_spark import graphmodel as gm
        from kausaldb_spark.storage import BlockStore

        g = gm.materialize(spark, SF_DIR)
        store_dir = tempfile.mkdtemp(prefix="kdb_prof_store_")
        store = BlockStore(spark, store_dir)
        t("append_blocks", lambda: store.append_blocks(g["visible"], resequence=False))
        t("append_edges", lambda: store.append_edges(g["edges_vis"], assume_endpoints_exist=True))
        t("materialize_bucketed", lambda: store.materialize_bucketed("prof"))
        import shutil

        shutil.rmtree(store_dir, ignore_errors=True)

    if "ingest" in legs:
        import shutil
        import tempfile

        from kausaldb_spark.engine import KausalEngine
        from kausaldb_spark.sources import ingest as ing

        src_root = "/root/reference/src"
        files = ing.list_files(src_root)
        units, raw_edges = ing.parse_files(spark, files)
        t("parse units (noop)", lambda: noop(units))
        t("parse raw_edges (noop)", lambda: noop(raw_edges))
        work = tempfile.mkdtemp(prefix="kdb_prof_tree_")
        shutil.copytree(src_root, work, dirs_exist_ok=True)
        eng = KausalEngine(spark, tempfile.mkdtemp(prefix="kdb_prof_store_"))
        t("link_codebase", lambda: eng.link_codebase(work, "refsrc"))
        victim = os.path.join(work, files[len(files) // 2][1])
        with open(victim, "a", encoding="utf-8") as fh:
            fh.write("\n// prof touch\n")
        t("sync_codebase (1 file)", lambda: eng.sync_codebase("refsrc", root=work))
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(eng.store.path, ignore_errors=True)

    if "frontier" in legs:
        import __spark_entry__ as em
        from kausaldb_spark.sources import frontier as fr
        from kausaldb_spark.sources import html as hx
        from kausaldb_spark.sources import robots as rb

        docs = em._docs(spark, SF_DIR)
        links = em._synth_links(spark, SF_DIR)
        t("synth_html+extract_links (noop)", lambda: noop(links))
        cand = (
            links.selectExpr("url").distinct()
        )
        t("links distinct (noop)", lambda: noop(cand))
        t("crawl_frontier full (noop)", lambda: noop(em._q_crawl_frontier(spark, SF_DIR)))
        t("crawl_frontier again (noop)", lambda: noop(em._q_crawl_frontier(spark, SF_DIR)))

    if "warc" in legs:
        import __spark_entry__ as em
        from kausaldb_spark.sources import warc as wc

        docs = em._docs(spark, SF_DIR)
        files = wc.synthetic_warc_files(docs)
        t("synthetic_warc_files (noop)", lambda: noop(files))
        t("documents_from_warc_files (noop)", lambda: noop(wc.documents_from_warc_files(files)))

    if "anim" in legs:
        import __spark_entry__ as em
        from kausaldb_spark.sources import gif_anim as ga

        docs = em._docs(spark, SF_DIR)
        assets = ga.synthetic_anim_assets(docs)
        t("synthetic_anim_assets (noop)", lambda: noop(assets))
        t("animation_stats full (noop)", lambda: noop(ga.animation_stats(assets)))

    spark.stop()


if __name__ == "__main__":
    main()

"""Repo-wide physical-plan anti-pattern guard.

Sweeps every batch entry in ``__spark_entry__.queries()`` and asserts the
100 TB hygiene rules on the FINAL plan of each query:

- no row-at-a-time Python UDF (``BatchEvalPython``) anywhere — Python is
  allowed only through Arrow (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``), and only for the ops documented as
  Python-boundary (zlib, multimodal decode, stateful sessions);
- no Cartesian product except the documented broadcast-queries×corpus
  exact-kNN baselines (which plan as BroadcastNestedLoopJoin, not
  CartesianProduct).

Individual per-op plan pins (pushdown, exchange-free, no-global-sort) live
next to their ops; this is the backstop that keeps a future op from
quietly introducing the slow path.
"""

import pytest
from conftest import SF_DIR

import __spark_entry__ as entry_mod

_QUERIES = entry_mod.queries()

# streaming entries execute a full stream on call; dfs_preorder and the
# store/traversal ops run bounded driver loops whose intermediate jobs are
# not captured by the final plan anyway — the sweep still covers their
# final frame, but the stream entries are excluded outright.
_SKIP = {
    "streaming_rollup", "streaming_sessionize", "streaming_curate",
    "streaming_near_dup",
}

# ops with a documented Arrow-batched Python boundary (zlib, MLlib vector
# assembly, per-sub-shard best-fit-decreasing greedy, binary container
# header-sniffing — see each docstring)
_ARROW_OK = {
    "compression_ratio", "semantic_dedup", "pack_best_fit",
    "decode_coverage",
    # r11: the animation corpus is SYNTHESIZED (mapInPandas off doc_id)
    # and then pixel-DECODED (mapInPandas LZW + composite) — both stages
    # are documented Arrow boundaries like decode_coverage's sniff pass
    "animation_stats",
    # r11: the HTML corpus is SYNTHESIZED (mapInPandas off doc_id+text)
    # and then TOKENIZED (mapInPandas html.parser extraction) — same
    # documented synth+decode Arrow-boundary pair as animation_stats
    "html_extract",
    # r11: PQ encode is a per-batch numpy argmin GEMM (documented Arrow
    # boundary like semantic_dedup's); ADC scoring itself is codegen
    "pq_recall",
    # r12: the composition report carries per-(source, format) decode
    # coverage — the same documented synth+sniff Arrow-boundary pair as
    # decode_coverage (multimodal.synthetic_format_assets + probe_assets);
    # payload bytes never leave the map stage
    "corpus_report",
    # r12: end-to-end crawl chain — segment synthesis (applyInPandas) +
    # the documented WARC-parse / HTTP-split / HTML-extract Arrow stages
    # (sources/warc.py, sources/html.py); all non-SQL-expressible decode
    # work, per-row error isolated
    "warc_ingest",
    # r12: the link-graph family parses REAL markup for its link relation
    # (html synth + extract_links — the same documented synth+parse Arrow
    # pair as html_extract); everything downstream of the slim
    # (doc_id, url, anchor) relation is pure codegen
    "link_graph", "anchor_topk", "link_pagerank",
    # r12: robots.txt parsing is a map-only Arrow stage over the TINY
    # per-host robots corpus (the broadcast side); the per-URL decision
    # itself is pure codegen (regexp filter + struct max)
    "robots_filter",
    # r12: the frontier composes the link extraction (markup parse Arrow
    # stage) with the robots parse; everything after the slim url
    # relation is codegen
    "crawl_frontier",
    # r12: the audio corpus is SYNTHESIZED (mapInPandas off doc_id) and
    # then container-parsed + PCM-decoded (mapInPandas RIFF walk / FLAC
    # bit-unpack / sample stats) — the same documented synth+decode
    # Arrow-boundary pair as animation_stats
    "audio_stats",
    # r12: video container classification — synth (mapInPandas off doc_id)
    # + ISO-BMFF/AVI/EBML header walk (mapInPandas); probe-only, no codec,
    # payload never shuffles
    "video_probe",
    # r12: perceptual-hash near-dup — image synth (mapInPandas off doc_id)
    # + decode/DCT/threshold hash stage (mapInPandas); the candidate join
    # and hamming verify downstream are pure codegen on 16-bit band ints
    "image_near_dup",
    # r12: PDF text extraction — pdf synth (mapInPandas off doc_id) +
    # object-parse/inflate/extract stage (mapInPandas); the same
    # documented synth+decode Arrow-boundary pair as audio_stats, map-only
    "pdf_extract",
    # r12: EXIF provenance — jpeg synth (mapInPandas off doc_id) + TIFF
    # IFD walk (mapInPandas); header-only probe shape like video_probe
    "exif_stats",
    # r12: charset sniff+transcode — byte synth (mapInPandas off doc_id)
    # + WHATWG decode (mapInPandas); same map-only probe shape
    "charset_detect",
    # r12: zlib compressibility bands — the deflate itself is the ONE
    # quality signal that cannot be codegen (pandas_udf, Arrow-batched,
    # map-only); text synth stays pure codegen
    "compression_band",
    # r12: Crawl-delay group selection — same tiny-corpus mapInPandas
    # rule-compile shape as robots_filter's rules side
    "crawl_delays",
}


def _plan_of(name, spark):
    df = _QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - _SKIP))
def test_no_row_python_udf_and_no_cartesian(name, spark):
    plan = _plan_of(name, spark)
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in _ARROW_OK:
        for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, (
                f"{name}: undocumented Python boundary ({marker})"
            )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_gopher_repetition_pruned_plan_no_lambda_inlining(spark):
    """r10 hang postmortem pin: when a consumer prunes gopher_repetition's
    projection (the curation funnel keeps only rep_pass), single-reference
    aliases get inlined — and an expression inlined into an HOF LAMBDA
    BODY re-evaluates per array element (the observed O(m^2 log m) hang:
    array_sort re-run inside a filter predicate). The operator is written
    bind-only (see its docstring), so even the fully-collapsed pruned plan
    must contain each family's array_sort a BOUNDED number of times —
    argument-position inlining duplicates at most a couple per family,
    per-element inlining would multiply it into the hundreds."""
    from kausaldb_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(1, "a b c a b c d e f g h i j k")], "doc_id long, text string"
    )
    pruned = tx.gopher_repetition(docs).select("rep_pass")
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    n_sorts = plan.count("array_sort")
    assert n_sorts <= 27, (
        f"array_sort appears {n_sorts} times in the pruned plan — "
        "lambda-body inlining is back"
    )

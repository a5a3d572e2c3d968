"""End-to-end curation capstone: ingest → normalize → gate → dedup →
decontaminate → mixture → sharded sink, with the funnel and the manifest
verified. (The aggregate-report capstone `curate` is driver-gated as
corpus_curation; this exercises the full write path.)"""

import shutil
import tempfile

import pytest
from conftest import SF_DIR

from pyspark.sql import functions as F

from kausaldb_spark import sinks
from kausaldb_spark.functions import curation

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale


@pytest.fixture(scope="module")
def result(spark):
    out = tempfile.mkdtemp(prefix="kdb_curate_")
    m = curation.curate_and_write(
        spark,
        f"{SF_DIR}/documents.parquet",
        out,
        targets={"src0": 0.4, "src1": 0.3, "src2": 0.3},
        budget_tokens=50_000,
        n_shards=4,
    )
    yield out, m
    shutil.rmtree(out, ignore_errors=True)


def test_funnel_is_monotone_and_nonempty(result):
    _, m = result
    f = m["funnel"]
    assert f["ingested"] == 500
    # each stage only removes docs (until the mixture, which may upsample)
    assert (
        f["ingested"]
        >= f["after_quality_gate"]
        >= f["after_exact_dedup"]
        >= f["after_near_dedup"]
        >= f["after_decontamination"]
        > 0
    )
    assert f["after_mixture"] > 0


def test_output_shards_verify_and_cover_targets(spark, result):
    out, m = result
    assert sinks.verify_shards(spark, out)
    back = spark.read.parquet(out)
    n = back.count()
    assert n == m["funnel"]["after_mixture"]
    assert sum(s["n_rows"] for s in m["shards"]) == n
    # only targeted sources survive the mixture stage
    srcs = {r["source"] for r in back.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1", "src2"}
    # mixture ids are unique (copy-salted)
    assert back.select("doc_id").distinct().count() == n


def test_deterministic_end_to_end(spark, result):
    out, m = result
    out2 = tempfile.mkdtemp(prefix="kdb_curate2_")
    try:
        m2 = curation.curate_and_write(
            spark,
            f"{SF_DIR}/documents.parquet",
            out2,
            targets={"src0": 0.4, "src1": 0.3, "src2": 0.3},
            budget_tokens=50_000,
            n_shards=4,
        )
        assert m["shards"] == m2["shards"]
        assert m["funnel"] == m2["funnel"]
    finally:
        shutil.rmtree(out2, ignore_errors=True)


def test_dedup_only_mode_skips_mixture(spark):
    out = tempfile.mkdtemp(prefix="kdb_curate3_")
    try:
        m = curation.curate_and_write(spark, f"{SF_DIR}/documents.parquet", out, n_shards=2)
        assert "after_mixture" not in m["funnel"]
        back = spark.read.parquet(out)
        assert back.count() == m["funnel"]["after_decontamination"]
        # all sources survive when no mixture is applied
        n_src = back.select("source").distinct().count()
        assert n_src == 20
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cli_curate_subcommand(spark, tmp_path):
    import io
    import json as _json

    from kausaldb_spark.cli import main as cli_main
    from kausaldb_spark.engine import KausalEngine

    eng = KausalEngine(spark, str(tmp_path / "store"))
    out = str(tmp_path / "shards")
    buf = io.StringIO()
    rc = cli_main(
        ["--store", eng.store.path, "curate",
         "--in", f"{SF_DIR}/documents.parquet", "--out", out,
         "--shards", "2", "--target", "src0=0.6", "--target", "src1=0.4",
         "--budget-tokens", "20000"],
        engine=eng, file=buf,
    )
    assert rc == 0
    m = _json.loads(buf.getvalue())
    assert m["funnel"]["ingested"] == 500 and m["funnel"]["after_mixture"] > 0
    assert sinks.verify_shards(spark, out)
    # bad target spec -> clean error, rc 2
    buf2 = io.StringIO()
    rc2 = cli_main(
        ["--store", eng.store.path, "curate", "--in", "x", "--out", "y",
         "--target", "nofraction"],
        engine=eng, file=buf2,
    )
    assert rc2 == 2 and "bad --target" in buf2.getvalue()
    # --target without budget -> clean error
    buf3 = io.StringIO()
    rc3 = cli_main(
        ["--store", eng.store.path, "curate", "--in", "x", "--out", "y",
         "--target", "src0=1.0"],
        engine=eng, file=buf3,
    )
    assert rc3 == 2 and "budget-tokens" in buf3.getvalue()


def test_sink_write_retry_after_partial_state(spark, tmp_path):
    """Crash-window behavior of the sink: a missing/corrupt manifest fails
    verification loudly; a retried write (mode=overwrite) converges to the
    same verified state."""
    import os

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "s")
    m1 = sinks.write_training_shards(docs, out, n_shards=2, seed=7)
    os.remove(os.path.join(out, "_kdb_manifest.json"))  # simulated crash window
    with pytest.raises(FileNotFoundError):
        sinks.verify_shards(spark, out)
    m2 = sinks.write_training_shards(docs, out, n_shards=2, seed=7)
    assert m1["shards"] == m2["shards"]
    assert sinks.verify_shards(spark, out)


def test_cli_verify_shards(spark, tmp_path):
    import io
    import json as _json
    import os

    from kausaldb_spark.cli import main as cli_main
    from kausaldb_spark.engine import KausalEngine

    eng = KausalEngine(spark, str(tmp_path / "store"))
    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sinks.write_training_shards(docs, out, n_shards=2, seed=7)
    buf = io.StringIO()
    assert cli_main(["--store", eng.store.path, "verify-shards", "--path", out],
                    engine=eng, file=buf) == 0
    assert _json.loads(buf.getvalue())["verified"] is True
    # corrupted manifest -> rc 1 with the error surfaced
    mp = os.path.join(out, "_kdb_manifest.json")
    m = _json.load(open(mp))
    m["shards"][0]["digest"] = "0"
    _json.dump(m, open(mp, "w"))
    buf2 = io.StringIO()
    assert cli_main(["--store", eng.store.path, "verify-shards", "--path", out],
                    engine=eng, file=buf2) == 1
    r = _json.loads(buf2.getvalue())
    assert r["verified"] is False and "mismatch" in r["error"]


def test_mixture_salt_safe_for_56bit_content_ids(spark, tmp_path):
    """Upsampled copies of docs with content-address-sized ids (~2^56) must
    keep unique, positive doc_ids — the old `id*1000+copy` salt overflowed
    bigint for exactly these ids. copy_idx==0 preserves the original id."""
    from pyspark.sql import functions as F

    from kausaldb_spark.functions import text as tx

    base = 7_2000_0000_0000_0000  # ≈ max _synth_id (56-bit)
    docs = spark.createDataFrame(
        [(base + i, "word " * 50, "en", "rare", 250) for i in range(6)]
        + [(1000 + i, "word " * 50, "en", "common", 250) for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    mixed = tx.apply_mixture(
        docs, {"rare": 0.5, "common": 0.5}, budget_tokens=6000,
        max_weight_ppm=999_000_000,
    )
    # replicate curate_and_write's salting
    salted = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.col("doc_id").cast("string"),
                              F.col("copy_idx").cast("string"))), 1, 14),
        16, 10,
    ).cast("bigint")
    out = mixed.withColumn(
        "doc_id", F.when(F.col("copy_idx") == 0, F.col("doc_id")).otherwise(salted)
    )
    rows = out.select("doc_id").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "salted ids collide"
    assert all(i > 0 for i in ids), "salted ids overflowed to negative"
    # originals survive with identity intact
    kept = {r["doc_id"] for r in out.where(F.col("doc_id") >= base).collect()}
    assert kept  # at least the copy_idx==0 epoch of the huge-id docs


def test_mixture_id_collision_guard(spark):
    """ADVICE r7: a doc_id collision (possible in principle for md5-derived
    56-bit copy ids) must fail loudly, never silently merge training rows."""
    import pytest as _pytest

    from kausaldb_spark.functions.curation import _assert_unique_ids

    ok = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    assert _assert_unique_ids(ok) == 2
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="collision"):
        _assert_unique_ids(dup)


def test_unique_id_guard_distinguishes_null_from_collision(spark):
    """ADVICE r8: countDistinct ignores NULLs, so a NULL doc_id used to be
    reported as an id 'collision' with a misleading re-seed remediation.
    NULL ids now get their own error; the collision message is reserved
    for genuine duplicates; a clean frame passes and returns the count."""
    clean = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "doc_id string, x int"
    )
    assert curation._assert_unique_ids(clean) == 3

    with_null = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", 3)], "doc_id string, x int"
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        curation._assert_unique_ids(with_null)

    with_dup = spark.createDataFrame(
        [("a", 1), ("a", 2), ("c", 3)], "doc_id string, x int"
    )
    with pytest.raises(ValueError, match="collision"):
        curation._assert_unique_ids(with_dup)


def test_lm_perplexity_stage_in_pipeline(spark):
    """The optional LM gate: funnel gains after_lm_filter between the
    quality gate and exact dedup, stays monotone, and keeps the
    reference-like slice preferentially."""
    out = tempfile.mkdtemp(prefix="kdb_curate_lm_")
    try:
        m = curation.curate_and_write(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            n_shards=2,
            lm_ref_sources=["src0", "src1", "src2", "src3", "src4"],
            lm_max_bits_ppm=9_300_000,
        )
        f = m["funnel"]
        assert (
            f["after_quality_gate"]
            >= f["after_lm_filter"]
            >= f["after_exact_dedup"]
            >= f["after_near_dedup"]
            >= f["after_decontamination"]
            > 0
        )
        # the gate actually bites at this threshold...
        assert f["after_lm_filter"] < f["after_quality_gate"]
        # ...and what survives skews toward the reference distribution:
        # ref sources keep a strictly higher fraction than the rest
        back = spark.read.parquet(out)
        ref = {"src0", "src1", "src2", "src3", "src4"}
        per_src = {
            r["source"]: r["n"]
            for r in back.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        n_ref = sum(v for s, v in per_src.items() if s in ref)
        n_other = sum(v for s, v in per_src.items() if s not in ref)
        # 5 ref sources vs 15 others, each source same size upstream
        assert n_ref / 5 > (n_other / 15 if n_other else 0)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_gopher_stage_in_pipeline(spark):
    out = tempfile.mkdtemp(prefix="kdb_curate_gopher_")
    try:
        # the synthetic fixture vocab carries only 'the' from the required
        # stop-word list and most docs are under 50 words, so the stage
        # runs with corpus-tuned thresholds (the published defaults are
        # pinned in test_gopher_quality_rules)
        m = curation.curate_and_write(
            spark, f"{SF_DIR}/documents.parquet", out, n_shards=2,
            gopher={"min_req_stopwords": 1, "min_words": 20},
        )
        f = m["funnel"]
        assert (
            f["after_quality_gate"]
            >= f["after_gopher_rules"]
            >= f["after_exact_dedup"]
            >= f["after_decontamination"]
            > 0
        )
        # every surviving doc actually passes the rules
        back = spark.read.parquet(out)
        from kausaldb_spark.functions import text as tx
        n_fail = (
            tx.gopher_quality(
                back.select("doc_id", "text"),
                min_req_stopwords=1, min_words=20,
            )
            .where(~F.col("gopher_pass")).count()
        )
        assert n_fail == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_gopher_repetition_stage_in_pipeline(spark):
    out = tempfile.mkdtemp(prefix="kdb_curate_goprep_")
    try:
        m = curation.curate_and_write(
            spark, f"{SF_DIR}/documents.parquet", out, n_shards=2,
            gopher_rep=True,
        )
        f = m["funnel"]
        assert (
            f["after_quality_gate"]
            >= f["after_gopher_repetition"]
            >= f["after_exact_dedup"]
            >= f["after_decontamination"]
            > 0
        )
        # every surviving doc actually passes the repetition rules (shards
        # store the normalized text the gate ran on, so re-check is exact)
        back = spark.read.parquet(out)
        from kausaldb_spark.functions import text as tx
        n_fail = (
            tx.gopher_repetition(back.select("doc_id", "text"))
            .where(~F.col("rep_pass")).count()
        )
        assert n_fail == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_c4_stage_in_pipeline_gates_and_cleans(spark):
    """c4=True must (a) drop pages failing the published page rules and
    (b) replace survivors' text with the line-cleaned page — downstream
    stages and the sink see what C4 would train on. Planted corpus: the
    sf fixture has no terminal-punctuation structure (every cleaned page
    would be empty), which is exactly the corpus class the published
    min_sentences=3 page rule exists to reject wholesale."""
    a_keep = [
        "The quick brown fox jumps over the lazy dog today.",
        "Please review the javascript widget before the demo starts.",
        "The second proper sentence is here with more good words.",
        "The third proper sentence is also right here with words.",
    ]
    docs = [
        (100, "\n".join(a_keep), "en", "s0"),
        (101, "The opening sentence here is a perfectly normal one.\n"
              "The closing sentence here is also a normal one today.\n"
              "And a third full sentence keeps the page over the bar.\n"
              "code block { return the_value }", "en", "s0"),
        (102, "The only proper sentence on this page stands alone here.\n"
              "a trailing fragment with no terminal punctuation at all", "en", "s0"),
        (103, "Lorem ipsum dolor sit amet is the classic filler text line.\n"
              "The second sentence here would otherwise be good enough.\n"
              "The third sentence here would also be good enough today.", "en", "s0"),
    ]
    src_dir = tempfile.mkdtemp(prefix="kdb_c4_src_")
    out = tempfile.mkdtemp(prefix="kdb_curate_c4_")
    try:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string"
        ).write.mode("overwrite").parquet(f"{src_dir}/documents.parquet")
        m = curation.curate_and_write(
            spark, f"{src_dir}/documents.parquet", out, n_shards=1, c4=True,
        )
        f = m["funnel"]
        assert f["after_quality_gate"] == 4          # all pass the cheap gate
        assert f["after_c4_rules"] == 1              # brace/lorem/<3-sentences drop
        back = spark.read.parquet(out).select("doc_id", "text").collect()
        assert [r["doc_id"] for r in back] == [100]
        # the javascript line is GONE from the stored text; the three
        # clean sentences survive byte-for-byte
        want = "\n".join([a_keep[0], a_keep[2], a_keep[3]])
        assert back[0]["text"] == want
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_all_optional_stages_composed(spark, tmp_path_factory):
    """r10 (the inlining-hang postmortem): EVERY optional gate enabled at
    once — LM perplexity, Gopher word/line, Gopher n-gram repetition, C4
    cleaning — on top of the always-on quality/dedup/decontamination
    path. Per-stage tests exercise each gate against a mostly-bare plan;
    this one pins the COMPOSED plan, where column pruning and project
    collapsing interact across stage trees (the gopher_repetition hang
    only reproduced under composition). The sf fixture has no terminal
    punctuation (C4's fixed line rule would empty it — covered by the
    zero-survivor test below), so the corpus is the fixture with a
    sentence-shaped tail appended. Asserts the full funnel is monotone
    with survivors, and survivors re-pass the repetition + C4 gates."""
    src = str(tmp_path_factory.mktemp("allstages_src") / "docs.parquet")
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                # doc-unique tail: a SHARED tail would put one 8-gram in
                # every doc and the decontamination stage (rightly) drops
                # everything sharing a benchmark-slice shingle
                F.lit(" tail sentence nr "),
                F.col("doc_id").cast("string"),
                F.lit(" closes this properly."),
            ),
        )
        .write.parquet(src)
    )
    out = tempfile.mkdtemp(prefix="kdb_curate_all_")
    try:
        m = curation.curate_and_write(
            spark, src, out, n_shards=2,
            lm_ref_sources=["src0", "src1", "src2", "src3", "src4"],
            lm_max_bits_ppm=9_300_000,
            gopher={"min_req_stopwords": 1, "min_words": 5},
            gopher_rep=True,
            c4={"min_words_per_line": 1, "min_sentences": 1},
        )
        f = m["funnel"]
        order = [
            "after_quality_gate", "after_c4_rules", "after_gopher_rules",
            "after_gopher_repetition", "after_lm_filter",
            "after_exact_dedup", "after_decontamination",
        ]
        for k in order:
            assert k in f, f"missing funnel key {k} (got {sorted(f)})"
        vals = [f[k] for k in order]
        assert vals == sorted(vals, reverse=True), f
        assert vals[-1] > 0, f
        # survivors re-pass the two composed-plan-sensitive gates (shards
        # store the cleaned/normalized text the gates ran on)
        back = spark.read.parquet(out)
        from kausaldb_spark.functions import text as tx
        assert (
            tx.gopher_repetition(back.select("doc_id", "text"))
            .where(~F.col("rep_pass")).count() == 0
        )
        assert (
            tx.c4_rules(back.select("doc_id", "text"),
                        min_words_per_line=1, min_sentences=1)
            .where(~F.col("c4_keep")).count() == 0
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_zero_survivor_run_is_graceful(spark):
    """A gate set that drops EVERY document must produce a zero-count
    funnel and an empty-manifest sink — not a schema-inference crash on
    the empty output directory (r10: dynamic partitioning of zero rows
    writes no part files). The raw sf fixture has no terminal
    punctuation, so real C4 line rules empty it deterministically."""
    out = tempfile.mkdtemp(prefix="kdb_curate_zero_")
    try:
        m = curation.curate_and_write(
            spark, f"{SF_DIR}/documents.parquet", out, n_shards=2,
            c4=True,
        )
        assert m["funnel"]["after_c4_rules"] == 0
        assert m["shards"] == []
    finally:
        shutil.rmtree(out, ignore_errors=True)

"""Streaming corpus ingestion: streamed curation gate == batch gate,
exactly-once appends, within-horizon content dedup."""

import json
import os

import pytest
from conftest import SF_DIR
from pyspark.sql import functions as F

from kausaldb_spark.streaming import corpus as sc


@pytest.fixture()
def doc_chunks(spark, tmp_path):
    """The sf documents split into 3 JSONL files (arrival chunks)."""
    d = tmp_path / "incoming"
    d.mkdir()
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
        .collect()
    )
    for i in range(3):
        with open(d / f"chunk{i}.jsonl", "w") as fh:
            for r in rows[i::3]:
                fh.write(json.dumps(r.asDict()) + "\n")
    return str(d), rows


def _run(stream_writer):
    q = stream_writer.start()
    q.awaitTermination(300)


def test_streamed_gate_matches_batch_gate(spark, doc_chunks, tmp_path):
    src, rows = doc_chunks
    out = str(tmp_path / "curated")
    ck = str(tmp_path / "ck")
    stream = sc.curate_stream(sc.stream_documents(spark, src))
    _run(sc.curated_append(stream, out, ck))

    got = spark.read.parquet(out)
    # batch reference: identical column logic over the same rows
    batch = sc.curate_stream(
        spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"], r["source"]) for r in rows],
            sc.DOC_STREAM_SCHEMA,
        )
    )
    a = got.select("doc_id", "text", "n_tokens", "pred_lang").orderBy("doc_id").toPandas()
    b = batch.select("doc_id", "text", "n_tokens", "pred_lang").orderBy("doc_id").toPandas()
    assert a.equals(b)
    assert 0 < len(a) < len(rows)  # the gate actually filters something
    # three files, one per micro-batch
    assert got.select("_batch_id").distinct().count() == 3


def test_streamed_append_is_exactly_once_on_restart(spark, doc_chunks, tmp_path):
    src, _ = doc_chunks
    out = str(tmp_path / "curated")
    ck = str(tmp_path / "ck")
    stream = sc.curate_stream(sc.stream_documents(spark, src))
    _run(sc.curated_append(stream, out, ck))
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint: no new files -> no new rows
    stream2 = sc.curate_stream(sc.stream_documents(spark, src))
    _run(sc.curated_append(stream2, out, ck))
    assert spark.read.parquet(out).count() == n1


def test_dedup_documents_stream_drops_recrawls(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    docs = [
        {"doc_id": 1, "text": "alpha page", "lang": "en", "source": "crawl"},
        {"doc_id": 2, "text": "beta page", "lang": "en", "source": "crawl"},
    ]
    with open(src / "a.jsonl", "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
    # re-crawl: same content, new doc ids, later file
    with open(src / "b.jsonl", "w") as fh:
        fh.write(json.dumps({"doc_id": 3, "text": "alpha page", "lang": "en",
                             "source": "recrawl"}) + "\n")
        fh.write(json.dumps({"doc_id": 4, "text": "gamma page", "lang": "en",
                             "source": "crawl"}) + "\n")
    # the file source orders arrivals by modification time — pin it, or
    # same-mtime files make "which duplicate came first" nondeterministic
    os.utime(src / "a.jsonl", (1_700_000_000, 1_700_000_000))
    os.utime(src / "b.jsonl", (1_700_000_100, 1_700_000_100))
    out = str(tmp_path / "deduped")
    ck = str(tmp_path / "ck")
    stream = sc.dedup_documents_stream(sc.stream_documents(spark, str(src)))
    _run(sc.curated_append(stream, out, ck))
    got = spark.read.parquet(out)
    assert got.count() == 3  # the alpha re-crawl was dropped
    texts = {r["text"] for r in got.select("text").collect()}
    assert texts == {"alpha page", "beta page", "gamma page"}
    kept_alpha = got.where(F.col("text") == "alpha page").collect()
    assert len(kept_alpha) == 1 and kept_alpha[0]["doc_id"] == 1


def test_curated_append_replay_is_idempotent(spark, doc_chunks, tmp_path):
    """Simulate the crash window between the parquet commit and the
    checkpoint offset commit: re-running a batch with the SAME batch_id
    must replace its partition, not append a second copy."""
    src, _rows = doc_chunks
    out = str(tmp_path / "curated_replay")
    ck = str(tmp_path / "ck_replay")
    stream = sc.curate_stream(sc.stream_documents(spark, src))
    _run(sc.curated_append(stream, out, ck))
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # replay batch 0 by hand (what a checkpoint recovery does after the
    # crash window): same rows, same batch id
    batch0 = spark.read.parquet(out).where(F.col("_batch_id") == 0).drop("_batch_id")
    (
        batch0.withColumn("_batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == n1


def test_true_kill_midstream_then_restart_is_exactly_once(spark, tmp_path):
    """r8 verdict item 4: a REAL kill, not a simulated replay. Start the
    curate stream over 8 arrival chunks, hard-stop the query as soon as the
    first batch partition lands (query.stop() with batches still pending),
    restart from the SAME checkpoint, and require the final parquet to
    equal the batch-mode gate over all rows exactly — the restarted query
    must resume from the committed offset, replay any torn batch
    idempotently, and process exactly the remaining chunks."""
    import time as _time

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .orderBy("doc_id")
        .collect()
    )
    src = tmp_path / "incoming8"
    src.mkdir()
    n_chunks = 8
    for i in range(n_chunks):
        p = src / f"chunk{i}.jsonl"
        with open(p, "w") as fh:
            for r in rows[i::n_chunks]:
                fh.write(json.dumps(r.asDict()) + "\n")
        # pin arrival order (same-mtime files make batch order arbitrary)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    out = str(tmp_path / "curated")
    ck = str(tmp_path / "ck")

    q = sc.curated_append(
        sc.curate_stream(sc.stream_documents(spark, str(src))), out, ck
    ).start()
    deadline = _time.monotonic() + 120
    while _time.monotonic() < deadline and not (
        os.path.isdir(out) and any(d.startswith("_batch_id=") for d in os.listdir(out))
    ):
        _time.sleep(0.05)
    q.stop()  # the kill: offsets for in-flight batches never commit
    q.awaitTermination(120)
    done = [d for d in os.listdir(out) if d.startswith("_batch_id=")]
    assert 1 <= len(done) < n_chunks, (
        f"kill was not mid-stream: {len(done)}/{n_chunks} batches committed"
    )

    q2 = sc.curated_append(
        sc.curate_stream(sc.stream_documents(spark, str(src))), out, ck
    ).start()
    q2.awaitTermination(300)

    got = spark.read.parquet(out)
    batch = sc.curate_stream(
        spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"], r["source"]) for r in rows],
            sc.DOC_STREAM_SCHEMA,
        )
    )
    a = got.select("doc_id", "text", "n_tokens", "pred_lang").orderBy("doc_id").toPandas()
    b = batch.select("doc_id", "text", "n_tokens", "pred_lang").orderBy("doc_id").toPandas()
    assert a.equals(b), "kill+restart output diverged from batch gate"


# ---------------------------------------------------------------------------
# streaming near-dup screening (curated_append_with_near_dup)
# ---------------------------------------------------------------------------

_BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions beneath the ancient stone bridge at midnight"
)
_NEAR = _BASE.replace("midnight", "noon")  # 1 word of 21 -> jaccard ~0.86
_OTHER = (
    "completely different subject matter entirely about spark shuffles "
    "partitions executors stages tasks and the catalyst optimizer plans"
)
# differs from _OTHER in 4 spread-out words: each kills ~3 shingles, so
# the pair sits far below the 0.7 gate (measured ~0.2) while 5/6 below
# stay near-identical to THIS text
_OTHER_NEAR = (
    _OTHER.replace("plans", "trees")
    .replace("subject", "topic")
    .replace("shuffles", "broadcasts")
    .replace("stages", "phases")
)


def _write_chunks(d, chunks):
    os.makedirs(d, exist_ok=True)
    for i, docs in enumerate(chunks):
        p = os.path.join(d, f"chunk{i}.jsonl")
        with open(p, "w") as fh:
            for doc_id, text in docs:
                fh.write(
                    json.dumps(
                        {"doc_id": doc_id, "text": text, "lang": "en",
                         "source": "s"}
                    )
                    + "\n"
                )
        # distinct mtimes fix the file-source batch order
        os.utime(p, (1000000 + i, 1000000 + i))


def test_streaming_near_dup_screen(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "store")
    idx = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    _write_chunks(
        src,
        [
            [(1, _BASE), (2, _OTHER)],
            # 3 near-dups the corpus (doc 1); 5 near-dups 4 WITHIN the batch
            [(3, _NEAR), (4, _OTHER_NEAR), (5, _OTHER_NEAR + " extra")],
            # 6 near-dups doc 4, which was accepted in batch 1 -> the index
            # must have been EXTENDED by batch 1's survivors
            [(6, _OTHER_NEAR)],
        ],
    )
    stream = sc.stream_documents(spark, src)
    _run(sc.curated_append_with_near_dup(stream, out, ck, idx))
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # 1, 2 (first batch all unique); 4 (5 dropped within-batch as the
    # higher id of the pair, 3 dropped vs corpus); 6 dropped vs doc 4
    assert kept == [1, 2, 4]
    # the index covers exactly the accepted docs
    idx_docs = sorted(
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    )
    assert idx_docs == [1, 2, 4]


def test_streaming_near_dup_restart_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "store")
    idx = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    _write_chunks(src, [[(1, _BASE), (2, _OTHER)], [(3, _NEAR)]])
    stream = sc.stream_documents(spark, src)
    _run(sc.curated_append_with_near_dup(stream, out, ck, idx))
    first = sorted(map(tuple, spark.read.parquet(out).select("doc_id").collect()))
    # restart on the same checkpoint with no new files: nothing replays,
    # nothing doubles
    _run(
        sc.curated_append_with_near_dup(
            sc.stream_documents(spark, src), out, ck, idx
        )
    )
    again = sorted(map(tuple, spark.read.parquet(out).select("doc_id").collect()))
    assert again == first == [(1,), (2,)]


def test_near_dup_replay_after_kill_between_store_and_index_writes(
    spark, tmp_path
):
    """r11 ADVICE (medium): a foreachBatch replay after a kill BETWEEN the
    store write and the index write. The crashed attempt left the batch's
    partition in the store but not in the index; before the fix the replay
    read that partition back as 'corpus', every batch doc self-matched (an
    id collision against itself), survivors came back empty and the empty
    dynamic overwrite rewrote nothing — the accepted docs were permanently
    missing from the index and future near-copies were admitted. The fix
    excludes the current batch_id when reading back state, so the replay
    genuinely recomputes and the partition rewrite restores consistency."""
    import shutil

    out = str(tmp_path / "store")
    idx = str(tmp_path / "index")

    def mkbatch(docs):
        return spark.createDataFrame(
            [(i, t, "en", "s") for i, t in docs], sc.DOC_STREAM_SCHEMA
        )

    # batch 0 lands cleanly
    sc.near_dup_write_batch(mkbatch([(1, _BASE), (2, _OTHER)]), 0, out, idx)
    # batch 1: doc 3 near-dups the corpus (doc 1), doc 4 is novel
    b1 = mkbatch([(3, _NEAR), (4, _OTHER_NEAR)])
    sc.near_dup_write_batch(b1, 1, out, idx)
    # simulate the kill window: the index write of batch 1 never happened
    shutil.rmtree(os.path.join(idx, "_batch_id=1"))
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    ) == [1, 2]
    # checkpoint recovery replays batch 1 with the SAME batch id
    sc.near_dup_write_batch(b1, 1, out, idx)
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 2, 4], "replay must recompute, not self-match-drop"
    idx_docs = sorted(
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    )
    assert idx_docs == [1, 2, 4], "index must be restored by the replay"
    # and a later near-copy of doc 4 is still screened out
    sc.near_dup_write_batch(mkbatch([(6, _OTHER_NEAR)]), 2, out, idx)
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept2 == [1, 2, 4]


def test_index_compaction_preserves_decisions_and_prunes_layout(
    spark, tmp_path
):
    """stream-then-compact (the module header's contract, implemented
    r12): folding the _batch_id-partitioned delta index into the
    band-partitioned base must (a) preserve the row multiset, (b) produce
    a band-partitioned directory layout (bucket-join pruning restored),
    (c) leave subsequent streamed batches making IDENTICAL admit
    decisions through the base+delta reader."""
    out = str(tmp_path / "store")
    idx = str(tmp_path / "index")
    base = str(tmp_path / "index_base")

    def mkbatch(docs):
        return spark.createDataFrame(
            [(i, t, "en", "s") for i, t in docs], sc.DOC_STREAM_SCHEMA
        )

    sc.near_dup_write_batch(
        mkbatch([(1, _BASE), (2, _OTHER)]), 0, out, idx, base_dir=base
    )
    before = sorted(
        map(tuple, spark.read.parquet(idx).drop("_batch_id").collect())
    )
    n = sc.compact_minhash_index(spark, idx, base)
    assert n == len(before)
    assert not os.path.isdir(idx)  # delta cleared
    # band-partitioned layout on disk
    assert any(d.startswith("band=") for d in os.listdir(base))
    after = sorted(map(tuple, spark.read.parquet(base).select(
        "doc_id", "band", "bucket", "sig_v").collect()))
    assert after == before
    # next batch: 3 near-dups doc 1 (must be caught via the BASE), 4 novel
    sc.near_dup_write_batch(
        mkbatch([(3, _NEAR), (4, _OTHER_NEAR)]), 1, out, idx, base_dir=base
    )
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 2, 4]
    # second compaction folds base + new delta
    n2 = sc.compact_minhash_index(spark, idx, base)
    docs_in_base = sorted(
        r["doc_id"]
        for r in spark.read.parquet(base).select("doc_id").distinct().collect()
    )
    assert docs_in_base == [1, 2, 4] and n2 > n
    # doc 6 near-dups doc 4 purely via the compacted base (no delta dir)
    sc.near_dup_write_batch(
        mkbatch([(6, _OTHER_NEAR)]), 2, out, idx, base_dir=base
    )
    kept2 = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept2 == [1, 2, 4]


def test_index_compaction_refuses_mixed_sig_v(spark, tmp_path):
    idx = str(tmp_path / "index")
    good = spark.createDataFrame(
        [(1, 0, "b0", 2, 0)],
        "doc_id long, band int, bucket string, sig_v int, _batch_id int",
    )
    bad = spark.createDataFrame(
        [(2, 0, "b1", 1, 1)],
        "doc_id long, band int, bucket string, sig_v int, _batch_id int",
    )
    good.unionByName(bad).write.partitionBy("_batch_id").parquet(idx)
    with pytest.raises(ValueError, match="mixed sig_v"):
        sc.compact_minhash_index(spark, idx, str(tmp_path / "base"))


def test_compaction_missing_everything_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        sc.compact_minhash_index(
            spark, str(tmp_path / "nope"), str(tmp_path / "nope_base")
        )

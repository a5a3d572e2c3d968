"""Structured Streaming: streaming results must match the batch operators on
the same data (the streaming/batch parity claim), and the foreachBatch
ingest must be exactly-once across restarts."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from kausaldb_spark.sources import events as ev
from kausaldb_spark.streaming import events as sev


@pytest.fixture(scope="module")
def event_chunks(spark, tmp_path_factory):
    """The events table split into 4 *time-ordered* parquet files whose
    lexicographic names match time order — a faithful stream replay (the
    file source picks files in a deterministic order, and event time then
    advances roughly monotonically, as a real stream would)."""
    import glob
    import shutil

    d = str(tmp_path_factory.mktemp("chunks"))
    stage = str(tmp_path_factory.mktemp("stage"))
    batch = ev.load_events(spark, SF_DIR).select(
        "event_id", "us", "user_id", "event_type", "value"
    )
    lo, hi = batch.agg(F.min("us"), F.max("us")).collect()[0]
    span = (hi - lo) // 4 + 1
    for p in range(4):
        part_dir = os.path.join(stage, f"p{p}")
        batch.where(
            (F.col("us") >= lo + p * span) & (F.col("us") < lo + (p + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(d, f"chunk_{p}.parquet"))
    return d


def _run(stream_writer, tmp_path, name):
    q = stream_writer.option(
        "checkpointLocation", os.path.join(str(tmp_path), f"ckpt_{name}")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)
    return q


def test_windowed_rollup_matches_batch(spark, event_chunks, tmp_path):
    stream = sev.stream_events(spark, event_chunks)
    out = sev.windowed_rollup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_t")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in spark.sql("select * from rollup_t").collect()
    }
    batch = ev.hourly_rollup(ev.load_events(spark, SF_DIR))
    want = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in batch.collect()
    }
    # append mode only emits windows sealed by the watermark; every emitted
    # window must agree exactly with the batch rollup, and most windows
    # should have been emitted (the tail may still be open)
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    assert len(got) >= len(want) * 0.8


def test_sessionize_stream_matches_batch(spark, event_chunks, tmp_path):
    """Every session the stream CLOSES equals the batch result for that
    session. Scope of the claim (see streaming/events.py module docstring):
    this is in-order + bounded-disorder parity — an event landing more than
    one gap before the open session's start closes as its own late session,
    which batch (with global visibility) might instead bridge; that case is
    pinned separately in test_sessionize_stream_late_before_open_session."""
    stream = sev.stream_events(spark, event_chunks, files_per_trigger=2)
    out = sev.sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["first_us"]): (r["n_events"], r["duration_us"])
        for r in spark.sql("select * from sess_t").collect()
    }
    batch = ev.sessionize(ev.load_events(spark, SF_DIR))
    want = {
        (r["user_id"], r["first_us"]): (r["n_events"], r["duration_us"])
        for r in batch.collect()
    }
    assert got, "no sessions emitted"
    # every closed session the stream emitted matches the batch result
    mismatches = {k: (got[k], want.get(k)) for k in got if want.get(k) != got[k]}
    assert not mismatches, f"session mismatches: {dict(list(mismatches.items())[:5])}"


def test_sessionize_stream_out_of_order_chunks(spark, tmp_path):
    """Cross-micro-batch reordering: a later chunk carries an event that
    falls INSIDE the open session's span (above the watermark). Streaming
    must still agree with batch sessionize — first_us tracks the min and
    last_us the max, not arrival order."""
    sec = 1_000_000  # us per second
    B = 100_000 * sec  # keep event times well above epoch 0: Spark's late-row
    # filter drops rows whose event time equals the (initial, zero) watermark
    chunk0 = [(1, B + 0 * sec, 7, "view", 1.0), (2, B + 600 * sec, 7, "view", 1.0)]
    # +300s arrives AFTER +600s but merges into the same session;
    # +10_000s and +20_000s open (and close) later sessions + advance watermark
    chunk1 = [
        (3, B + 300 * sec, 7, "view", 1.0),
        (4, B + 10_000 * sec, 7, "view", 1.0),
        (5, B + 20_000 * sec, 7, "view", 1.0),
    ]
    d = os.path.join(str(tmp_path), "ooo_chunks")
    os.makedirs(d)
    schema = "event_id long, us long, user_id long, event_type string, value double"
    for i, rows in enumerate((chunk0, chunk1)):
        import glob
        import shutil

        stage = os.path.join(str(tmp_path), f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(d, f"chunk_{i}.parquet"),
        )

    out = sev.sessionize_stream(sev.stream_events(spark, d, files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck_ooo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["first_us"]: (r["n_events"], r["duration_us"])
        for r in spark.sql("select * from sess_ooo").collect()
    }
    all_events = spark.createDataFrame(chunk0 + chunk1, schema)
    want = {
        r["first_us"]: (r["n_events"], r["duration_us"])
        for r in ev.sessionize(all_events).collect()
    }
    # the reordered session MUST have been emitted and match batch exactly
    assert B in got, f"merged session not emitted: {got}"
    assert got[B] == want[B] == (3, 600 * sec)
    for k, v in got.items():
        assert want[k] == v, f"session {k}: stream {v} != batch {want[k]}"


def test_incremental_ingest_exactly_once(spark, event_chunks, tmp_path):
    out_dir = os.path.join(str(tmp_path), "sink")
    ck = os.path.join(str(tmp_path), "ck3")
    stream = sev.stream_events(spark, event_chunks, files_per_trigger=1)
    q = sev.incremental_ingest(stream, out_dir, ck).start()
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()
    total = ev.load_events(spark, SF_DIR).count()
    assert n1 == total
    # restart with same checkpoint: no new data -> no duplicates
    q2 = sev.incremental_ingest(
        sev.stream_events(spark, event_chunks, files_per_trigger=1), out_dir, ck
    ).start()
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == total


def test_sessionize_stream_late_before_open_session(spark, tmp_path):
    """Late events that can never merge with the open session (> gap before
    its start, yet above the watermark — the watermark delay is 1h = 2x the
    session gap, so the band [open_first - 2*gap, open_first - gap) is live):
    adjacent ones merge into ONE late session, and its index differs from the
    open session's — closing the open session later must not reuse an index
    (the r2 bug shared the counter between the two)."""
    import glob
    import shutil

    sec = 1_000_000
    B = 100_000 * sec
    from kausaldb_spark.sources.events import SESSION_GAP_US as GAP

    # chunk0 opens a session at B+2*GAP; the watermark then sits at B
    chunk0 = [(1, B + 2 * GAP, 7, "view", 1.0)]
    # chunk1: two adjacent late events inside [B, B+GAP) — above the
    # watermark, > GAP before the open session start; plus one event that
    # merges into the open session
    chunk1 = [
        (2, B + 60 * sec, 7, "view", 1.0),
        (3, B + 960 * sec, 7, "view", 1.0),
        (4, B + 2 * GAP + 100 * sec, 7, "view", 1.0),
    ]
    # chunk2 far ahead: advances the watermark so the open session closes
    chunk2 = [(5, B + 100 * GAP, 7, "view", 1.0)]

    d = os.path.join(str(tmp_path), "late_chunks")
    os.makedirs(d)
    schema = "event_id long, us long, user_id long, event_type string, value double"
    for i, rows in enumerate((chunk0, chunk1, chunk2)):
        stage = os.path.join(str(tmp_path), f"stage_late{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(d, f"chunk_{i}.parquet"),
        )

    out = sev.sessionize_stream(sev.stream_events(spark, d, files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from sess_late").collect()
    by_first = {r["first_us"]: r for r in rows}
    # the two adjacent late events merged into ONE session of 2 events
    assert B + 60 * sec in by_first, f"late session missing: {rows}"
    late = by_first[B + 60 * sec]
    assert (late["n_events"], late["duration_us"]) == (2, 900 * sec)
    # the open session (2 events after the merge) closed with its own index
    assert B + 2 * GAP in by_first, f"open session not closed: {rows}"
    assert by_first[B + 2 * GAP]["n_events"] == 2
    # no two sessions of the same user share a session_idx
    idxs = [r["session_idx"] for r in rows if r["user_id"] == 7]
    assert len(idxs) == len(set(idxs)), f"duplicate session_idx: {rows}"


def test_dedup_stream_drops_replays(spark, tmp_path):
    """At-least-once delivery: the same event replayed in a later micro-batch
    (within the watermark) must come out exactly once; distinct events all
    survive. Compares against batch dropDuplicates on the union."""
    import glob
    import shutil

    sec = 1_000_000
    B = 100_000 * sec
    chunk0 = [(1, B, 7, "view", 1.0), (2, B + 60 * sec, 7, "view", 1.0)]
    # chunk1 replays event 2 (same id, same payload) and adds two new events
    chunk1 = [
        (2, B + 60 * sec, 7, "view", 1.0),
        (3, B + 120 * sec, 8, "purchase", 2.0),
        (1, B, 7, "view", 1.0),  # replay of event 1 as well
        (4, B + 180 * sec, 8, "view", 0.5),
    ]
    d = os.path.join(str(tmp_path), "dd_chunks")
    os.makedirs(d)
    schema = "event_id long, us long, user_id long, event_type string, value double"
    for i, rows in enumerate((chunk0, chunk1)):
        stage = os.path.join(str(tmp_path), f"dd_stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(d, f"chunk_{i}.parquet"),
        )

    out = sev.dedup_stream(sev.stream_events(spark, d, files_per_trigger=1))
    _run(
        out.writeStream.format("memory").queryName("dd_t").outputMode("append"),
        tmp_path, "dd",
    )
    got = sorted(
        (r["event_id"], r["us"]) for r in spark.sql("select * from dd_t").collect()
    )
    want = sorted(
        (r["event_id"], r["us"])
        for r in spark.createDataFrame(chunk0 + chunk1, schema)
        .dropDuplicates(["event_id"]).collect()
    )
    assert got == want, f"stream {got} != batch {want}"
    assert len(got) == 4


def test_rollup_true_kill_restart_matches_uninterrupted(spark, tmp_path_factory):
    """r8 verdict item 4 (rollup sink): hard-stop the windowed rollup mid
    replay and restart from the same checkpoint — the watermark/window
    state must recover from the state store so the final durable output
    equals an uninterrupted run of the same replay exactly."""
    import glob
    import shutil
    import time as _time

    # 8 time-ordered chunks = 8 micro-batches: enough room to kill between
    d = str(tmp_path_factory.mktemp("chunks8"))
    stage = str(tmp_path_factory.mktemp("stage8"))
    batch = ev.load_events(spark, SF_DIR).select(
        "event_id", "us", "user_id", "event_type", "value"
    )
    lo, hi = batch.agg(F.min("us"), F.max("us")).collect()[0]
    span = (hi - lo) // 8 + 1
    for p in range(8):
        part_dir = os.path.join(stage, f"p{p}")
        batch.where(
            (F.col("us") >= lo + p * span) & (F.col("us") < lo + (p + 1) * span)
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(d, f"chunk_{p}.parquet"))

    base = str(tmp_path_factory.mktemp("rollup_kill"))
    out_a, ck_a = os.path.join(base, "out_a"), os.path.join(base, "ck_a")
    out_b, ck_b = os.path.join(base, "out_b"), os.path.join(base, "ck_b")

    # uninterrupted reference run
    q = sev.incremental_ingest(
        sev.windowed_rollup(sev.stream_events(spark, d)), out_a, ck_a
    ).start()
    q.awaitTermination(300)

    # killed run: stop as soon as the first sealed windows land
    q = sev.incremental_ingest(
        sev.windowed_rollup(sev.stream_events(spark, d)), out_b, ck_b
    ).start()
    deadline = _time.monotonic() + 120
    while _time.monotonic() < deadline and not (
        os.path.isdir(out_b)
        and any(x.startswith("_batch_id=") for x in os.listdir(out_b))
    ):
        _time.sleep(0.05)
    q.stop()
    q.awaitTermination(120)
    q2 = sev.incremental_ingest(
        sev.windowed_rollup(sev.stream_events(spark, d)), out_b, ck_b
    ).start()
    q2.awaitTermination(300)

    cols = ["hour_bucket", "event_type", "n_events", "value_cents"]
    a = sorted(map(tuple, spark.read.parquet(out_a).select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(out_b).select(*cols).collect()))
    assert a == b, "kill+restart rollup diverged from uninterrupted run"
    assert len(a) > 0

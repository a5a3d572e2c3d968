"""Skew utilities: salted join must equal the plain join on a hub-skewed
dataset; HLL distinct must land within its error bound."""

from pyspark.sql import functions as F

from conftest import SF_DIR
from kausaldb_spark.operators.skew import approx_distinct, salted_join


def test_salted_join_equals_plain_join(spark):
    # hub skew: 10k rows on one key, a handful elsewhere
    probe = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hub")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.createDataFrame(
        [("hub", 1), ("k1", 2), ("k3", 3), ("missing", 4)], "k string, v int"
    )
    plain = probe.join(build, "k").select("k", "payload", "v")
    salted = salted_join(probe, build, "k").select("k", "payload", "v")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    assert salted.count() == plain.count() > 0


def test_salted_join_deterministic(spark):
    probe = spark.range(1000).select(
        F.lit("hub").alias("k"), F.col("id").alias("payload")
    )
    build = spark.createDataFrame([("hub", 42)], "k string, v int")
    a = sorted(r["payload"] for r in salted_join(probe, build, "k").collect())
    b = sorted(r["payload"] for r in salted_join(probe, build, "k").collect())
    assert a == b == list(range(1000))


def test_approx_distinct_within_bound(spark):
    events = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = events.select("doc_id").distinct().count()
    approx = approx_distinct(events, "doc_id", rsd=0.02).collect()[0]["approx_n"]
    assert abs(approx - exact) / exact < 0.05

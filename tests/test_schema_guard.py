"""Presence+type guards for driver-generated documents/embeddings tables
(companion to tests/test_events_schema_drift.py)."""

import pytest

from kausaldb_spark.sources import guard


def test_real_tables_pass(spark):
    guard.documents(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    guard.embeddings(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))


def test_missing_column_diagnosed(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(TypeError, match="documents: column 'lang' missing"):
        guard.documents(df)


def test_type_drift_diagnosed(spark):
    df = spark.createDataFrame(
        [(1, [0.5])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(TypeError, match="embeddings.embedding: type 'array<double>'"):
        guard.embeddings(df)


def test_widened_int_accepted(spark):
    df = spark.createDataFrame(
        [(1, "t", "en", "s")], "doc_id int, text string, lang string, source string"
    )
    assert guard.documents(df) is df

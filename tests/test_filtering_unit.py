"""Comparator semantics matrix — mirrors the reference's filter unit tests
(src/query/filtering.zig:410-825): numeric-if-both-parse-else-lexicographic,
float-parse equality ("42.0" == 42), missing metadata fields never match,
malformed JSON never matches, content_length targets."""

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.operators import filtering as flt


@pytest.fixture(scope="module")
def blocks(spark):
    rows = [
        # id, sequence, source_uri, metadata_json, content
        ("b1", 1, "file://a.py#L1-2", '{"unit_type":"function","rank":"42"}', "hello"),
        ("b2", 2, "file://b.py#L1-2", '{"unit_type":"type","rank":"9"}', "hello world, twenty-seven!"),
        ("b3", 42, "file://c.py#L1-2", '{"unit_type":"function"}', "abc"),
        ("b4", 100, "file://d.py#L1-2", "not json at all", "abd"),
    ]
    return spark.createDataFrame(
        rows, "id string, sequence bigint, source_uri string, metadata_json string, content string"
    )


def _ids(blocks, expr):
    return {r["id"] for r in blocks.where(expr.to_column()).collect()}


def test_float_parse_equality(blocks):
    # "42.0" == sequence 42 (filtering.zig:748-767)
    e = flt.Expr.cond(flt.TARGET_SEQUENCE, "eq", "42.0")
    assert _ids(blocks, e) == {"b3"}
    # metadata "42" == "42.00"
    e = flt.Expr.cond(flt.TARGET_METADATA, "eq", "42.00", "rank")
    assert _ids(blocks, e) == {"b1"}


def test_numeric_ordering_when_both_parse(blocks):
    # "9" < "42" numerically (lexicographically "9" > "42")
    e = flt.Expr.cond(flt.TARGET_METADATA, "lt", "42", "rank")
    assert _ids(blocks, e) == {"b2"}
    e = flt.Expr.cond(flt.TARGET_SEQUENCE, "gte", "42", None)
    assert _ids(blocks, e) == {"b3", "b4"}


def test_lexicographic_when_either_side_non_numeric(blocks):
    # contents are non-numeric -> lexicographic: "abc" < "abd" < "hello" < "hello world..."
    e = flt.Expr.cond(flt.TARGET_CONTENT, "gt", "abc")
    assert _ids(blocks, e) == {"b1", "b2", "b4"}
    e = flt.Expr.cond(flt.TARGET_CONTENT, "lt", "abd")
    assert _ids(blocks, e) == {"b3"}


def test_missing_metadata_field_never_matches(blocks):
    e = flt.Expr.cond(flt.TARGET_METADATA, "eq", "9", "rank")
    assert _ids(blocks, e) == {"b2"}  # b3 has no rank, b4 malformed — no match
    e = flt.Expr.cond(flt.TARGET_METADATA, "ne", "9", "rank")
    # NULL target never matches, even for !=
    assert _ids(blocks, e) == {"b1"}


def test_content_length_targets(blocks):
    # contents of length 5 and 26 (mirrors :618-644's 5/27 shape)
    e = flt.Expr.cond(flt.TARGET_CONTENT_LENGTH, "eq", "5")
    assert _ids(blocks, e) == {"b1"}
    e = flt.Expr.cond(flt.TARGET_CONTENT_LENGTH, "gt", "5")
    assert _ids(blocks, e) == {"b2"}


def test_string_operators(blocks):
    assert _ids(blocks, flt.Expr.cond(flt.TARGET_CONTENT, "contains", "world")) == {"b2"}
    assert _ids(blocks, flt.Expr.cond(flt.TARGET_SOURCE_URI, "starts_with", "file://a")) == {"b1"}
    assert _ids(blocks, flt.Expr.cond(flt.TARGET_SOURCE_URI, "ends_with", ".py#L1-2")) == {
        "b1", "b2", "b3", "b4"
    }


def test_boolean_tree_short_circuit_semantics(blocks):
    e = flt.Expr.and_(
        flt.Expr.or_(
            flt.Expr.cond(flt.TARGET_CONTENT, "contains", "hello"),
            flt.Expr.cond(flt.TARGET_CONTENT, "eq", "abc"),
        ),
        flt.Expr.not_(flt.Expr.cond(flt.TARGET_SEQUENCE, "gt", "10")),
    )
    assert _ids(blocks, e) == {"b1", "b2"}


def test_pagination_determinism(blocks):
    e = flt.Expr.cond(flt.TARGET_CONTENT_LENGTH, "gte", "1")
    page1 = [r["id"] for r in flt.filtered_query(blocks, e, offset=0, max_results=2).collect()]
    page2 = [r["id"] for r in flt.filtered_query(blocks, e, offset=2, max_results=2).collect()]
    assert page1 == ["b1", "b2"] and page2 == ["b3", "b4"]  # (sequence, id) order

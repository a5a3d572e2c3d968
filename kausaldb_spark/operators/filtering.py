"""Filtered scans (SURVEY.md §2.2, F1-F7).

Reference: ``src/query/filtering.zig``. Leaf predicates target one of five
fields (F1): ``content``, ``source_uri``, a metadata field, ``sequence``,
``content_length``; nine comparison operators (F2); boolean AND/OR/NOT trees
(F4); offset/max_results pagination over a full scan (F5).

The subtle part (F2, ``src/query/filtering.zig:382-397``): ordered *and*
equality comparisons are numeric when BOTH operands parse as floats
("42.0" == 42 holds, ``:748-767``), otherwise lexicographic. Reproduced with
a ``when(cast-both-succeed, numeric).otherwise(string)`` column — stays in
whole-stage codegen, no UDF.

All of this is plain Catalyst territory: predicates on materialized columns
push down to the parquet scan (the reference needed a hand-built secondary
metadata index + selectivity heuristic for the same effect, F6 — Spark gives
it away free via pushdown + column pruning).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_FILTER_RESULTS = 10_000  # src/query/filtering.zig:210

TARGET_CONTENT = "content"
TARGET_SOURCE_URI = "source_uri"
TARGET_METADATA = "metadata_field"
TARGET_SEQUENCE = "sequence"
TARGET_CONTENT_LENGTH = "content_length"

_ORDERED_OPS = {"eq", "ne", "gt", "gte", "lt", "lte"}
_STRING_OPS = {"contains", "starts_with", "ends_with"}


def _target_col(target: str, metadata_field: str | None) -> Column:
    if target == TARGET_CONTENT:
        return F.col("content")
    if target == TARGET_SOURCE_URI:
        return F.col("source_uri")
    if target == TARGET_SEQUENCE:
        return F.col("sequence").cast("string")
    if target == TARGET_CONTENT_LENGTH:
        return F.length(F.col("content")).cast("string")
    if target == TARGET_METADATA:
        # real JSON extraction — a superset of the reference's substring scan
        # (src/query/filtering.zig:358-379); missing field → NULL → no match
        return F.get_json_object(F.col("metadata_json"), f"$.{metadata_field}")
    raise ValueError(f"unknown filter target {target}")


def _numeric_or_lexical(col: Column, value: str, op: str) -> Column:
    # try_cast: ANSI-safe "does it parse as a number" probe
    cd, vd = col.try_cast("double"), F.lit(value).try_cast("double")
    ops = {
        "eq": lambda a, b: a == b,
        "ne": lambda a, b: a != b,
        "gt": lambda a, b: a > b,
        "gte": lambda a, b: a >= b,
        "lt": lambda a, b: a < b,
        "lte": lambda a, b: a <= b,
    }
    f = ops[op]
    both_numeric = cd.isNotNull() & vd.isNotNull()
    return F.when(both_numeric, f(cd, vd)).otherwise(f(col, F.lit(value)))


@dataclass(frozen=True)
class Condition:
    """F1 leaf predicate."""

    target: str
    op: str
    value: str
    metadata_field: str | None = None

    def to_column(self) -> Column:
        col = _target_col(self.target, self.metadata_field)
        if self.op in _ORDERED_OPS:
            pred = _numeric_or_lexical(col, self.value, self.op)
        elif self.op == "contains":
            pred = col.contains(self.value)
        elif self.op == "starts_with":
            pred = col.startswith(self.value)
        elif self.op == "ends_with":
            pred = col.endswith(self.value)
        else:
            raise ValueError(f"unknown operator {self.op}")
        # NULL target (missing metadata field) never matches — reference
        # substring scan simply finds nothing.
        return F.coalesce(pred, F.lit(False))


@dataclass(frozen=True)
class Expr:
    """F4 boolean tree: kind ∈ condition|and|or|not."""

    kind: str
    condition: Condition | None = None
    children: tuple["Expr", ...] = field(default_factory=tuple)

    @staticmethod
    def cond(target, op, value, metadata_field=None) -> "Expr":
        return Expr("condition", Condition(target, op, value, metadata_field))

    @staticmethod
    def and_(*children: "Expr") -> "Expr":
        return Expr("and", children=tuple(children))

    @staticmethod
    def or_(*children: "Expr") -> "Expr":
        return Expr("or", children=tuple(children))

    @staticmethod
    def not_(child: "Expr") -> "Expr":
        return Expr("not", children=(child,))

    def to_column(self) -> Column:
        if self.kind == "condition":
            return self.condition.to_column()
        cols = [c.to_column() for c in self.children]
        if self.kind == "and":
            out = cols[0]
            for c in cols[1:]:
                out = out & c
            return out
        if self.kind == "or":
            out = cols[0]
            for c in cols[1:]:
                out = out | c
            return out
        if self.kind == "not":
            return ~cols[0]
        raise ValueError(f"unknown expr kind {self.kind}")


def filtered_query(
    blocks: DataFrame,
    expr: Expr,
    offset: int = 0,
    max_results: int = MAX_FILTER_RESULTS,
) -> DataFrame:
    """F5: predicate + deterministic pagination. The reference streams in
    storage order with an offset/cap; we define the deterministic order as
    (sequence, id).

    At scale: the predicate pushes down to the scan, and the
    ``orderBy + offset + limit`` chain compiles to a single
    ``TakeOrderedAndProject(limit=offset+max, offset)`` — a distributed
    top-k (per-partition heaps, then a bounded merge), never a global sort
    or a single-partition window over the full match set.
    """
    max_results = min(max_results, MAX_FILTER_RESULTS)
    matched = blocks.where(expr.to_column())
    return matched.orderBy("sequence", "id").offset(offset).limit(max_results)

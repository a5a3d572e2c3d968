"""Seed-reproducible filter-expression fuzzing vs the DuckDB oracle —
the analogue of the reference's query fuzz targets (`src/fuzz/main.zig`
query/logic targets) over the F1-F5 surface.

200 random AND/OR/NOT trees over all five filter targets and all nine
comparators (including the numeric-if-both-parse-else-lexicographic
branch) are evaluated in ONE Spark pass (each tree as a boolean column)
and compared row-for-row against an independent DuckDB translation of the
same semantics. A second pass checks full filtered_query pagination
(ordering + offset + cap) for a handful of trees.
"""

import random

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from kausaldb_spark import graphmodel as gm
from kausaldb_spark.operators.filtering import (
    Condition,
    Expr,
    filtered_query,
)

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale

N_TREES = 200
SEED = 20260814

_TARGETS = (
    "content", "source_uri", "sequence", "content_length", "metadata_field"
)
_META_FIELDS = ("unit_type", "codebase", "file_path", "no_such_field")
_OPS = ("eq", "ne", "gt", "gte", "lt", "lte",
        "contains", "starts_with", "ends_with")
# realistic + adversarial values: numeric strings exercise the
# numeric-or-lexical branch; substrings hit real content; empty string
# pins the contains('')/starts_with('') always-true edge on both engines
_VALUES = (
    "customer", "account", "order", "priority", "supplier", "updated v2",
    "type", "function", "EGYPT", "FRANCE", "tpch/orders", ".py",
    "file://tpch", "Customer_1", "o1.py",
    "42", "42.0", "1e3", "0", "99", "1000000", "5000000", "-7", "3.5",
    "",
)


def _random_cond(rng):
    target = rng.choice(_TARGETS)
    field = rng.choice(_META_FIELDS) if target == "metadata_field" else None
    return Expr.cond(target, rng.choice(_OPS), rng.choice(_VALUES), field)


def _random_expr(rng, depth):
    if depth <= 0 or rng.random() < 0.4:
        return _random_cond(rng)
    kind = rng.choice(("and", "or", "not"))
    if kind == "not":
        return Expr.not_(_random_expr(rng, depth - 1))
    n = rng.choice((2, 2, 3))
    kids = tuple(_random_expr(rng, depth - 1) for _ in range(n))
    return Expr.and_(*kids) if kind == "and" else Expr.or_(*kids)


def _sql_lit(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _cond_sql(c: Condition) -> str:
    cols = {
        "content": "content",
        "source_uri": "source_uri",
        "sequence": "CAST(sequence AS VARCHAR)",
        "content_length": "CAST(length(content) AS VARCHAR)",
    }
    if c.target == "metadata_field":
        col = f"json_extract_string(metadata_json, '$.{c.metadata_field}')"
    else:
        col = cols[c.target]
    v = _sql_lit(c.value)
    sym = {"eq": "=", "ne": "<>", "gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
    if c.op in sym:
        o = sym[c.op]
        pred = (
            f"CASE WHEN try_cast({col} AS DOUBLE) IS NOT NULL"
            f" AND try_cast({v} AS DOUBLE) IS NOT NULL"
            f" THEN try_cast({col} AS DOUBLE) {o} try_cast({v} AS DOUBLE)"
            f" ELSE {col} {o} {v} END"
        )
    elif c.op == "contains":
        pred = f"contains({col}, {v})"
    elif c.op == "starts_with":
        pred = f"starts_with({col}, {v})"
    else:
        pred = f"ends_with({col}, {v})"
    return f"coalesce({pred}, FALSE)"


def _expr_sql(e: Expr) -> str:
    if e.kind == "condition":
        return _cond_sql(e.condition)
    if e.kind == "not":
        return f"(NOT {_expr_sql(e.children[0])})"
    op = " AND " if e.kind == "and" else " OR "
    return "(" + op.join(_expr_sql(k) for k in e.children) + ")"


@pytest.fixture(scope="module")
def trees():
    rng = random.Random(SEED)
    return [_random_expr(rng, 3) for _ in range(N_TREES)]


def test_filter_fuzz_trees_match_duckdb(spark, duck, trees):
    vis = gm.graph(spark, SF_DIR)["visible"]
    flags = [t.to_column().alias(f"m{i}") for i, t in enumerate(trees)]
    rows = vis.select("id", *flags).collect()
    got = [set() for _ in trees]
    for r in rows:
        for i in range(len(trees)):
            if r[f"m{i}"]:
                got[i].add(r["id"])
    sel = ", ".join(
        f"{_expr_sql(t)} AS m{i}" for i, t in enumerate(trees)
    )
    want_rows = duck.sql(
        gm.DUCK_PREFIX + f" SELECT id, {sel} FROM vis"
    ).fetchall()
    cols = [d[0] for d in duck.sql(
        gm.DUCK_PREFIX + f" SELECT id, {sel} FROM vis LIMIT 0"
    ).description]
    idx = {c: i for i, c in enumerate(cols)}
    want = [set() for _ in trees]
    for r in want_rows:
        for i in range(len(trees)):
            if r[idx[f"m{i}"]]:
                want[i].add(r[idx["id"]])
    n_nonempty = 0
    for i, t in enumerate(trees):
        assert got[i] == want[i], (
            f"tree {i} diverged (|spark|={len(got[i])}, "
            f"|duck|={len(want[i])}): {t}"
        )
        n_nonempty += bool(got[i])
    # the generator must actually exercise matching predicates
    assert n_nonempty > N_TREES // 4, f"only {n_nonempty} trees matched rows"


def test_filter_fuzz_pagination_matches_duckdb(spark, duck, trees):
    vis = gm.graph(spark, SF_DIR)["visible"]
    rng = random.Random(SEED + 1)
    checked = 0
    for t in rng.sample(trees, 12):
        offset = rng.choice((0, 1, 7))
        cap = rng.choice((5, 50, 10_000))
        got = [
            r["id"]
            for r in filtered_query(vis, t, offset=offset, max_results=cap)
            .select("id").collect()
        ]
        want = [
            r[0]
            for r in duck.sql(
                gm.DUCK_PREFIX
                + f" SELECT id FROM vis WHERE {_expr_sql(t)}"
                f" ORDER BY sequence, id LIMIT {cap} OFFSET {offset}"
            ).fetchall()
        ]
        assert got == want, f"pagination diverged for {t}"
        checked += bool(got)
    assert checked >= 3  # at least some paginated result sets were non-empty

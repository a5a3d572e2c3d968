"""Context query anchors and caps beyond the gated entity_name path:
block_id and file_path anchors, multi-anchor union, rule-less queries,
node-cap truncation (reference src/query/context_query.zig:37-243)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from kausaldb_spark import graphmodel as gm
from kausaldb_spark.operators import context as cx
from kausaldb_spark.operators import traversal as tv


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def g(spark):
    return gm.graph(spark, SF_DIR)


def test_block_id_anchor(spark, g):
    q = cx.ContextQuery(
        workspace="catalog",
        anchors=(cx.Anchor("block_id", block_id=_md5("P1")),),
        rules=(),
    )
    out = cx.execute_context_query(g["visible"], g["edges_vis"], q)
    rows = out["blocks"].collect()
    assert len(rows) == 1 and rows[0]["id"] == _md5("P1") and rows[0]["depth"] == 0


def test_block_id_anchor_wrong_workspace_resolves_nothing(spark, g):
    q = cx.ContextQuery(
        workspace="NATION_0",
        anchors=(cx.Anchor("block_id", block_id=_md5("P1")),),  # P1 is 'catalog'
        rules=(),
    )
    out = cx.execute_context_query(g["visible"], g["edges_vis"], q)
    assert out["blocks"].count() == 0


def test_file_path_anchor_and_multi_anchor_union(spark, g):
    q = cx.ContextQuery(
        workspace="catalog",
        anchors=(
            cx.Anchor("file_path", file_path="tpch/parts.py"),
            cx.Anchor("block_id", block_id=_md5("P1")),  # already in the set
        ),
        rules=(),
    )
    out = cx.execute_context_query(g["visible"], g["edges_vis"], q)
    n_parts = g["visible"].where(F.col("codebase") == "catalog").count()
    # union is distinct; file anchor capped at MAX_FIND_RESULTS (1000)
    assert out["blocks"].count() == min(n_parts, 1000)


def test_max_total_nodes_cap(spark, g):
    q = cx.ContextQuery(
        workspace="catalog",
        anchors=(cx.Anchor("block_id", block_id=_md5("P1")),),
        rules=(cx.TraversalRule(direction=tv.INCOMING, max_depth=2),),
        max_total_nodes=5,
    )
    out = cx.execute_context_query(g["visible"], g["edges_vis"], q)
    # reached set truncated BFS-ordered to 5 before packaging
    assert out["blocks"].count() <= 5
    assert out["blocks"].where(F.col("id") == _md5("P1")).count() == 1  # depth-0 kept


def test_rule_depth_validation():
    with pytest.raises(ValueError, match="rule depth"):
        cx.ContextQuery(
            "w", anchors=(cx.Anchor("block_id", block_id="x"),),
            rules=(cx.TraversalRule(max_depth=33),),
        ).admit()


def test_edge_response_cap_binds_deterministically(spark, g):
    """ShowResponse ≤10000-edge cap (src/cli/protocol.zig:27-32): with a
    small max_edges the edge frame truncates to the first rows of the
    deterministic (src, dst, edge_type) order."""
    ws = (
        g["visible"].where(F.col("id") == _md5("S3")).select("codebase").collect()[0][0]
    )
    q = cx.ContextQuery(
        workspace=ws,
        anchors=(cx.Anchor("entity_name", unit_type="type", name="Supplier_3"),),
        rules=(cx.TraversalRule(direction=tv.INCOMING, max_depth=2),),
    )
    full = cx.execute_context_query(g["visible"], g["edges_vis"], q)["edges"].collect()
    assert len(full) > 5
    capped = cx.execute_context_query(
        g["visible"], g["edges_vis"], q, max_edges=5
    )["edges"].collect()
    key = lambda r: (r["src"], r["dst"], r["edge_type"])
    assert [key(r) for r in capped] == sorted(key(r) for r in full)[:5]


def test_cli_emit_edge_cap(spark):
    from kausaldb_spark import cli

    edges = spark.range(0, 50).selectExpr(
        "cast(id as string) as src", "cast(id + 1 as string) as dst",
        "'calls' as edge_type",
    )
    import io

    buf = io.StringIO()
    n = cli.emit(edges, "json", buf)
    assert n == 50  # under the 10k edge cap, NOT truncated to the 1000-block cap shape
    blocks = spark.range(0, 1500).selectExpr("cast(id as string) as id", "'x' as content")
    buf2 = io.StringIO()
    assert cli.emit(blocks, "json", buf2) == 1000  # block cap binds

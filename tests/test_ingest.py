"""Ingestion pipeline: parse a real source tree (this package), check units,
edges, resolution, and the flagship callers query over ingested data.
Mirrors the reference parser goldens + e2e query flow (FIXTURES.md §5)."""

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.operators import traversal as tv
from kausaldb_spark.sources import ingest

REPO_PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "kausaldb_spark")


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("src")
    (root / "app.py").write_text(textwrap.dedent('''
        import os
        from math import sqrt

        LIMIT = 10

        def helper(x):
            return sqrt(x)

        def main():
            helper(LIMIT)
            obj = Greeter()
            obj.greet()

        class Greeter:
            def greet(self):
                self.name()
            def name(self):
                return "g"

        def test_main():
            main()
    '''))
    (root / "broken.py").write_text("def oops(:\n  pass\n")
    (root / "README.md").write_text("docs here\n")
    return str(root)


def test_parse_units_and_edges(spark, fixture_tree):
    blocks, edges = ingest.ingest_directory(spark, fixture_tree, "fix")
    b = {r["unit_id"]: r for r in blocks.collect()}
    # units: functions, class, methods (qualified), const, imports, test, doc
    assert b["app.py:helper"]["unit_type"] == "function"
    assert b["app.py:Greeter"]["unit_type"] == "type"
    assert b["app.py:Greeter.greet"]["unit_type"] == "function"
    assert b["app.py:LIMIT"]["unit_type"] == "const"
    assert b["app.py:os"]["unit_type"] == "import"
    assert b["app.py:test_main"]["unit_type"] == "test"
    assert b["README.md:README.md"]["unit_type"] == "document"
    # broken file becomes an error-annotated document block, not a crash
    assert "syntax error" in b["broken.py:broken.py"]["metadata_json"] or \
        "syntax error" in str(blocks.where(F.col("file_path") == "broken.py").collect()[0].asDict())
    # sequences are unique and positive
    seqs = [r["sequence"] for r in b.values()]
    assert len(set(seqs)) == len(seqs) and min(seqs) > 0

    e = {(r["src"], r["dst"], r["edge_type"]) for r in edges.collect()}
    def bid(uid):
        return b["app.py:" + uid]["id"]
    assert (bid("main"), bid("helper"), "calls") in e
    assert (bid("main"), bid("LIMIT"), "calls") not in e  # LIMIT is not called
    assert (bid("Greeter.greet"), bid("Greeter"), "method_of") in e
    # calls_method greet resolved to the qualified method via global-unique name
    assert (bid("main"), bid("Greeter.greet"), "calls_method") in e
    assert (bid("Greeter.greet"), bid("Greeter.name"), "calls_method") in e
    # test block calls main
    assert (bid("test_main"), bid("main"), "calls") in e


def test_callers_on_ingested_tree(spark, fixture_tree):
    blocks, edges = ingest.ingest_directory(spark, fixture_tree, "fix")
    anchor = blocks.where(F.col("unit_id") == "app.py:helper").collect()[0]["id"]
    callers = tv.bfs(edges, [anchor], tv.INCOMING, tv.EdgeFilter.only("calls"), max_depth=1)
    names = {
        r["unit_id"]
        for r in callers.where(F.col("depth") == 1).join(blocks, "id").collect()
    }
    assert names == {"app.py:main"}


def test_reingest_mvcc(spark, fixture_tree):
    """Re-ingest with a higher sequence base: snapshot returns the new
    versions (last writer wins)."""
    from kausaldb_spark.snapshot import visible_blocks

    b1, _ = ingest.ingest_directory(spark, fixture_tree, "fix", sequence_base=0)
    b2, _ = ingest.ingest_directory(spark, fixture_tree, "fix", sequence_base=1_000_000)
    all_versions = b1.unionByName(b2)
    tomb = spark.range(0).select(
        F.lit("").alias("block_id"), F.lit(0).cast("bigint").alias("sequence"),
        F.lit(0).cast("bigint").alias("deletion_timestamp"),
    )
    vis = visible_blocks(all_versions, tomb)
    assert vis.count() == b1.count()
    assert vis.agg(F.min("sequence")).collect()[0][0] > 1_000_000


def test_ingest_own_package(spark):
    """Dogfood: ingest kausaldb_spark itself and sanity-check the call graph."""
    blocks, edges = ingest.ingest_directory(spark, REPO_PKG, "selfhost")
    assert blocks.where(F.col("unit_id").endswith(":bfs")).count() == 1
    anchor = blocks.where(F.col("unit_id").endswith(":orient")).collect()[0]["id"]
    callers = tv.bfs(edges, [anchor], tv.INCOMING, tv.EdgeFilter.only("calls"), max_depth=1)
    caller_names = {
        r["unit_id"].split(":")[-1]
        for r in callers.where(F.col("depth") == 1).join(blocks, "id").collect()
    }
    assert "bfs" in caller_names  # bfs() calls orient()

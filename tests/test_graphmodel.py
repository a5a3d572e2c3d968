"""Parity of the derived graph fixture between Spark and the DuckDB oracle,
plus MVCC snapshot semantics (FIXTURES.md §3)."""

from conftest import SF_DIR, assert_frames_match

from kausaldb_spark import graphmodel as gm


def test_raw_blocks_match_oracle(spark, duck):
    sdf = gm.raw_blocks(spark, SF_DIR).toPandas()
    ddf = duck.sql(gm.DUCK_PREFIX + "SELECT * FROM blocks_json").df().drop(columns=["_rn"], errors="ignore")
    assert_frames_match(sdf, ddf, "raw_blocks")


def test_visible_blocks_match_oracle(spark, duck):
    g = gm.graph(spark, SF_DIR)
    sdf = g["visible"].toPandas()
    ddf = duck.sql(gm.DUCK_PREFIX + "SELECT * FROM vis").df()
    assert_frames_match(sdf, ddf, "visible")


def test_edges_match_oracle(spark, duck):
    sdf = gm.edges(spark, SF_DIR).toPandas()
    ddf = duck.sql(gm.DUCK_PREFIX + "SELECT * FROM edges").df()
    assert_frames_match(sdf, ddf, "edges")


def test_dataframe_and_sql_paths_agree(spark):
    """The DataFrame builders and the shared SQL text must produce identical
    visible/edge sets (graph() routes through SQL for plan-build speed)."""
    from kausaldb_spark.snapshot import visible_blocks

    df_vis = visible_blocks(gm.raw_blocks(spark, SF_DIR), gm.tombstones(spark, SF_DIR))
    sql_vis = spark.sql(gm.spark_sql_prefix(SF_DIR) + " SELECT * FROM vis")
    assert df_vis.exceptAll(sql_vis).count() == 0
    assert sql_vis.exceptAll(df_vis).count() == 0
    df_e = gm.edges(spark, SF_DIR)
    sql_e = spark.sql(gm.spark_sql_prefix(SF_DIR) + " SELECT * FROM edges")
    assert df_e.exceptAll(sql_e).count() == 0
    assert sql_e.exceptAll(df_e).count() == 0


def test_mvcc_semantics(spark):
    g = gm.graph(spark, SF_DIR)
    vis = g["visible"].toPandas().set_index("id")
    import hashlib

    def bid(k):
        return hashlib.md5(f"C{k}".encode()).hexdigest()

    # custkey 14: %7 tombstoned at 7e6, %14 rewritten at 8e6 -> visible v3
    assert vis.loc[bid(14)]["content"].endswith("restored v3")
    # custkey 7: tombstoned, never rewritten -> invisible
    assert bid(7) not in vis.index
    # custkey 20: %10 -> v2 visible (seq 6e6 beats 1e6), no tombstone
    assert vis.loc[bid(20)]["content"].endswith("updated v2")
    # custkey 1: single version visible
    assert vis.loc[bid(1)]["content"].endswith("customer account")
    # custkey 70: v1, v2, tombstone@7e6, v3@8e6 -> visible v3
    assert vis.loc[bid(70)]["content"].endswith("restored v3")


def test_edges_vis_match_oracle(spark, duck):
    """The cached visible-endpoint edge index (built from the closed-form
    invisible set — tombstoned ∧ not resurrected) must equal the oracle's
    edges_vis (EXISTS vis on both endpoints)."""
    sdf = gm.graph(spark, SF_DIR)["edges_vis"].toPandas()
    ddf = duck.sql(gm.DUCK_PREFIX + "SELECT * FROM edges_vis").df()
    assert_frames_match(sdf, ddf, "edges_vis")


def test_invisible_closed_form_equals_general(spark):
    """graph()'s closed-form invisible set (customer %7==0 ∧ %14≠0) must
    equal the general formulation (tombstoned ids anti-join visible ids),
    so a fixture-rule change that breaks the equivalence fails loudly."""
    g = gm.graph(spark, SF_DIR)
    ids = g["visible"].select("id")
    tomb_ids = g["tombstones"].select("block_id").distinct()
    general = tomb_ids.join(ids, tomb_ids.block_id == ids.id, "left_anti")
    closed = spark.sql(
        gm.spark_sql_prefix(SF_DIR)
        + " SELECT md5('C' || c_custkey) AS block_id FROM customer"
        "   WHERE c_custkey % 7 = 0 AND c_custkey % 14 <> 0"
    )
    assert general.exceptAll(closed).count() == 0
    assert closed.exceptAll(general).count() == 0


def test_edge_multigraph_duplicates(spark):
    e = gm.graph(spark, SF_DIR)["edges"]
    from pyspark.sql import functions as F

    dup = (
        e.where(F.col("edge_type") == "references")
        .groupBy("src", "dst")
        .count()
        .where(F.col("count") >= 2)
        .count()
    )
    assert dup > 0  # linenumber==1 references edges are duplicated

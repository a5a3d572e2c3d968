"""Property tests: the driver-side fast paths (Kahn peel, union-find) must
agree with their distributed fallbacks on random graphs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kausaldb_spark.operators import traversal as tv


def _dag_edges(draw, n_nodes: int):
    """Random DAG: edges only from lower to higher node index."""
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(0, n_nodes - 2), st.integers(1, n_nodes - 1)
            ).filter(lambda p: p[0] < p[1]),
            max_size=n_nodes * 3,
        )
    )
    return [(f"n{a:02d}", f"n{b:02d}", "calls") for a, b in pairs]


@st.composite
def dag(draw):
    n = draw(st.integers(3, 12))
    edges = _dag_edges(draw, n)
    # ensure the start node has at least one edge so the subgraph is nonempty
    edges.append(("n00", f"n{draw(st.integers(1, n - 1)):02d}", "calls"))
    return edges


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dag())
def test_topo_driver_peel_matches_distributed(spark, edges):
    e = spark.createDataFrame(edges, "src string, dst string, edge_type string")
    fast = {(r["id"], r["layer"]) for r in tv.topo_sort(e, ["n00"], max_depth=12).collect()}
    old_cap = tv.TOPO_COLLECT_EDGE_CAP
    tv.TOPO_COLLECT_EDGE_CAP = 0  # force the distributed peel
    try:
        slow = {
            (r["id"], r["layer"]) for r in tv.topo_sort(e, ["n00"], max_depth=12).collect()
        }
    finally:
        tv.TOPO_COLLECT_EDGE_CAP = old_cap
    assert fast == slow


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(
        st.tuples(st.integers(0, 19), st.integers(0, 19)).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=30,
    )
)
def test_union_find_matches_wcc(spark, pairs):
    """Driver union-find component labels == distributed WCC min-labels on
    the same pair graph."""
    rows = [(str(a), str(b), "near_dup") for a, b in pairs]
    e = spark.createDataFrame(rows, "src string, dst string, edge_type string")
    wcc = {
        r["id"]: r["component"]
        for r in tv.weakly_connected_components(e).collect()
    }
    # reference union-find (same min-root convention as near_dup_clusters)
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        a, b = str(a), str(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    uf = {x: find(x) for x in parent}
    assert uf == wcc

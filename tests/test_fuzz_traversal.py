"""Seed-reproducible traversal fuzzing vs a pure-Python BFS model — the
analogue of the reference's model-based workload testing
(`src/testing/model.zig` + `src/testing/workload.zig`): random multigraphs
(cycles, duplicate edges, disconnected parts) × random traversal specs
(all 3 directions, all 4 edge-filter modes, depth and result caps), each
checked for exact (id, depth) equality against an independent driver-side
BFS with the same truncation rule (depth asc, id asc — the reference
truncates in visit order)."""

import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.operators.traversal import (
    BIDIRECTIONAL,
    EdgeFilter,
    INCOMING,
    OUTGOING,
    bfs,
)

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale

SEED = 20260814
N_GRAPHS = 5
SPECS_PER_GRAPH = 4

EDGE_TYPES = (
    "imports", "defined_in", "references", "contains", "extends",
    "implements", "calls", "depends_on", "method_of", "calls_method",
    "calls_function",
)


def _random_graph(rng):
    n = rng.randint(15, 40)
    nodes = [f"n{i:02d}" for i in range(n)]
    m = rng.randint(n, 3 * n)
    edges = []
    for _ in range(m):
        a, b = rng.sample(nodes, 2)  # no self-loops (reference rejects them)
        edges.append((a, b, rng.choice(EDGE_TYPES)))
    # duplicate a few edges — multigraph semantics must not duplicate results
    for _ in range(rng.randint(0, 5)):
        edges.append(rng.choice(edges))
    return nodes, edges


def _random_spec(rng, nodes):
    direction = rng.choice((OUTGOING, INCOMING, BIDIRECTIONAL))
    mode = rng.choice(("all", "only", "include", "exclude"))
    if mode == "all":
        ef = EdgeFilter.all()
    elif mode == "only":
        ef = EdgeFilter.only(rng.choice(EDGE_TYPES))
    else:
        ts = rng.sample(EDGE_TYPES, rng.randint(1, 4))
        ef = EdgeFilter.include(*ts) if mode == "include" else EdgeFilter.exclude(*ts)
    return {
        "start": rng.choice(nodes),
        "direction": direction,
        "edge_filter": ef,
        "max_depth": rng.randint(1, 6),
        "max_results": rng.choice((3, 10, 10_000)),
    }


def _model_bfs(edges, spec):
    ef = spec["edge_filter"]
    if ef.mode in ("only", "include"):
        kept = [e for e in edges if e[2] in ef.types]
    elif ef.mode == "exclude":
        kept = [e for e in edges if e[2] not in ef.types]
    else:
        kept = edges
    adj = {}
    for a, b, _t in kept:
        if spec["direction"] in (OUTGOING, BIDIRECTIONAL):
            adj.setdefault(a, set()).add(b)
        if spec["direction"] in (INCOMING, BIDIRECTIONAL):
            adj.setdefault(b, set()).add(a)
    depth = {spec["start"]: 0}
    q = deque([spec["start"]])
    while q:
        u = q.popleft()
        if depth[u] == spec["max_depth"]:
            continue
        for v in sorted(adj.get(u, ())):
            if v not in depth:
                depth[v] = depth[u] + 1
                q.append(v)
    ordered = sorted(depth.items(), key=lambda kv: (kv[1], kv[0]))
    return ordered[: spec["max_results"]]


@pytest.mark.parametrize("gi", range(N_GRAPHS))
def test_traversal_fuzz_matches_model(spark, gi):
    rng = random.Random(SEED + gi)
    nodes, edges = _random_graph(rng)
    edf = spark.createDataFrame(edges, "src string, dst string, edge_type string")
    for si in range(SPECS_PER_GRAPH):
        spec = _random_spec(rng, nodes)
        got = sorted(
            ((r["id"], r["depth"]) for r in
             bfs(edf, [spec["start"]], spec["direction"], spec["edge_filter"],
                 spec["max_depth"], spec["max_results"]).collect()),
            key=lambda kv: (kv[1], kv[0]),
        )
        want = _model_bfs(edges, spec)
        assert got == want, (
            f"graph {gi} spec {si} diverged: {spec}\n"
            f"got={got}\nwant={want}"
        )

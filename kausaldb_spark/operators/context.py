"""Batch context queries (SURVEY.md §2.5, C1-C3) — the reference's composite
"give an LLM everything about X" operator.

Reference: ``src/query/context_query.zig:37-243`` (bounded spec: workspace +
≤4 anchors + ≤2 traversal rules + global node cap), executed in three phases
(``src/query/context/engine.zig:171-418``): resolve anchors → frontier-expand
per rule → package blocks + the edge subgraph among reached nodes.

Spark shape: anchor resolution is a handful of filters/joins; expansion
reuses the traversal engine; packaging is two semi-joins. The cost model
(C3) is kept as a driver-side pre-flight guard for semantic parity — real
costing belongs to Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kausaldb_spark.operators import lookup as lk
from kausaldb_spark.operators import traversal as tv

MAX_ANCHORS = 4        # src/query/context_query.zig
MAX_RULES = 2
MAX_RULE_DEPTH = 32
MAX_RULE_NODES = 10_000
MAX_EDGE_TYPES = 8
MAX_RESPONSE_EDGES = 10_000  # src/cli/protocol.zig:27-32 (ShowResponse cap)

# C3 static cost model (µs): anchors*10 + rules*depth*5; caps 1s / 100MB
COST_PER_ANCHOR_US = 10
COST_PER_RULE_DEPTH_US = 5
MAX_COST_US = 1_000_000
MEM_PER_NODE_BYTES = 2_048
MAX_MEM_BYTES = 100 * 1024 * 1024


@dataclass(frozen=True)
class Anchor:
    """block_id | entity_name (unit_type + name) | file_path."""

    kind: str
    block_id: str | None = None
    unit_type: str | None = None
    name: str | None = None
    file_path: str | None = None


@dataclass(frozen=True)
class TraversalRule:
    direction: str = tv.OUTGOING
    edge_filter: tv.EdgeFilter = field(default_factory=tv.EdgeFilter.all)
    max_depth: int = 2
    max_nodes: int = MAX_RULE_NODES


@dataclass(frozen=True)
class ContextQuery:
    workspace: str
    anchors: tuple[Anchor, ...]
    rules: tuple[TraversalRule, ...] = ()
    max_total_nodes: int = MAX_RULE_NODES

    def validate(self) -> None:
        if not (1 <= len(self.anchors) <= MAX_ANCHORS):
            raise ValueError(f"anchors must be 1..{MAX_ANCHORS}")
        if len(self.rules) > MAX_RULES:
            raise ValueError(f"at most {MAX_RULES} rules")
        for r in self.rules:
            if not (1 <= r.max_depth <= MAX_RULE_DEPTH):
                raise ValueError(f"rule depth must be 1..{MAX_RULE_DEPTH}")
            if len(r.edge_filter.types) > MAX_EDGE_TYPES:
                raise ValueError(f"at most {MAX_EDGE_TYPES} edge types per rule")

    def estimated_cost_us(self) -> int:
        return len(self.anchors) * COST_PER_ANCHOR_US + sum(
            r.max_depth * COST_PER_RULE_DEPTH_US for r in self.rules
        )

    def admit(self) -> None:
        """C3 pre-flight: reject queries whose static estimate exceeds the
        budget (semantic parity with the reference's admission control)."""
        self.validate()
        if self.estimated_cost_us() > MAX_COST_US:
            raise ValueError("context query rejected: estimated cost over budget")
        if self.max_total_nodes * MEM_PER_NODE_BYTES > MAX_MEM_BYTES:
            raise ValueError("context query rejected: estimated memory over budget")


def resolve_anchors(blocks: DataFrame, q: ContextQuery) -> DataFrame:
    """Phase 1: anchors → block ids (within the workspace)."""
    frames = []
    for a in q.anchors:
        if a.kind == "block_id":
            frames.append(
                blocks.where(
                    (F.col("id") == a.block_id) & (F.col("codebase") == q.workspace)
                ).select("id")
            )
        elif a.kind == "entity_name":
            frames.append(
                lk.find_by_name(blocks, q.workspace, a.unit_type, a.name).select("id")
            )
        elif a.kind == "file_path":
            frames.append(
                lk.find_by_file_path(blocks, q.workspace, a.file_path).select("id")
            )
        else:
            raise ValueError(f"unknown anchor kind {a.kind}")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.distinct()


def execute_context_query(
    blocks: DataFrame, edges: DataFrame, q: ContextQuery,
    max_edges: int = MAX_RESPONSE_EDGES,
) -> dict[str, DataFrame]:
    """Phases 1-3. Returns {'blocks', 'edges'}: the context block set (with
    min depth) workspace-filtered, and the edge subgraph among reached ids —
    capped at ``max_edges`` in deterministic (src, dst, edge_type) order
    (the reference's ≤10000-edge ShowResponse cap).
    """
    q.admit()
    anchors = resolve_anchors(blocks, q).localCheckpoint(eager=True)

    reached = anchors.withColumn("depth", F.lit(0).cast("int"))
    for rule in q.rules:
        r = tv.bfs(
            edges, anchors, rule.direction, rule.edge_filter,
            rule.max_depth, min(rule.max_nodes, q.max_total_nodes),
        )
        reached = reached.unionByName(r)
    reached = (
        reached.groupBy("id").agg(F.min("depth").alias("depth"))
        .orderBy("depth", "id")
        .limit(q.max_total_nodes)
        .localCheckpoint(eager=True)
    )

    ctx_blocks = (
        blocks.join(reached, "id")
        .where(F.col("codebase") == q.workspace)
        .select("id", "depth", "sequence", "unit_type", "unit_id", "codebase", "content")
    )
    ids = reached.select("id")
    ctx_edges = (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst", "edge_type")
        .distinct()
        .orderBy("src", "dst", "edge_type")
        .limit(max_edges)
    )
    return {"blocks": ctx_blocks, "edges": ctx_edges}

"""Engine facade — the library API mirroring the reference's QueryEngine
(``src/kausaldb.zig:29-45``), with query statistics (X4) and a result cache
(X1).

Cache semantics (``src/query/cache.zig:26-103,181-346``): LRU + TTL keyed by
the query signature; invalidate-all on any mutation. Here a cache entry holds
a *materialized* (localCheckpoint-ed) DataFrame — the Spark analogue of the
reference caching fully-owned result blocks.

Statistics (``src/query/engine.zig:66-131``): per-type counters + latency —
kept driver-side (cheap, exact); executor-side metrics (rows scanned,
shuffle bytes) come from Spark's own listeners and are surfaced by bench.py.
"""

from __future__ import annotations

import json
import time
from collections import OrderedDict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kausaldb_spark.operators import context as cx
from kausaldb_spark.operators import filtering as flt
from kausaldb_spark.operators import lookup as lk
from kausaldb_spark.operators import traversal as tv
from kausaldb_spark.sources import ingest as ing
from kausaldb_spark.storage import BlockStore

CACHE_MAX_ENTRIES = 1000   # src/query/cache.zig defaults
CACHE_TTL_SEC = 30 * 60
# observation pairs retained while waiting for the caller's action; beyond
# this, the oldest (likely abandoned) instrumented queries are dropped
_PENDING_OBS_MAX = 256

# Workspace registry lives IN the store as a config block with a fixed id —
# the reference's exact pattern (deterministic metadata BlockId 0x111...1 +
# JSON content, src/workspace/manager.zig:38-54,295-343); MVCC last-writer-
# wins gives registry updates for free.
REGISTRY_BLOCK_ID = "1" * 32
REGISTRY_CODEBASE = "__workspace__"


@dataclass
class QueryStats:
    queries_by_type: dict[str, int] = field(default_factory=dict)
    total_latency_ns: int = 0
    total_queries: int = 0
    cache_hits: int = 0
    cache_misses: int = 0
    # X4 scan/match parity (r6): the reference reports blocks_scanned +
    # matches per filtered query (src/query/filtering.zig:199-296) and
    # storage read counters (src/query/engine.zig:66-131). Fed by the
    # observe()-instrumented query variants — see KausalEngine.filtered /
    # traverse(with_stats=True).
    rows_scanned: int = 0
    rows_matched: int = 0
    started_at: float = field(default_factory=time.monotonic)

    def record(self, qtype: str, latency_ns: int) -> None:
        self.queries_by_type[qtype] = self.queries_by_type.get(qtype, 0) + 1
        self.total_latency_ns += latency_ns
        self.total_queries += 1

    @property
    def average_query_latency_ns(self) -> float:
        return self.total_latency_ns / self.total_queries if self.total_queries else 0.0

    @property
    def queries_per_second(self) -> float:
        dt = time.monotonic() - self.started_at
        return self.total_queries / dt if dt > 0 else 0.0


class KausalEngine:
    """put/find/traverse/filter/search over a BlockStore."""

    def __init__(self, spark: SparkSession, store_path: str):
        self.spark = spark
        self.store = BlockStore(spark, store_path)
        self.stats = QueryStats()
        self._cache: OrderedDict[tuple, tuple[float, DataFrame]] = OrderedDict()
        # (scan_obs | None, match_obs | None) per stats-instrumented query,
        # harvested lazily by status() once the caller has run an action
        self._pending_obs: list[tuple] = []

    # -- workspace registry (src/workspace/manager.zig:38-54,113-187) -------

    def registry(self) -> dict[str, dict]:
        """Per-codebase link metadata: {name: {path, linked_at, last_sync_at,
        block_count, edge_count}} from the workspace-config block."""
        rows = lk.find_block(self.store.visible(), REGISTRY_BLOCK_ID).select(
            "content"
        ).collect()
        if not rows:
            return {}
        try:
            return json.loads(rows[0][0]).get("codebases", {})
        except (ValueError, AttributeError):
            return {}

    def _save_registry(self, reg: dict[str, dict]) -> None:
        content = json.dumps({"version": 1, "codebases": reg}, sort_keys=True)
        block = self.spark.createDataFrame(
            [(
                REGISTRY_BLOCK_ID, 0, "workspace://metadata", "workspace_config",
                "workspace://metadata", REGISTRY_CODEBASE, "",
                '{"type":"workspace_config"}', content,
            )],
            "id string, sequence bigint, source_uri string, unit_type string,"
            " unit_id string, codebase string, file_path string,"
            " metadata_json string, content string",
        )
        self.store.append_blocks(block)  # resequence → last-writer-wins
        # the registry lives IN the store as a block: rewriting it is a
        # mutation like any other, so the result cache must drop (a cached
        # keyword_search can otherwise serve the pre-write registry block
        # for the TTL — the no-op-sync path hit exactly this)
        self._invalidate()

    def list_codebases(self) -> list[dict]:
        """`kausal list`: what is linked, since when, how big
        (src/workspace/manager.zig:208-222)."""
        return [
            {"name": name, **info} for name, info in sorted(self.registry().items())
        ]

    def _codebase_counts(self, codebase: str) -> dict[str, int]:
        cb_ids = self.store.visible(codebase).select("id")
        e = self.store.visible_edges()
        return {
            "blocks": cb_ids.count(),
            # only edges whose source lives in the linked codebase — not the
            # whole store's edge count
            "edges": e.join(cb_ids, e.src == cb_ids.id, "left_semi").count(),
        }

    def _path_filter(self, df: DataFrame, paths, keep: bool) -> DataFrame:
        """file_path ∈ paths (keep) / ∉ paths (drop) without embedding an
        unbounded literal list in the Catalyst plan — the measured
        plan-analysis blowup traversal's FRONTIER_ISIN_MAX switch exists
        for (traversal.py:47-50). Small sets stay isin (codegen, no join);
        past the threshold the set becomes a broadcast semi/anti join, so
        a 10k-changed-file monorepo sync keeps O(1)-size plans.

        Null policy (ADVICE r9 — the two branches must agree): a NULL
        file_path belongs to NO path set, so keep-mode drops it and
        drop-mode keeps it — exactly the semi/anti-join behavior. The isin
        branch coalesces its three-valued NULL to false so a null row can't
        flip outcome with the size of the path set."""
        paths = list(paths)
        if len(paths) <= 1000:
            pred = F.coalesce(F.col("file_path").isin(paths), F.lit(False))
            return df.where(pred if keep else ~pred)
        pf = self.spark.createDataFrame([(p,) for p in paths], "file_path string")
        return df.join(
            F.broadcast(pf), "file_path", "left_semi" if keep else "left_anti"
        )

    # -- mutations (invalidate cache, reference src/query/engine.zig:493-502)

    def link_codebase(self, root: str, codebase: str) -> dict[str, int]:
        """The CLI `link` flow (§3.3): ingest a source tree into the store,
        record per-file content hashes (sync's change-detection baseline)
        and the registry entry."""
        files = ing.list_files(root)
        # parse once, LITERALLY (r12 opt round): materialize=True checkpoints
        # the combined units+edges relation from ONE mapInPandas pass —
        # blocks, edges, and the reference index all consume cheap filtered
        # projections of it (the previous shape checkpointed units and edges
        # separately, which ran the full file parse twice)
        units, raw_edges = ing.parse_files(self.spark, files, materialize=True)
        file_index = self.spark.createDataFrame(
            [(i, rel) for i, (_, rel) in enumerate(files)],
            "file_idx long, file_path string",
        )
        # ONE lease spans read-base → resolve → append: with
        # resequence=False the caller owns the sequences, so reading
        # max_sequence() outside the lease would let two engines both
        # read the same base and double-assign a range — exactly the
        # race the storage lease exists to exclude. The lease is
        # reentrant; the appends inside renew it.
        with self.store._writer_lease():
            base = self.store.max_sequence()
            blocks, edges = ing.resolve_and_build(
                units, raw_edges, codebase, base, file_index
            )
            self.store.append_blocks(blocks, resequence=False)
            # endpoint-valid BY CONSTRUCTION: resolve_and_build semi-joins
            # both ends against this batch's block ids, and those blocks
            # were appended on the line above — re-checking against a
            # snapshot here would re-read the just-written parquet and
            # shuffle the edge relation twice for a check that cannot fail
            self.store.append_edges(edges, assume_endpoints_exist=True)
            self.store.record_file_state(
                ing.file_hashes(self.spark, files).select(
                    F.lit(codebase).alias("codebase"), "file_path",
                    "content_hash",
                    F.lit(base).cast("bigint").alias("ingest_seq"),
                )
            )
            self._record_refs(codebase, [rel for _, rel in files], raw_edges, base)
        self._invalidate()
        counts = self._codebase_counts(codebase)
        now = int(time.time())
        reg = self.registry()
        reg[codebase] = {
            "path": root, "linked_at": reg.get(codebase, {}).get("linked_at", now),
            "last_sync_at": now,
            "block_count": counts["blocks"], "edge_count": counts["edges"],
        }
        self._save_registry(reg)
        return counts

    def _record_refs(
        self, codebase: str, rel_paths: list[str], raw_edges, base: int
    ) -> None:
        """Append the inverted reference index rows for freshly-parsed files:
        distinct (file, referenced bare name) from the raw edges + a
        name=NULL sentinel per parsed file (coverage marker — a file that
        references nothing is still indexed). Sync's which-files-must-
        re-resolve lookup then joins this index instead of token-scanning
        every stored block's content."""
        sent = self.spark.createDataFrame(
            [(codebase, rel, None, base) for rel in rel_paths],
            "codebase string, file_path string, name string, ingest_seq bigint",
        )
        refs = raw_edges.select(
            F.lit(codebase).alias("codebase"),
            "file_path",
            F.col("dst_name").alias("name"),
            F.lit(base).cast("bigint").alias("ingest_seq"),
        ).distinct()
        self.store.record_ref_names(sent.unionByName(refs))

    def sync_codebase(self, codebase: str, root: str | None = None) -> dict[str, int]:
        """Incremental re-sync: hash-diff the tree against the stored
        file_state, re-parse ONLY changed/new files, tombstone removed ones.
        A no-op sync reads file bytes but parses nothing and appends no
        blocks. (The reference re-ingests the whole tree on sync,
        src/workspace/manager.zig:248-273 — change detection is the
        at-monorepo-scale upgrade its metadata tracking points toward.)

        Resolution scope: re-parsed edges resolve against the changed units
        PLUS the unchanged files' symbol table reconstructed from the store,
        so cross-file targets keep resolving codebase-wide; stale edges of
        re-ingested files are epoch-shadowed (BlockStore.visible_edges).

        Convergence (sync ≡ fresh link, ADVICE r4 #1): changing or removing a
        DEFINITION can flip how *unchanged* files' bare-name references
        resolve (e.g. deleting one of two same-named functions makes the
        other the unique global target). So the affected bare-name set (defs
        in old versions of changed/removed files ∪ defs in new versions of
        changed files) is computed first, and every unchanged file whose
        stored block content mentions one of those names as a token is
        re-parsed and re-resolved too ("files_reresolved" in the stats). The
        candidate lookup joins the inverted ``ref_names`` index maintained at
        every link/sync (change-bounded: affected-names broadcast against an
        index row per (file, referenced name)); stores predating the index
        fall back to a token scan of stored block content (corpus-bounded,
        conservative). Reference semantics:
        ``src/workspace/manager.zig:113-205``, which re-ingests the whole
        tree every sync."""
        reg = self.registry()
        if root is None:
            if codebase not in reg:
                raise ValueError(f"codebase {codebase!r} is not linked")
            root = reg[codebase]["path"]
        files = ing.list_files(root)
        cur = {
            r["file_path"]: r["content_hash"]
            for r in ing.file_hashes(self.spark, files).collect()
        }
        stored = {
            r["file_path"]: r["content_hash"]
            for r in self.store.current_file_state()
            .where(F.col("codebase") == codebase)
            .collect()
        }
        changed = sorted(rel for rel, h in cur.items() if stored.get(rel) != h)
        removed = sorted(
            rel for rel, h in stored.items() if h is not None and rel not in cur
        )
        stats = {
            "files_changed": len(changed), "files_removed": len(removed),
            "files_unchanged": len(cur) - len(changed),
        }
        if not changed and not removed:
            if codebase in reg:
                reg[codebase]["last_sync_at"] = int(time.time())
                self._save_registry(reg)
            return stats

        abs_by_rel = dict((rel, ap) for ap, rel in files)
        affected = changed + removed
        vis_cb = self.store.visible(codebase)

        # affected bare names: defs in the OLD versions of changed/removed
        # files (about to be shadowed) ...
        entity = F.element_at(F.split(F.col("unit_id"), ":"), -1)
        bare_of_unit = F.element_at(F.split(entity, r"\."), -1)
        names = {
            r["bare"]
            for r in self._path_filter(vis_cb, affected, keep=True)
            .select(bare_of_unit.alias("bare"))
            .distinct()
            .collect()
        }
        # ... ∪ defs in the NEW versions of changed files
        units_c = raw_c = None
        if changed:
            changed_files = [(abs_by_rel[rel], rel) for rel in changed]
            # materialize=True: one combined checkpoint = one parse pass
            units_c, raw_c = ing.parse_files(
                self.spark, changed_files, materialize=True
            )
            names |= {
                r["bare"]
                for r in units_c.select(
                    F.element_at(F.split(F.col("name"), r"\."), -1).alias("bare")
                )
                .distinct()
                .collect()
            }

        # unchanged files that REFERENCE an affected name must be re-resolved:
        # their references may now bind to a different target. Candidate
        # lookup prefers the inverted ref_names index (change-bounded: one
        # broadcast join against the names set); stores predating the index
        # fall back to a token scan of stored block content (corpus-bounded,
        # conservative overapproximation). Coverage = every current file has
        # its name=NULL sentinel row, so a partially-indexed legacy store
        # never silently misses candidates.
        reresolve: list[str] = []
        if names:
            names_df = self.spark.createDataFrame(
                [(n,) for n in sorted(names)], "tok string"
            )
            refs = self.store.current_ref_names().where(
                F.col("codebase") == codebase
            )
            n_files_cur = (
                self.store.current_file_state()
                .where(
                    (F.col("codebase") == codebase)
                    & F.col("content_hash").isNotNull()
                )
                .count()
            )
            n_covered = refs.where(F.col("name").isNull()).count()
            if n_covered >= n_files_cur:
                hits = (
                    self._path_filter(refs, affected, keep=False)
                    .join(
                        F.broadcast(names_df), refs.name == names_df.tok, "left_semi"
                    )
                    .select("file_path", F.col("name").alias("tok"))
                )
            else:
                hits = (
                    self._path_filter(vis_cb, affected, keep=False)
                    .select(
                        "file_path",
                        F.explode(
                            F.split(F.col("content"), "[^A-Za-z0-9_]+")
                        ).alias("tok"),
                    )
                    .join(F.broadcast(names_df), "tok", "left_semi")
                )
            # Local-shadow exclusion (r9): resolution is file-local-FIRST
            # (resolve_and_build coalesces uid_file before uid_global), so a
            # file that itself defines bare name n can never change how it
            # resolves n when OTHER files' defs of n change — re-resolving
            # it is pure waste. Without this cut, touching any file that
            # imports `std` cascaded into re-resolving every file in the
            # codebase (each file references its own std import): the r9
            # ingest_incremental bench measured 109/110 files re-resolved
            # for a one-file touch. The anti-join is per (file, name):
            # a file stays a candidate if ANY affected name it references
            # is not locally shadowed.
            local_defs = (
                self._path_filter(vis_cb, affected, keep=False)
                .select("file_path", bare_of_unit.alias("tok"))
                .distinct()
            )
            cand = (
                hits.join(local_defs, ["file_path", "tok"], "left_anti")
                .select("file_path")
                .distinct()
            )
            reresolve = sorted(
                r["file_path"]
                for r in cand.collect()
                if r["file_path"] in abs_by_rel  # still on disk
            )
        stats["files_reresolved"] = len(reresolve)

        touch = changed + reresolve  # files being re-ingested this sync
        shadowed = affected + reresolve
        # ONE lease spans tombstone → read-base → resolve → append →
        # file-state (same double-assignment race as link_codebase:
        # resequence=False means the base read here OWNS a sequence
        # range, which is only safe while holding the writer lease)
        with self.store._writer_lease():
            # tombstone_where takes a Column predicate, so this one site
            # keeps isin; sync batches are change-bounded and a >1000-file
            # tombstone sweep should go through unlink/tombstone jobs
            self.store.tombstone_where(
                (F.col("codebase") == codebase) & F.col("file_path").isin(shadowed)
            )
            base = self.store.max_sequence()
            if touch:
                if reresolve:
                    units_x, raw_x = ing.parse_files(
                        self.spark,
                        [(abs_by_rel[rel], rel) for rel in reresolve],
                        materialize=True,
                    )
                    units = units_c.unionByName(units_x) if changed else units_x
                    raw_edges = raw_c.unionByName(raw_x) if changed else raw_x
                else:
                    units, raw_edges = units_c, raw_c
                file_index = self.spark.createDataFrame(
                    [(i, rel) for i, rel in enumerate(touch)],
                    "file_idx long, file_path string",
                )
                vis_rest = self._path_filter(
                    self.store.visible(codebase), shadowed, keep=False
                )
                extra_symbols = vis_rest.select(
                    "file_path",
                    bare_of_unit.alias("bare"),
                    "unit_id",
                )
                blocks, edges = ing.resolve_and_build(
                    units, raw_edges, codebase, base, file_index,
                    extra_symbols=extra_symbols, known_ids=vis_rest.select("id"),
                )
                self.store.append_blocks(blocks, resequence=False)
                # endpoint-valid BY CONSTRUCTION: resolve_and_build semi-joined
                # both ends against batch blocks ∪ known_ids (vis_rest), and
                # the batch blocks landed on the line above
                self.store.append_edges(edges, assume_endpoints_exist=True)
                self._record_refs(codebase, touch, raw_edges, base)
            # re-resolved files keep their hash but move to the new epoch so
            # their superseded edges are shadowed (BlockStore.visible_edges)
            state_rows = (
                [(codebase, rel, cur[rel], base) for rel in changed]
                + [(codebase, rel, None, base) for rel in removed]
                + [(codebase, rel, cur[rel], base) for rel in reresolve]
            )
            self.store.record_file_state(
                self.spark.createDataFrame(
                    state_rows,
                    "codebase string, file_path string, content_hash string,"
                    " ingest_seq bigint",
                )
            )
        self._invalidate()
        counts = self._codebase_counts(codebase)
        now = int(time.time())
        entry = reg.get(codebase, {"path": root, "linked_at": now})
        entry.update(
            {"path": root, "last_sync_at": now,
             "block_count": counts["blocks"], "edge_count": counts["edges"]}
        )
        reg[codebase] = entry
        self._save_registry(reg)
        return {**stats, **counts}

    def unlink_codebase(self, codebase: str) -> int:
        """Bulk unlink as ONE distributed tombstone job — no block-id list is
        ever collected to the driver (a 10M-block workspace unlinks in
        constant driver memory). Also drops the registry entry (the
        reference's unlink removes only metadata, manager.zig:190-205; ours
        tombstones the blocks too — the stronger cleanup its docstring
        defers to 'future versions')."""
        n = self.store.visible(codebase).count()
        if n:
            self.store.tombstone_codebase(codebase)
        reg = self.registry()
        if codebase in reg:
            del reg[codebase]
            self._save_registry(reg)
        self._invalidate()
        return n

    def put_blocks(self, blocks: DataFrame) -> int:
        hi = self.store.append_blocks(blocks)
        self._invalidate()
        return hi

    def delete_blocks(self, block_ids: list[str]) -> None:
        self.store.delete_blocks(block_ids)
        self._invalidate()

    # -- queries ------------------------------------------------------------

    def _timed(self, qtype: str, key: tuple | None, build) -> DataFrame:
        if key is not None:
            hit = self._cache_get(key)
            if hit is not None:
                self.stats.cache_hits += 1
                # a hit IS a served query: the per-type counters / QPS /
                # latency must include it (reference counts every query,
                # engine.zig:66-131) — its latency is the O(1) lookup
                self.stats.record(qtype, 0)
                return hit
            self.stats.cache_misses += 1
        t0 = time.monotonic_ns()
        df = build()
        if key is not None:
            df = df.localCheckpoint(eager=True)
            self._cache_put(key, df)
        self.stats.record(qtype, time.monotonic_ns() - t0)
        return df

    def find_block(self, block_id: str) -> DataFrame:
        return self._timed(
            "find_block", None, lambda: lk.find_block(self.store.visible(), block_id)
        )

    def find_by_name(self, workspace: str, unit_type: str, name: str) -> DataFrame:
        return self._timed(
            "find_by_name",
            ("find_by_name", workspace, unit_type, name),
            lambda: lk.find_by_name(self.store.visible(workspace), workspace, unit_type, name),
        )

    def find_by_file_path(self, workspace: str, file_path: str) -> DataFrame:
        return self._timed(
            "find_by_file_path",
            ("find_by_file_path", workspace, file_path),
            lambda: lk.find_by_file_path(self.store.visible(workspace), workspace, file_path),
        )

    def keyword_search(self, query: str, threshold: float = 0.7, max_results: int = 500) -> DataFrame:
        return self._timed(
            "keyword_search",
            ("keyword_search", query, threshold, max_results),
            lambda: lk.keyword_search(self.store.visible(), query, threshold, max_results),
        )

    def ranked_search(self, terms: list[str], k: int = 20) -> DataFrame:
        """Multi-term ranked retrieval over block content
        (functions.text.term_match_topk): integer-exact
        (n_terms, total_tf, id) ordering, one scan + TakeOrdered — the
        multi-term extension of the reference's single-keyword scoring
        (src/query/operations.zig:421-437). Returns
        (id, unit_id, codebase, n_terms, total_tf, rank)."""
        from kausaldb_spark.functions.text import term_match_topk

        def build():
            vis = self.store.visible()
            top = term_match_topk(
                vis, list(terms), k=k, text_col="content", id_col="id"
            ).withColumnRenamed("doc_id", "id")
            return top.join(
                vis.select("id", "unit_id", "codebase"), "id"
            ).select(
                "id", "unit_id", "codebase", "n_terms", "total_tf", "rank"
            ).orderBy("rank")

        return self._timed(
            "ranked_search", ("ranked_search", tuple(terms), k), build
        )

    def filtered(
        self, expr: flt.Expr, offset: int = 0, max_results: int = 10_000,
        with_stats: bool = False,
    ) -> DataFrame:
        """F1-F5. ``with_stats=True`` instruments the query with observe()
        counters: rows_scanned = visible blocks examined (the reference's
        blocks_scanned — its filter loop walks every visible block,
        src/query/filtering.zig:199-296), rows_matched = rows out. The
        scan-side CollectMetrics pins the count ABOVE the parquet scan, so
        predicate pushdown is traded for the exact scan count — which is
        precisely the reference's own cost model; the default path keeps
        pushdown and skips the counters. Counters land in stats/status()
        after the caller runs an action (observe adds no extra job)."""
        if not with_stats:
            return self._timed(
                "filtered", None,
                lambda: flt.filtered_query(self.store.visible(), expr, offset, max_results),
            )
        from pyspark.sql import Observation

        def build():
            o_scan, o_match = Observation(), Observation()
            vis = self.store.visible().observe(
                o_scan, F.count(F.lit(1)).alias("rows_scanned")
            )
            out = flt.filtered_query(vis, expr, offset, max_results).observe(
                o_match, F.count(F.lit(1)).alias("rows_matched")
            )
            self._pending_obs.append((o_scan, o_match))
            return out

        return self._timed("filtered", None, build)

    def traverse(
        self,
        start_ids: list[str],
        direction: str = tv.OUTGOING,
        edge_filter: tv.EdgeFilter = tv.EdgeFilter.all(),
        max_depth: int = 10,
        max_results: int = tv.MAX_RESULTS_LIMIT,
        workspace: str | None = None,
        with_stats: bool = False,
    ) -> DataFrame:
        """T1/T9/T10: traversal joined back to visible blocks (+ optional
        workspace filter, reference F7). ``with_stats=True`` adds an
        observe() counter for rows_matched (result rows after the
        workspace filter) — the frontier expansion itself runs eager
        per-level jobs whose visited-set size the traversal caps already
        bound, so the result counter is the honest per-query stat; it
        lands in stats/status() after the caller's action."""

        def build():
            # the persisted session views (snapshot/edges_snapshot), not the
            # parquet-backed derivations: a 1-hop traversal otherwise re-ran
            # the 3 anti-joins + window as ~20 separate AQE jobs and per-job
            # overhead dominated the daemon's show latency (r10 profile:
            # 3.0 s -> ~1.2 s; pushdown buys nothing here — the block join
            # is a broadcast of the ≤10k reached ids either way)
            reached = tv.bfs(
                self.store.edges_snapshot(), start_ids, direction, edge_filter,
                max_depth, max_results,
            )
            out = reached.join(self.store.snapshot(), "id")
            if workspace:
                out = out.where(out.codebase == workspace)
            out = out.select(
                "id", "depth", "unit_type", "unit_id", "codebase", "source_uri", "content"
            )
            if with_stats:
                from pyspark.sql import Observation

                o_match = Observation()
                out = out.observe(o_match, F.count(F.lit(1)).alias("rows_matched"))
                self._pending_obs.append((None, o_match))
            return out

        key = None if with_stats else (
            "traverse", tuple(sorted(start_ids)), direction, edge_filter,
            max_depth, max_results, workspace,
        )
        return self._timed("traverse", key, build)

    def find_callers(self, workspace: str, name: str, max_depth: int = 1) -> DataFrame:
        anchors = [
            r["id"] for r in self.find_by_name(workspace, "function", name).collect()
        ] or [r["id"] for r in self.find_by_name(workspace, "type", name).collect()]
        if not anchors:
            return self.store.visible().limit(0)
        return self.traverse(
            anchors, tv.INCOMING, tv.EdgeFilter.include("calls", "calls_method"),
            max_depth, workspace=workspace,
        ).where("depth > 0")

    def find_callees(self, workspace: str, name: str, max_depth: int = 1) -> DataFrame:
        anchors = [
            r["id"] for r in self.find_by_name(workspace, "function", name).collect()
        ]
        if not anchors:
            return self.store.visible().limit(0)
        return self.traverse(
            anchors, tv.OUTGOING, tv.EdgeFilter.include("calls", "calls_method"),
            max_depth, workspace=workspace,
        ).where("depth > 0")

    def find_references(self, workspace: str, name: str, max_depth: int = 1) -> DataFrame:
        """T9: bidirectional traversal over reference-ish edge types
        (src/query/engine.zig:661-742)."""
        anchors = []
        for ut in ("function", "type", "const"):
            anchors += [r["id"] for r in self.find_by_name(workspace, ut, name).collect()]
        if not anchors:
            return self.store.visible().limit(0)
        return self.traverse(
            anchors, tv.BIDIRECTIONAL,
            tv.EdgeFilter.include("references", "imports", "depends_on"),
            max_depth, workspace=workspace,
        ).where("depth > 0")

    def trace_paths(
        self, workspace: str, from_name: str, to_name: str, max_depth: int = 10
    ) -> DataFrame:
        def one(name):
            for ut in ("function", "type"):
                rows = self.find_by_name(workspace, ut, name).collect()
                if rows:
                    return rows[0]["id"]
            return None

        a, b = one(from_name), one(to_name)
        if a is None or b is None:
            return self.spark.range(0).selectExpr("'' as path", "0 as depth")
        return self._timed(
            "trace", ("trace", a, b, max_depth),
            lambda: tv.find_paths_between(self.store.edges_snapshot(), a, b, max_depth=max_depth),
        )

    def context_query(self, q: cx.ContextQuery) -> dict[str, DataFrame]:
        # multi-read flow (anchors + per-rule expansions re-scan both
        # relations): the persisted session views, per snapshot()'s contract
        return cx.execute_context_query(
            self.store.snapshot(), self.store.edges_snapshot(), q
        )

    def register_sql_views(self, prefix: str = "kausal") -> None:
        """Expose the snapshot as SQL temp views: <prefix>_blocks (visible
        set), <prefix>_edges, <prefix>_blocks_raw — the reference has no SQL
        dialect, but on Spark the whole engine is queryable via spark.sql
        for free once the MVCC view is registered."""
        self.store.visible().createOrReplaceTempView(f"{prefix}_blocks")
        self.store.visible_edges().createOrReplaceTempView(f"{prefix}_edges")
        self.store.blocks_raw().createOrReplaceTempView(f"{prefix}_blocks_raw")

    def _drain_observations(self) -> None:
        """Harvest completed observe() counters into stats. An Observation
        is ready only after the caller ran an action on the instrumented
        DataFrame; unready ones stay pending (getOrEmpty throws pre-action
        — treated as not-ready, never blocks)."""
        still = []
        for o_scan, o_match in self._pending_obs:
            try:
                vals = {}
                for o in (o_scan, o_match):
                    if o is None:
                        continue
                    jm = o._jo.getOrEmpty()  # throws until the action ran
                    if jm.isEmpty():
                        raise LookupError("not ready")
                    vals.update(o.get)  # instant once ready
            except Exception:  # noqa: BLE001 — not ready yet
                still.append((o_scan, o_match))
                continue
            self.stats.rows_scanned += int(vals.get("rows_scanned", 0))
            self.stats.rows_matched += int(vals.get("rows_matched", 0))
        # bound the retained tail: a caller that abandons instrumented
        # DataFrames without ever running an action would otherwise grow
        # this list (and the per-status JVM round-trips) without limit —
        # keep the newest window, silently dropping stats for abandoned
        # queries (they contributed no counters anyway)
        self._pending_obs = still[-_PENDING_OBS_MAX:]

    def status(self) -> dict:
        self._drain_observations()
        return {
            "blocks_visible": self.store.visible().count(),
            # visible_edges, not raw edges(): epoch-shadowed and dangling
            # edge rows are invisible to every query and to the registry's
            # edge_count — status must agree with what queries see
            "edges": self.store.visible_edges().count(),
            "tombstones": self.store.tombstones().count(),
            "max_sequence": self.store.max_sequence(),
            "codebases": self.registry(),
            "queries": dict(self.stats.queries_by_type),
            "cache_hits": self.stats.cache_hits,
            "cache_misses": self.stats.cache_misses,
            # X4 parity: reference blocks_scanned / match counters
            # (src/query/filtering.zig:199-296, engine.zig:66-131) — fed by
            # with_stats=True queries, cumulative since engine start
            "rows_scanned": self.stats.rows_scanned,
            "rows_matched": self.stats.rows_matched,
            "avg_latency_ms": round(self.stats.average_query_latency_ns / 1e6, 2),
        }

    # -- cache plumbing -----------------------------------------------------

    def _cache_get(self, key: tuple):
        ent = self._cache.get(key)
        if ent is None:
            return None
        ts, df = ent
        if time.monotonic() - ts > CACHE_TTL_SEC:
            del self._cache[key]
            return None
        self._cache.move_to_end(key)
        return df

    def _cache_put(self, key: tuple, df: DataFrame) -> None:
        self._cache[key] = (time.monotonic(), df)
        self._cache.move_to_end(key)
        while len(self._cache) > CACHE_MAX_ENTRIES:
            self._cache.popitem(last=False)

    def _invalidate(self) -> None:
        self._cache.clear()

"""Incremental sync (content-hash change detection, per-file re-ingest,
epoch-shadowed edges), the workspace registry, and the max-sequence
high-water mark.

Reference semantics being extended: the reference's sync re-ingests the
whole tree (src/workspace/manager.zig:248-273) and stores workspace
metadata as a fixed-id config block (manager.zig:38-54,295-343); here sync
re-parses only files whose content hash changed and tombstones removed
files' blocks — the monorepo-scale behavior the reference's last_sync
tracking points toward.
"""

import textwrap

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.engine import REGISTRY_BLOCK_ID, KausalEngine
from kausaldb_spark.storage import BlockStore

# r13: heavy gauntlet — opt-in via `-m scale` (see pytest.ini); the
# default driver verify run keeps the unit + oracle-parity suites
pytestmark = pytest.mark.scale

A_PY = textwrap.dedent('''
    def fa():
        return util()
''')
B_PY_V1 = textwrap.dedent('''
    def fb():
        return util()
''')
B_PY_V2 = textwrap.dedent('''
    def fb():
        x = 5
        return util()
''')
B_PY_V3 = textwrap.dedent('''
    def fb():
        return 2
''')
UTIL_PY = textwrap.dedent('''
    def util():
        return 0
''')


@pytest.fixture()
def proj(tmp_path_factory):
    root = tmp_path_factory.mktemp("syncproj")
    (root / "a.py").write_text(A_PY)
    (root / "b.py").write_text(B_PY_V1)
    (root / "util.py").write_text(UTIL_PY)
    return root


def _seqs(eng, codebase, file_path):
    return {
        r["id"]: r["sequence"]
        for r in eng.store.visible()
        .where((F.col("codebase") == codebase) & (F.col("file_path") == file_path))
        .collect()
    }


def _edges_from(eng, src_file):
    return [
        (r["src"], r["dst"], r["edge_type"])
        for r in eng.store.visible_edges()
        .where(F.col("src_file") == src_file)
        .collect()
    ]


def test_incremental_sync(spark, proj, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("sync_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "p")

    util_seqs_1 = _seqs(eng, "p", "util.py")
    b_seqs_1 = _seqs(eng, "p", "b.py")
    a_ids = set(_seqs(eng, "p", "a.py"))
    assert util_seqs_1 and b_seqs_1 and a_ids
    assert len(_edges_from(eng, "a.py")) == 1  # fa -> util
    assert len(_edges_from(eng, "b.py")) == 1  # fb -> util
    raw1 = eng.store.blocks_raw().count()
    max1 = eng.store.max_sequence()

    # modify one file (keeps the cross-file call), delete another
    (proj / "b.py").write_text(B_PY_V2)
    (proj / "a.py").unlink()
    info = eng.sync_codebase("p")
    assert info["files_changed"] == 1 and info["files_removed"] == 1
    assert info["files_unchanged"] == 1

    # unchanged file: same visible versions, same sequences
    assert _seqs(eng, "p", "util.py") == util_seqs_1
    # changed file: same ids (deterministic), strictly newer sequences
    b_seqs_2 = _seqs(eng, "p", "b.py")
    assert set(b_seqs_2) == set(b_seqs_1)
    assert all(s > max1 for s in b_seqs_2.values())
    # deleted file: invisible
    assert not _seqs(eng, "p", "a.py")
    vis_ids = {r["id"] for r in eng.store.visible().select("id").collect()}
    assert not (a_ids & vis_ids)
    # raw store grew by ~one file's units (b.py blocks + registry update),
    # NOT by the whole tree
    raw2 = eng.store.blocks_raw().count()
    assert raw2 == raw1 + len(b_seqs_2) + 1

    # edges: a.py's edge gone (src invisible); b.py's re-resolved cross-file
    # edge appears EXACTLY once (the old epoch's copy is shadowed, no dups)
    assert _edges_from(eng, "a.py") == []
    b_edges = _edges_from(eng, "b.py")
    assert len(b_edges) == 1 and b_edges[0][2] == "calls"

    # second edit removes the call: both endpoint blocks persist, yet the
    # edge must disappear — the epoch rule, not endpoint visibility
    (proj / "b.py").write_text(B_PY_V3)
    eng.sync_codebase("p")
    assert _seqs(eng, "p", "b.py")  # blocks still visible
    assert _edges_from(eng, "b.py") == []

    # no-op sync: nothing re-parsed, no new block versions
    raw3 = eng.store.blocks_raw().count()
    info = eng.sync_codebase("p")
    assert info == {"files_changed": 0, "files_removed": 0, "files_unchanged": 2}
    assert eng.store.blocks_raw().count() == raw3 + 1  # registry stamp only


def test_sync_survives_compact(spark, proj, tmp_path_factory):
    """Compaction folds epoch history; a post-compact sync still detects
    changes against the compacted file_state."""
    store = str(tmp_path_factory.mktemp("sync_store_c"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "p")
    eng.store.compact()
    (proj / "b.py").write_text(B_PY_V2)
    info = eng.sync_codebase("p")
    assert info["files_changed"] == 1 and info["files_removed"] == 0
    assert len(_edges_from(eng, "b.py")) == 1


def test_workspace_registry(spark, proj, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("reg_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "one")
    eng.link_codebase(str(proj), "two")

    cbs = {c["name"]: c for c in eng.list_codebases()}
    assert set(cbs) == {"one", "two"}
    n_vis = eng.store.visible().where(F.col("codebase") == "one").count()
    assert cbs["one"]["block_count"] == n_vis > 0
    assert cbs["one"]["path"] == str(proj)
    assert cbs["one"]["linked_at"] <= cbs["one"]["last_sync_at"]
    assert cbs["one"]["edge_count"] == 2  # fa->util, fb->util
    assert eng.status()["codebases"] == eng.registry()

    # the registry IS a block (reference: fixed-id workspace-config block)
    reg_block = eng.store.visible().where(F.col("id") == REGISTRY_BLOCK_ID)
    assert reg_block.count() == 1

    # unlink drops the entry and the blocks
    eng.unlink_codebase("one")
    assert [c["name"] for c in eng.list_codebases()] == ["two"]
    assert eng.store.visible().where(F.col("codebase") == "one").count() == 0
    # the survivor's data is untouched
    assert eng.store.visible().where(F.col("codebase") == "two").count() == n_vis


def test_max_sequence_high_water_mark(spark, tmp_path_factory):
    """The HWM side-file tracks the scan-derived max through append /
    delete / tombstone / compact, and append no longer rescans the store."""
    import os

    path = str(tmp_path_factory.mktemp("hwm_store"))
    st = BlockStore(spark, path)
    assert st.max_sequence() == 0

    blocks = spark.createDataFrame(
        [(f"{i:032x}", i + 10, "file://x", "function", f"x.py:f{i}", "w", "x.py",
          "{}", "def f(): pass") for i in range(5)],
        "id string, sequence bigint, source_uri string, unit_type string,"
        " unit_id string, codebase string, file_path string,"
        " metadata_json string, content string",
    )
    hi = st.append_blocks(blocks)  # resequences 10..14 -> 1..5
    assert hi == 5 == st._scan_max_sequence() == st.max_sequence()
    assert os.path.exists(st._hwm_path)

    st.delete_blocks([f"{0:032x}", f"{1:032x}"])
    assert st.max_sequence() == st._scan_max_sequence() == 7

    st.tombstone_where(F.col("id") == f"{2:032x}")
    assert st.max_sequence() == st._scan_max_sequence() == 8

    hi = st.append_blocks(blocks)
    assert hi == 13 == st._scan_max_sequence() == st.max_sequence()

    # compact preserves the mark (sequences survive compaction)
    st.compact()
    assert st.max_sequence() == 13
    hi = st.append_blocks(blocks.limit(1))
    assert hi == 14 == st.max_sequence()

    # a deleted side-file is repaired from the scan
    os.remove(st._hwm_path)
    assert st.max_sequence() == st._scan_max_sequence() == 14


def test_sync_equals_fresh_link(spark, tmp_path_factory):
    """Convergence property: after ANY sequence of edits + syncs, the store's
    visible blocks and edges for the codebase equal what a FRESH link of the
    final tree produces (ids/content/edges identical; only sequences may
    differ). This pins the whole incremental machinery — hash diff, partial
    re-parse, cross-file re-resolution, tombstoning, edge epoch shadowing —
    to the semantics of full re-ingestion."""
    import shutil

    root = tmp_path_factory.mktemp("conv")
    files = {
        "f0.py": "def a0():\n    return b1()\n",
        "f1.py": "def b1():\n    return c2()\n",
        "f2.py": "def c2():\n    return 0\n",
        "f3.py": "def d3():\n    return b1() + c2()\n",
    }
    for name, body in files.items():
        (root / name).write_text(body)

    store = str(tmp_path_factory.mktemp("conv_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "cb")

    edit_script = [
        # (action, file, new_content)
        ("mod", "f1.py", "def b1():\n    x = 1\n    return c2()\n"),
        ("del", "f3.py", None),
        ("add", "f4.py", "def e4():\n    return a0()\n"),
        ("mod", "f2.py", "def c2():\n    return 42\n\ndef c2b():\n    return a0()\n"),
        ("del", "f1.py", None),
    ]

    def blocks_snapshot(e, cb):
        return {
            (r["id"], r["unit_id"], r["file_path"], r["content"])
            for r in e.store.visible()
            .where(F.col("codebase") == cb)
            .select("id", "unit_id", "file_path", "content")
            .collect()
        }

    def edges_snapshot(e, cb):
        ids = e.store.visible().where(F.col("codebase") == cb).select("id")
        ev = e.store.visible_edges()
        ev = ev.join(ids, ev.src == ids.id, "left_semi")
        return {(r["src"], r["dst"], r["edge_type"]) for r in ev.collect()}

    for i, (action, name, body) in enumerate(edit_script):
        if action == "del":
            (root / name).unlink()
        else:
            (root / name).write_text(body)
        eng.sync_codebase("cb")

        # fresh link of the current tree into a pristine store
        fresh_store = str(tmp_path_factory.mktemp(f"conv_fresh{i}"))
        fresh = KausalEngine(spark, fresh_store)
        fresh.link_codebase(str(root), "cb")

        assert blocks_snapshot(eng, "cb") == blocks_snapshot(fresh, "cb"), (
            f"block divergence after step {i}: {action} {name}"
        )
        assert edges_snapshot(eng, "cb") == edges_snapshot(fresh, "cb"), (
            f"edge divergence after step {i}: {action} {name}"
        )
        shutil.rmtree(fresh_store, ignore_errors=True)


def test_sync_reresolves_unchanged_callers(spark, tmp_path_factory):
    """ADVICE r4 #1: editing/removing one of two same-named definitions must
    re-resolve the *unchanged* files that reference the name — incremental
    sync has to converge to fresh-link semantics even when the changed file
    isn't the one holding the reference."""
    root = tmp_path_factory.mktemp("rere")
    (root / "x.py").write_text("def greet():\n    return 1\n")
    (root / "y.py").write_text("def greet():\n    return 2\n")
    (root / "caller.py").write_text("def run():\n    return greet()\n")

    store = str(tmp_path_factory.mktemp("rere_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "cb")

    def caller_targets():
        vis = eng.store.visible().where(F.col("codebase") == "cb")
        src = vis.where(F.col("unit_id") == "caller.py:run").select("id")
        ev = eng.store.visible_edges()
        hit = ev.join(src, ev.src == src.id, "left_semi").alias("e").join(
            vis.select(F.col("id").alias("dst"), "unit_id"), "dst"
        )
        return sorted(r["unit_id"] for r in hit.select("unit_id").collect())

    # two same-named defs -> the bare reference is globally ambiguous -> no edge
    assert caller_targets() == []

    # delete one: greet becomes unique; caller.py is UNCHANGED but must rebind
    (root / "y.py").unlink()
    stats = eng.sync_codebase("cb")
    assert stats["files_changed"] == 0 and stats["files_removed"] == 1
    assert stats["files_reresolved"] >= 1
    assert caller_targets() == ["x.py:greet"]

    # add a new same-named def: ambiguity returns, the edge must drop again
    (root / "z.py").write_text("def greet():\n    return 3\n")
    stats = eng.sync_codebase("cb")
    assert stats["files_reresolved"] >= 1
    assert caller_targets() == []


def test_ref_index_drives_reresolution(spark, tmp_path_factory):
    """The inverted ref_names index must (a) be fully covered after a fresh
    link (sentinel per file), (b) drive the same re-resolution outcome as
    the content-scan fallback, and (c) fold correctly through compact()."""
    root = tmp_path_factory.mktemp("refidx")
    (root / "x.py").write_text("def greet():\n    return 1\n")
    (root / "y.py").write_text("def greet():\n    return 2\n")
    (root / "caller.py").write_text("def run():\n    return greet()\n")
    (root / "loner.py").write_text("def solo():\n    return 0\n")

    store = str(tmp_path_factory.mktemp("refidx_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "cb")

    refs = eng.store.current_ref_names().where(F.col("codebase") == "cb")
    # sentinel coverage: one NULL-name row per linked file
    sentinels = {r["file_path"] for r in refs.where(F.col("name").isNull()).collect()}
    assert sentinels == {"x.py", "y.py", "caller.py", "loner.py"}
    # caller.py's greet reference is indexed
    assert refs.where(
        (F.col("file_path") == "caller.py") & (F.col("name") == "greet")
    ).count() == 1

    # indexed path: delete y.py -> caller.py re-resolved, loner.py NOT
    (root / "y.py").unlink()
    stats = eng.sync_codebase("cb")
    assert stats["files_reresolved"] == 1  # exactly caller.py (index is exact)
    vis = eng.store.visible().where(F.col("codebase") == "cb")
    src = vis.where(F.col("unit_id") == "caller.py:run").select("id")
    ev = eng.store.visible_edges()
    assert ev.join(src, ev.src == src.id, "left_semi").count() == 1

    # compact folds the index to current epochs without losing coverage
    eng.store.compact()
    refs2 = eng.store.current_ref_names().where(F.col("codebase") == "cb")
    assert {r["file_path"] for r in refs2.where(F.col("name").isNull()).collect()} == {
        "x.py", "caller.py", "loner.py"
    }


def test_legacy_store_falls_back_to_content_scan(spark, tmp_path_factory):
    """A store written before ref_names existed (simulated by dropping the
    index dir) must still re-resolve via the content-scan fallback — never
    silently miss candidates."""
    import shutil

    root = tmp_path_factory.mktemp("legacy")
    (root / "x.py").write_text("def greet():\n    return 1\n")
    (root / "y.py").write_text("def greet():\n    return 2\n")
    (root / "caller.py").write_text("def run():\n    return greet()\n")
    store = str(tmp_path_factory.mktemp("legacy_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "cb")
    shutil.rmtree(eng.store._ref_names_dir)  # pre-index store

    (root / "y.py").unlink()
    stats = eng.sync_codebase("cb")
    assert stats["files_reresolved"] >= 1
    vis = eng.store.visible().where(F.col("codebase") == "cb")
    src = vis.where(F.col("unit_id") == "caller.py:run").select("id")
    ev = eng.store.visible_edges()
    assert ev.join(src, ev.src == src.id, "left_semi").count() == 1


def test_locally_shadowed_references_skip_the_reresolve_cascade(spark, tmp_path_factory):
    """r9: resolution is file-local-first (resolve_and_build coalesces the
    same-file symbol before the global-unique one), so a file that DEFINES
    a bare name itself can never change how it resolves that name when
    another file's same-named def changes — it must not be dragged into the
    cascade. Without the cut, touching any file sharing a ubiquitous local
    name (every Zig file's `std` import) re-resolved the whole codebase:
    the r9 ingest bench measured 109/110 files re-resolved per one-file
    touch. A file referencing the name WITHOUT a local def still rebinds."""
    root = tmp_path_factory.mktemp("shadow")
    # every file defines its own `helper` (the std-import pattern) ...
    (root / "a.py").write_text(
        "def helper():\n    return 1\n\ndef run_a():\n    return helper()\n"
    )
    (root / "b.py").write_text(
        "def helper():\n    return 2\n\ndef run_b():\n    return helper()\n"
    )
    # ... except the one genuinely cross-file referencer
    (root / "c.py").write_text("def run_c():\n    return lonely()\n")
    (root / "d.py").write_text("def lonely():\n    return 3\n")

    store = str(tmp_path_factory.mktemp("shadow_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "cb")

    # touch d.py: its def `lonely` is an affected name; c.py references it
    # unshadowed -> re-resolves. a.py/b.py reference only their OWN helper
    # -> must stay out of the cascade even though `helper` appears in the
    # affected set when b.py is later touched.
    (root / "d.py").write_text("def lonely():\n    return 33\n")
    stats = eng.sync_codebase("cb")
    assert stats["files_changed"] == 1
    assert stats["files_reresolved"] == 1, stats  # exactly c.py

    # touch b.py (defines `helper`): a.py's helper reference is locally
    # shadowed -> zero files re-resolved
    (root / "b.py").write_text(
        "def helper():\n    return 22\n\ndef run_b():\n    return helper()\n"
    )
    stats = eng.sync_codebase("cb")
    assert stats["files_changed"] == 1
    assert stats["files_reresolved"] == 0, stats

    # convergence check: sync result == fresh link of the same tree
    store2 = str(tmp_path_factory.mktemp("shadow_fresh"))
    eng2 = KausalEngine(spark, store2)
    eng2.link_codebase(str(root), "cb")

    def edge_set(e):
        vis = e.store.visible().where(F.col("codebase") == "cb")
        ev = e.store.visible_edges().alias("ed")
        left = vis.select(F.col("id").alias("src"), F.col("unit_id").alias("su"))
        right = vis.select(F.col("id").alias("dst"), F.col("unit_id").alias("du"))
        return sorted(
            (r["su"], r["du"], r["edge_type"])
            for r in ev.join(left, "src").join(right, "dst")
            .select("su", "du", "edge_type").collect()
        )

    assert edge_set(eng) == edge_set(eng2)


def test_link_and_sync_read_base_under_the_writer_lease(spark, proj, tmp_path_factory):
    """resequence=False means link/sync OWN the sequence range derived from
    max_sequence() — two engines reading the same base outside the lease
    could double-assign it. Spy at the point the base is consumed
    (resolve_and_build assigns the sequences): the engine must hold the
    writer lease there. (max_sequence itself is also read lock-free for
    snapshot-cache keying — those reads don't own a range.)"""
    from kausaldb_spark.sources import ingest as ing_mod

    store = str(tmp_path_factory.mktemp("lease_base_store"))
    eng = KausalEngine(spark, store)
    depths = []
    orig = ing_mod.resolve_and_build

    def spy(*a, **k):
        depths.append(eng.store._lease_depth)
        return orig(*a, **k)

    ing_mod.resolve_and_build = spy
    try:
        eng.link_codebase(str(proj), "cb")
        assert depths and all(d > 0 for d in depths), depths

        depths.clear()
        (proj / "b.py").write_text(B_PY_V2)
        eng.sync_codebase("cb", root=str(proj))
        assert depths and all(d > 0 for d in depths), depths
    finally:
        ing_mod.resolve_and_build = orig


def test_cache_hit_counts_as_a_served_query(spark, proj, tmp_path_factory):
    """X4 parity: the reference counts every query; a cache hit must land
    in the per-type counters, not only in cache_hits."""
    store = str(tmp_path_factory.mktemp("stats_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "cb")
    eng.find_by_name("cb", "function", "fa")
    eng.find_by_name("cb", "function", "fa")
    assert eng.stats.cache_hits == 1
    assert eng.stats.queries_by_type["find_by_name"] == 2


def test_status_edges_agree_with_visible_after_sync(spark, proj, tmp_path_factory):
    """status() must report the VISIBLE edge relation: after a sync the
    old epochs' edge rows remain in parquet but are shadowed."""
    store = str(tmp_path_factory.mktemp("status_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "cb")
    (proj / "b.py").write_text(B_PY_V2)
    eng.sync_codebase("cb", root=str(proj))
    st = eng.status()
    assert st["edges"] == eng.store.visible_edges().count()
    # raw parquet now holds MORE rows than visible (the shadowed epoch)
    assert eng.store.edges().count() > st["edges"]


def test_noop_sync_invalidates_result_cache(spark, proj, tmp_path_factory):
    """A zero-change sync still rewrites the registry block (a store
    mutation): cached results must drop so the next read sees the new
    last_sync_at."""
    store = str(tmp_path_factory.mktemp("noopinv_store"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(proj), "cb")
    eng.find_by_name("cb", "function", "fa")  # populate the cache
    assert len(eng._cache) > 0
    eng.sync_codebase("cb", root=str(proj))   # no files changed
    assert len(eng._cache) == 0


def test_path_filter_null_semantics_agree_across_threshold(spark, tmp_path_factory):
    """ADVICE r9: _path_filter's isin branch (<=1000 paths) and its
    semi/anti-join branch (>1000) must return the SAME rows for a NULL
    file_path. Policy: null belongs to no path set — dropped in keep mode,
    kept in drop mode, on both branches."""
    store = str(tmp_path_factory.mktemp("pf_store"))
    eng = KausalEngine(spark, store)
    df = spark.createDataFrame(
        [("a", "p0"), ("b", None), ("c", "zz")], "id string, file_path string"
    )
    small = ["p0", "p1"]
    big = small + [f"bulk_{i}" for i in range(1200)]
    for paths in (small, big):
        kept = {r.id for r in eng._path_filter(df, paths, keep=True).collect()}
        dropped = {r.id for r in eng._path_filter(df, paths, keep=False).collect()}
        assert kept == {"a"}, (len(paths), kept)
        assert dropped == {"b", "c"}, (len(paths), dropped)

"""Crash-window fault injection for the multi-table commit sequences in
link/sync (r5 verdict §Next-round #4).

The reference proves crash-safety with a deterministic simulation VFS that
injects failures at every I/O point (``src/sim/simulation_vfs.zig``,
scenarios ``src/tests/scenarios/vfs_fault.zig``, ``docs/DESIGN.md:50-57``).
This store's equivalent risk surface is the ORDER of parquet appends inside
one logical commit:

    link: append_blocks → append_edges → record_file_state →
          record_ref_names → save_registry          (engine.py link_codebase)
    sync: tombstone_where → append_blocks → append_edges →
          record_ref_names → record_file_state → save_registry

Each test kills the flow immediately AFTER one append completes (the crash
window between appends), reopens the store with a fresh engine (process
restart), and asserts the recovery invariants:

- **no half-visible graph**: every visible edge endpoint is a visible block,
  at every crash point, before any repair;
- **no sequence reuse**: the HWM side-file is never stale-low (reserve-then-
  write), and no (block id, sequence) pair is ever duplicated;
- **retry converges**: re-running the same link/sync yields exactly the
  visible blocks+edges of a never-crashed control store, and a further sync
  is a no-op.
"""

import hashlib
import os
import shutil
import textwrap

import pytest
from pyspark.sql import functions as F

from kausaldb_spark.engine import KausalEngine

TREE_V1 = {
    "lib.py": '''
def helper_function(x):
    return x + 1

def main():
    return helper_function(41)
''',
    "util.py": '''
def shared_name():
    return 1
''',
    "gone.py": '''
def doomed():
    return 0
''',
}

# sync delta: lib.py edited, gone.py removed, extra.py added; util.py
# unchanged but references nothing affected
TREE_V2 = {
    "lib.py": '''
def helper_function(x):
    return x + 2

def main():
    return helper_function(42)

def newcomer():
    return main()
''',
    "util.py": TREE_V1["util.py"],
    "extra.py": '''
def fresh():
    return 7
''',
}

LINK_POINTS = [
    "append_blocks", "append_edges", "record_file_state",
    "record_ref_names", "save_registry",
]
SYNC_POINTS = ["tombstone_where"] + LINK_POINTS


class _Injected(RuntimeError):
    pass


def _write_tree(root: str, tree: dict[str, str]) -> None:
    os.makedirs(root, exist_ok=True)
    for name in os.listdir(root):
        os.remove(os.path.join(root, name))
    for rel, src in tree.items():
        with open(os.path.join(root, rel), "w", encoding="utf-8") as f:
            f.write(textwrap.dedent(src))


def _arm(engine: KausalEngine, point: str) -> None:
    """Make the named write die immediately AFTER it completes — the
    crash window between this append and the next one."""
    if point == "save_registry":
        orig = engine._save_registry

        def boom(reg):
            orig(reg)
            raise _Injected(point)

        engine._save_registry = boom
        return
    store = engine.store
    orig = getattr(store, point)

    def boom(*a, **kw):
        out = orig(*a, **kw)
        raise _Injected(point)

    setattr(store, point, boom)


def _visible_state(engine: KausalEngine, codebase: str):
    """Comparable snapshot: visible (unit_id, unit_type, content-md5) and
    visible edges as (src unit_id, dst unit_id, edge_type)."""
    vis = engine.store.visible(codebase)
    blocks = {
        (r["unit_id"], r["unit_type"],
         hashlib.md5(r["content"].encode()).hexdigest())
        for r in vis.select("unit_id", "unit_type", "content").collect()
    }
    ids = vis.select("id", "unit_id")
    e = engine.store.visible_edges()
    edges = {
        (r["su"], r["du"], r["edge_type"])
        for r in e.join(ids.withColumnRenamed("unit_id", "su"), e.src == ids.id)
        .select("su", "dst", "edge_type")
        .join(
            ids.withColumnRenamed("unit_id", "du").withColumnRenamed("id", "id2"),
            F.col("dst") == F.col("id2"),
        )
        .select("su", "du", "edge_type")
        .collect()
    }
    return blocks, edges


def _assert_invariants(engine: KausalEngine, codebase: str) -> None:
    """Mid-crash invariants that must hold at EVERY window, pre-repair."""
    store = engine.store
    # every visible edge endpoint resolves to a visible block
    ids = store.visible().select("id")
    e = store.visible_edges()
    dangling = (
        e.join(ids, e.src == ids.id, "left_anti").count()
        + e.join(ids, e.dst == ids.id, "left_anti").count()
    )
    assert dangling == 0, f"{dangling} dangling edge endpoints"
    # HWM is never stale-low (reserve-then-write) → no sequence reuse
    raw_hi = store.blocks_raw().agg(F.max("sequence")).collect()[0][0] or 0
    assert store.max_sequence() >= raw_hi
    # no (id, sequence) duplicate — MVCC order stays unambiguous
    dup = (
        store.blocks_raw().groupBy("id", "sequence").count()
        .where(F.col("count") > 1).count()
    )
    assert dup == 0


@pytest.fixture(scope="module")
def control(spark, tmp_path_factory):
    """Never-crashed control: link v1 → snapshot; sync to v2 → snapshot."""
    root = str(tmp_path_factory.mktemp("ctrl_tree"))
    store = str(tmp_path_factory.mktemp("ctrl_store"))
    _write_tree(root, TREE_V1)
    eng = KausalEngine(spark, store)
    eng.link_codebase(root, "cb")
    after_link = _visible_state(eng, "cb")
    _write_tree(root, TREE_V2)
    eng.sync_codebase("cb")
    after_sync = _visible_state(eng, "cb")
    return after_link, after_sync


@pytest.mark.parametrize("point", LINK_POINTS)
def test_link_crash_window(spark, tmp_path_factory, control, point):
    root = str(tmp_path_factory.mktemp(f"lnk_tree_{point}"))
    store = str(tmp_path_factory.mktemp(f"lnk_store_{point}"))
    _write_tree(root, TREE_V1)
    eng = KausalEngine(spark, store)
    _arm(eng, point)
    with pytest.raises(_Injected):
        eng.link_codebase(root, "cb")

    # process restart: fresh engine over the same store path
    eng2 = KausalEngine(spark, store)
    _assert_invariants(eng2, "cb")

    # retry the same command; state must converge to the control
    eng2.link_codebase(root, "cb")
    _assert_invariants(eng2, "cb")
    assert _visible_state(eng2, "cb") == control[0]
    # and a follow-up sync sees nothing to do
    stats = eng2.sync_codebase("cb")
    assert stats["files_changed"] == 0 and stats["files_removed"] == 0


@pytest.mark.parametrize("point", SYNC_POINTS)
def test_sync_crash_window(spark, tmp_path_factory, control, point):
    root = str(tmp_path_factory.mktemp(f"snc_tree_{point}"))
    store = str(tmp_path_factory.mktemp(f"snc_store_{point}"))
    _write_tree(root, TREE_V1)
    eng = KausalEngine(spark, store)
    eng.link_codebase(root, "cb")
    _write_tree(root, TREE_V2)

    _arm(eng, point)
    with pytest.raises(_Injected):
        eng.sync_codebase("cb")

    eng2 = KausalEngine(spark, store)
    _assert_invariants(eng2, "cb")

    # retry converges (crash-before-file_state leaves hashes stale, so the
    # retry re-parses; crash-after leaves a fully-committed sync and the
    # retry is a no-op — both must land on the control state)
    eng2.sync_codebase("cb")
    _assert_invariants(eng2, "cb")
    assert _visible_state(eng2, "cb") == control[1]
    stats = eng2.sync_codebase("cb")
    assert stats["files_changed"] == 0 and stats["files_removed"] == 0


def test_link_crash_before_refs_then_sync_falls_back(spark, tmp_path_factory, control):
    """The one asymmetric window: link commits file_state BEFORE ref_names,
    so a crash between them leaves current hashes with a hole in the
    inverted index. The next sync must detect partial coverage (missing
    name=NULL sentinels) and fall back to the conservative token scan —
    still converging to the control."""
    root = str(tmp_path_factory.mktemp("ref_tree"))
    store = str(tmp_path_factory.mktemp("ref_store"))
    _write_tree(root, TREE_V1)
    eng = KausalEngine(spark, store)
    _arm(eng, "record_file_state")  # dies before record_ref_names runs
    with pytest.raises(_Injected):
        eng.link_codebase(root, "cb")

    eng2 = KausalEngine(spark, store)
    # sentinel coverage is incomplete: fewer indexed files than current files
    n_files = (
        eng2.store.current_file_state()
        .where(F.col("content_hash").isNotNull()).count()
    )
    n_covered = (
        eng2.store.current_ref_names().where(F.col("name").isNull()).count()
    )
    assert n_covered < n_files

    _write_tree(root, TREE_V2)
    # the crash also preceded save_registry, so the retry names the root
    # explicitly (the CLI `sync --path` form)
    eng2.sync_codebase("cb", root=root)
    assert _visible_state(eng2, "cb") == control[1]

"""Parquet-backed block store — the write path (SURVEY.md §2.1 S1-S3).

The reference's LSM machinery (WAL → memtable → SSTable flush → compaction,
``src/storage/engine.zig:644-763``) exists to give durable ordered appends
with last-writer-wins reads. Columnar storage gets the same contract from
append-only parquet + the MVCC snapshot view:

- ``append_blocks`` (S1): assign a monotone sequence batch, append — never
  rewrite. Blocks are partitioned by ``codebase`` (the workspace filter is a
  partition-pruned scan, reference F7).
- ``append_edges`` (S2): endpoint existence enforced with two semi-joins
  against the visible snapshot (``src/storage/engine.zig:1207-1217``).
- ``delete_blocks`` (S3): tombstone append; shadowing happens at read time
  in the snapshot view (``src/storage/tombstone.zig``).
- reads (S4/S5): ``visible()`` = snapshot view over all appended versions.

Sequence assignment: each append claims a contiguous batch
``[hi+1, hi+n]`` read from the store's current max — single-writer semantics,
like the reference's global counter. (A multi-writer deployment would
replace this with Delta Lake's transaction log; plain parquet keeps the
container dependency-free.)

Compaction analogue: ``compact()`` rewrites the store to just the visible
snapshot (dropping shadowed versions + consumed tombstones) — same effect as
the reference's tiered compaction, as a batch job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kausaldb_spark.snapshot import visible_blocks

_EMPTY_TOMB = "block_id string, sequence bigint, deletion_timestamp bigint"


class BlockStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._blocks_dir = os.path.join(path, "blocks")
        self._edges_dir = os.path.join(path, "edges")
        self._tomb_dir = os.path.join(path, "tombstones")

    # -- raw table accessors ------------------------------------------------

    def _read_or_empty(self, d: str, schema_of: DataFrame | str) -> DataFrame:
        try:
            return self.spark.read.parquet(d)
        except Exception:
            if isinstance(schema_of, str):
                return self.spark.createDataFrame([], schema_of)
            return schema_of.limit(0)

    def blocks_raw(self) -> DataFrame:
        return self._read_or_empty(
            self._blocks_dir,
            "id string, sequence bigint, source_uri string, unit_type string,"
            " unit_id string, codebase string, file_path string,"
            " metadata_json string, content string",
        )

    def edges(self) -> DataFrame:
        return self._read_or_empty(self._edges_dir, "src string, dst string, edge_type string")

    def tombstones(self) -> DataFrame:
        return self._read_or_empty(self._tomb_dir, _EMPTY_TOMB)

    # -- sequence management ------------------------------------------------

    def max_sequence(self) -> int:
        hi_b = self.blocks_raw().agg(F.max("sequence")).collect()[0][0] or 0
        hi_t = self.tombstones().agg(F.max("sequence")).collect()[0][0] or 0
        return max(hi_b, hi_t)

    # -- writes -------------------------------------------------------------

    def append_blocks(self, blocks: DataFrame, resequence: bool = True) -> int:
        """S1: append a batch. With ``resequence``, incoming sequences are
        shifted above the store's current max (write order = MVCC order).
        Returns the new high-water sequence."""
        base = self.max_sequence()
        if resequence:
            lo = blocks.agg(F.min("sequence")).collect()[0][0] or 0
            blocks = blocks.withColumn(
                "sequence", (F.col("sequence") - lo + base + 1).cast("bigint")
            )
        blocks.write.mode("append").partitionBy("codebase").parquet(self._blocks_dir)
        return self.max_sequence()

    def append_edges(self, edges: DataFrame) -> None:
        """S2: endpoints must exist in the *visible* snapshot at insert time."""
        ids = self.visible().select("id")
        checked = (
            edges.join(ids, edges.src == ids.id, "left_semi")
            .join(ids, edges.dst == ids.id, "left_semi")
            .where(F.col("src") != F.col("dst"))
        )
        checked.write.mode("append").parquet(self._edges_dir)

    def delete_blocks(self, block_ids: list[str]) -> None:
        """S3: tombstones with a fresh sequence above everything current."""
        seq = self.max_sequence() + 1
        tomb = self.spark.createDataFrame(
            [(b, seq + i, (seq + i) * 1000) for i, b in enumerate(sorted(block_ids))],
            _EMPTY_TOMB,
        )
        tomb.write.mode("append").parquet(self._tomb_dir)

    # -- reads --------------------------------------------------------------

    def visible(self) -> DataFrame:
        """S4: the MVCC snapshot every query reads."""
        return visible_blocks(self.blocks_raw(), self.tombstones())

    def visible_edges(self) -> DataFrame:
        ids = self.visible().select("id")
        e = self.edges()
        return e.join(ids, e.src == ids.id, "left_semi").join(
            ids, e.dst == ids.id, "left_semi"
        )

    # -- cluster-scale layout ----------------------------------------------

    def materialize_bucketed(self, table_prefix: str, buckets: int = 32) -> None:
        """Write the snapshot as *bucketed* tables (blocks by id, edges by
        src): multi-hop edge-edge joins and id-keyed lookups then run
        without a shuffle exchange — the co-located-join layout a 100 TB
        deployment would maintain. (Plain parquet files can't carry bucket
        metadata; this uses the session catalog's saveAsTable.)"""
        import shutil
        from urllib.parse import urlparse

        spark = self.spark
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (f"{table_prefix}_blocks_b", f"{table_prefix}_edges_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # a dropped-but-orphaned location (e.g. from a previous session)
            # blocks managed-table creation — clear it
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        self.visible().write.bucketBy(buckets, "id").sortBy("id").saveAsTable(
            f"{table_prefix}_blocks_b"
        )
        self.visible_edges().write.bucketBy(buckets, "src").sortBy("src").saveAsTable(
            f"{table_prefix}_edges_b"
        )

    # -- maintenance --------------------------------------------------------

    def compact(self) -> None:
        """Rewrite to the visible snapshot only (drops shadowed versions and
        consumed tombstones) — the compaction analogue, run as a batch job."""
        vis = self.visible().localCheckpoint(eager=True)
        live_edges = self.visible_edges().localCheckpoint(eager=True)
        vis.write.mode("overwrite").partitionBy("codebase").parquet(self._blocks_dir)
        live_edges.write.mode("overwrite").parquet(self._edges_dir)
        empty = self.spark.createDataFrame([], _EMPTY_TOMB)
        empty.write.mode("overwrite").parquet(self._tomb_dir)

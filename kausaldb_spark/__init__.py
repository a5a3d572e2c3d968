"""kausaldb_spark — a PySpark-native graph/context analytics engine.

Re-implements the query semantics of the reference engine (kausaldb: a
single-node LSM-backed graph database for code context retrieval) on top of
Apache Spark DataFrames, designed for 100 TB-scale clusters:

- ``graphmodel``: deterministic blocks/edges/tombstones derivation from the
  TPC-H-ish testdata (FIXTURES.md §6) — the bulk-scale graph fixture.
- ``snapshot``: MVCC snapshot view (last-writer-wins + tombstone shadowing),
  semantics of reference ``src/storage/engine.zig:839-925``.
- ``operators``: filtering (F1-F7), lookups (N1-N4), traversal (T1-T10),
  context queries (C1-C3) per SURVEY.md §2.
- ``functions``: keyword search, text analysis, dedup (exact/MinHash/SimHash/
  n-gram Jaccard), embedding similarity — the training-data pipeline ops.
- ``sources``: testdata loaders + Python-source ingestion (S7-S10).
- ``streaming``: Structured Streaming ingestion + windowed event analytics.
"""

__version__ = "0.1.0"

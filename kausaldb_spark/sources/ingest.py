"""Source-tree ingestion: directory walk → distributed parse → blocks/edges.

Reference pipeline (SURVEY.md §3.3): file discovery with extension/size
filters (``src/ingestion/ingest_directory.zig:37-173``), per-file AST parse
emitting units (function/type/const/var/import/test) and syntactic edges
(``src/ingestion/parsers/zig_parser.zig:23-68``), semantic resolution of edge
targets to qualified names (``src/ingestion/semantic_resolver.zig:88-163``),
then block/edge writes (``src/ingestion/ingest_file.zig:85-118``).

Spark shape: the *driver* lists files (cheap metadata op), executors read and
parse them via ``mapInPandas`` batches (the parser is Python ``ast`` — a real
parser has no JVM builtin, so this is the legitimate Pandas-UDF tier), and
resolution is a pair of DataFrame joins (exact qualified name, then
same-file fallback) — never a driver-side loop over units.

At 100 TB (monorepo-scale ingest): file listing comes from a manifest table
instead of os.walk; parse stays embarrassingly parallel (one file never
spans partitions); the resolver joins shuffle by symbol name — skew on hub
names (e.g. ``main``) is why the symbol table keeps (codebase, name) as the
key, bounding any one group by the codebase size.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_EXTENSIONS = (".py",)
TEXT_EXTENSIONS = (".md", ".txt", ".rst")
MAX_FILE_SIZE = 1_048_576  # 1 MiB cap, mirrors ingest_directory.zig config

_UNIT_SCHEMA = StructType(
    [
        StructField("file_path", StringType()),
        StructField("unit_type", StringType()),
        StructField("name", StringType()),          # qualified: Class.method
        StructField("container", StringType()),     # enclosing class or ''
        StructField("line_start", LongType()),
        StructField("line_end", LongType()),
        StructField("content", StringType()),
        StructField("parse_error", StringType()),
    ]
)

_EDGE_SCHEMA = StructType(
    [
        StructField("file_path", StringType()),
        StructField("src_name", StringType()),      # qualified unit name
        StructField("dst_name", StringType()),      # raw target (unresolved)
        StructField("edge_type", StringType()),
    ]
)


def list_files(
    root: str,
    extensions: tuple[str, ...] = DEFAULT_EXTENSIONS + TEXT_EXTENSIONS,
    max_size: int = MAX_FILE_SIZE,
) -> list[tuple[str, str]]:
    """(abs_path, rel_path) of ingestible files under root. Driver-side —
    directory metadata, not data."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "__pycache__"))]
        for fn in sorted(filenames):
            if not fn.endswith(extensions):
                continue
            ap = os.path.join(dirpath, fn)
            try:
                if os.path.getsize(ap) > max_size:
                    continue
            except OSError:
                continue
            out.append((ap, os.path.relpath(ap, root)))
    return sorted(out, key=lambda x: x[1])


def _parse_python(rel_path: str, source: str) -> tuple[list, list]:
    """One file → (units, syntactic edges). Pure Python, runs on executors."""
    import ast

    units, edges = [], []
    lines = source.splitlines()

    def seg(node):
        a, b = node.lineno, getattr(node, "end_lineno", node.lineno)
        return "\n".join(lines[a - 1 : b]), a, b

    try:
        tree = ast.parse(source)
    except SyntaxError as exc:
        return [(rel_path, "document", os.path.basename(rel_path), "", 1,
                 max(1, len(lines)), source, f"syntax error: {exc.msg}")], []

    class Walker(ast.NodeVisitor):
        def __init__(self):
            self.container = ""

        def _unit(self, node, unit_type, name):
            content, a, b = seg(node)
            qual = f"{self.container}.{name}" if self.container else name
            units.append((rel_path, unit_type, qual, self.container, a, b, content, None))
            return qual

        def visit_FunctionDef(self, node, is_async=False):
            unit_type = "test" if node.name.startswith("test_") else "function"
            qual = self._unit(node, unit_type, node.name)
            if self.container:
                edges.append((rel_path, qual, self.container, "method_of"))
            for call in ast.walk(node):
                if isinstance(call, ast.Call):
                    fn = call.func
                    if isinstance(fn, ast.Name):
                        edges.append((rel_path, qual, fn.id, "calls"))
                    elif isinstance(fn, ast.Attribute):
                        edges.append((rel_path, qual, fn.attr, "calls_method"))
            # do not recurse: nested defs belong to their parent's content

        def visit_AsyncFunctionDef(self, node):
            self.visit_FunctionDef(node)

        def visit_ClassDef(self, node):
            qual = self._unit(node, "type", node.name)
            for base in node.bases:
                if isinstance(base, ast.Name):
                    edges.append((rel_path, qual, base.id, "extends"))
            prev, self.container = self.container, node.name
            for child in node.body:
                self.visit(child)
            self.container = prev

        def visit_Import(self, node):
            for alias in node.names:
                qual = self._unit(node, "import", alias.asname or alias.name.split(".")[0])
                edges.append((rel_path, qual, alias.name, "imports"))

        def visit_ImportFrom(self, node):
            for alias in node.names:
                qual = self._unit(node, "import", alias.asname or alias.name)
                edges.append((rel_path, qual, alias.name, "imports"))

        def visit_Assign(self, node):
            if not self.container:
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        ut = "const" if tgt.id.isupper() else "var"
                        self._unit(node, ut, tgt.id)

    w = Walker()
    for child in tree.body:
        w.visit(child)
    return units, edges


def parse_files(
    spark: SparkSession, files: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Distributed parse: (units_df, raw_edges_df). Each partition parses its
    file subset inside one Python worker (Arrow-batched)."""
    n_part = max(1, min(len(files), 32))
    paths_df = spark.createDataFrame(
        files, "abs_path string, file_path string"
    ).repartition(n_part)

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ap, rp in zip(pdf["abs_path"], pdf["file_path"]):
                try:
                    with open(ap, encoding="utf-8", errors="replace") as f:
                        src = f.read()
                except OSError as exc:
                    rows.append((rp, "document", os.path.basename(rp), "", 1, 1,
                                 "", f"read error: {exc}"))
                    continue
                if rp.endswith(DEFAULT_EXTENSIONS):
                    units, _ = _parse_python(rp, src)
                    rows.extend(units)
                else:
                    rows.append((rp, "document", os.path.basename(rp), "", 1,
                                 max(1, src.count("\n") + 1), src, None))
            yield pd.DataFrame(rows, columns=[f.name for f in _UNIT_SCHEMA.fields])

    def edge_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ap, rp in zip(pdf["abs_path"], pdf["file_path"]):
                if not rp.endswith(DEFAULT_EXTENSIONS):
                    continue
                try:
                    with open(ap, encoding="utf-8", errors="replace") as f:
                        src = f.read()
                except OSError:
                    continue
                _, edges = _parse_python(rp, src)
                rows.extend(edges)
            yield pd.DataFrame(rows, columns=[f.name for f in _EDGE_SCHEMA.fields])

    units = paths_df.mapInPandas(parse_batch, _UNIT_SCHEMA)
    raw_edges = paths_df.mapInPandas(edge_batch, _EDGE_SCHEMA)
    return units, raw_edges


def resolve_and_build(
    units: DataFrame,
    raw_edges: DataFrame,
    codebase: str,
    sequence_base: int = 0,
    file_index: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Semantic resolution + ContextBlock/GraphEdge materialization.

    Resolution (S9 semantics): an edge's raw target name resolves to
    (1) a unit in the same file whose bare name matches, else
    (2) the unique unit with that bare name anywhere in the codebase.
    Unresolved edges are dropped (the reference drops edges whose endpoints
    don't exist, ``src/storage/engine.zig:1207-1217``).

    Sequence assignment: base + file_idx*100_000 + row_number within the
    file. The per-file window keeps sequence generation fully parallel (a
    single global row_number would funnel every row through one partition);
    MVCC only needs sequences to be unique within a batch and monotone
    *across* batches, which ``sequence_base`` provides.
    """
    from pyspark.sql.window import Window

    if file_index is None:
        paths = sorted(
            r["file_path"] for r in units.select("file_path").distinct().collect()
        )
        file_index = units.sparkSession.createDataFrame(
            list(enumerate(paths)), "file_idx long, file_path string"
        )
    units = units.join(F.broadcast(file_index), "file_path")

    uid = F.concat(F.col("file_path"), F.lit(":"), F.col("name"))
    in_file = F.row_number().over(
        Window.partitionBy("file_path").orderBy("line_start", "name")
    )
    seq = F.lit(sequence_base) + F.col("file_idx") * 100_000 + in_file
    err_json = F.when(
        F.col("parse_error").isNotNull(),
        F.concat(
            F.lit(',"parse_error":"'),
            F.regexp_replace(F.col("parse_error"), '"', "'"),
            F.lit('"'),
        ),
    ).otherwise(F.lit(""))
    blocks = units.select(
        F.md5(F.concat(F.lit(codebase), F.lit("/"), uid)).alias("id"),
        seq.cast("bigint").alias("sequence"),
        F.concat(
            F.lit("file://"), F.col("file_path"), F.lit("#L"),
            F.col("line_start").cast("string"), F.lit("-"), F.col("line_end").cast("string"),
        ).alias("source_uri"),
        "unit_type",
        uid.alias("unit_id"),
        F.lit(codebase).alias("codebase"),
        "file_path",
        F.concat(
            F.lit('{"unit_type":"'), F.col("unit_type"),
            F.lit('","unit_id":"'), uid,
            F.lit('","codebase":"'), F.lit(codebase),
            F.lit('","file_path":"'), F.col("file_path"), F.lit('"'),
            err_json,
            F.lit("}"),
        ).alias("metadata_json"),
        "content",
    )

    # symbol table: bare name → qualified unit, per file and global
    syms = units.select(
        "file_path",
        F.element_at(F.split(F.col("name"), r"\."), -1).alias("bare"),
        F.concat(F.col("file_path"), F.lit(":"), F.col("name")).alias("unit_id"),
    )
    per_file = syms.groupBy("file_path", "bare").agg(
        F.min("unit_id").alias("uid_file")
    )
    global_unique = (
        syms.groupBy("bare")
        .agg(F.countDistinct("unit_id").alias("n"), F.min("unit_id").alias("uid_global"))
        .where(F.col("n") == 1)
        .select("bare", "uid_global")
    )

    e = (
        raw_edges.join(
            per_file,
            (raw_edges.file_path == per_file.file_path)
            & (raw_edges.dst_name == per_file.bare),
            "left",
        )
        .drop(per_file.file_path)
        .drop(per_file.bare)
        .join(global_unique, raw_edges.dst_name == global_unique.bare, "left")
        .withColumn("dst_uid", F.coalesce(F.col("uid_file"), F.col("uid_global")))
        .where(F.col("dst_uid").isNotNull())
    )
    edges = e.select(
        F.md5(
            F.concat(F.lit(codebase), F.lit("/"), F.col("file_path"), F.lit(":"), F.col("src_name"))
        ).alias("src"),
        F.md5(F.concat(F.lit(codebase), F.lit("/"), F.col("dst_uid"))).alias("dst"),
        "edge_type",
    ).where(F.col("src") != F.col("dst"))

    # endpoints must exist (put_edge contract)
    ids = blocks.select("id")
    edges = (
        edges.join(ids, edges.src == ids.id, "left_semi")
        .join(ids, edges.dst == ids.id, "left_semi")
    )
    return blocks, edges


def ingest_directory(
    spark: SparkSession, root: str, codebase: str, sequence_base: int = 0
) -> tuple[DataFrame, DataFrame]:
    """S7 end-to-end: walk → parse → resolve → (blocks, edges)."""
    files = list_files(root)
    units, raw_edges = parse_files(spark, files)
    file_index = spark.createDataFrame(
        [(i, rel) for i, (_, rel) in enumerate(files)], "file_idx long, file_path string"
    )
    return resolve_and_build(units, raw_edges, codebase, sequence_base, file_index)

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

import fnmatch
import os
import re
import subprocess
from collections.abc import Iterator
from dataclasses import dataclass

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
ZIG_EXTENSIONS = (".zig",)
TEXT_EXTENSIONS = (".md", ".txt", ".rst")
CODE_EXTENSIONS = DEFAULT_EXTENSIONS + ZIG_EXTENSIONS
MAX_FILE_SIZE = 1_048_576  # 1 MiB cap, mirrors ingest_directory.zig config


@dataclass(frozen=True)
class IngestConfig:
    """File-discovery configuration — parity with the reference's
    ``IngestionConfig`` (``src/ingestion/ingest_directory.zig:37-173``):
    per-config extension set, include/exclude glob patterns over the
    relative path, size cap, and git-aware listing (``git ls-files``
    honors .gitignore like the reference's walker honors its excludes;
    falls back to a plain directory walk outside a repo)."""

    extensions: tuple[str, ...] = CODE_EXTENSIONS + TEXT_EXTENSIONS
    include: tuple[str, ...] = ()  # glob patterns; empty = everything
    exclude: tuple[str, ...] = ()  # e.g. ("vendor/*", "*_generated.py")
    max_file_size: int = MAX_FILE_SIZE
    prefer_git: bool = True

    def admits(self, rel_path: str) -> bool:
        if not rel_path.endswith(self.extensions):
            return False
        if self.include and not any(fnmatch.fnmatch(rel_path, p) for p in self.include):
            return False
        return not any(fnmatch.fnmatch(rel_path, p) for p in self.exclude)

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


def _git_candidates(root: str) -> list[str] | None:
    """Relative paths from ``git ls-files`` (tracked + untracked-unignored,
    the reference walker's effective file set); None when root is not a
    work tree or git is unavailable."""
    try:
        res = subprocess.run(
            ["git", "-C", root, "ls-files", "--cached", "--others",
             "--exclude-standard"],
            capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if res.returncode != 0:
        return None
    return [p for p in res.stdout.splitlines() if p]


def _walk_candidates(root: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "__pycache__"))]
        for fn in sorted(filenames):
            out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return out


def list_files(
    root: str,
    extensions: tuple[str, ...] | None = None,
    max_size: int | None = None,
    config: IngestConfig | None = None,
) -> list[tuple[str, str]]:
    """(abs_path, rel_path) of ingestible files under root. Driver-side —
    directory metadata, not data. ``config`` carries the discovery policy;
    the ``extensions``/``max_size`` kwargs are a back-compat shorthand."""
    if config is None:
        config = IngestConfig(
            extensions=extensions or IngestConfig.extensions,
            max_file_size=max_size or MAX_FILE_SIZE,
        )
    candidates = _git_candidates(root) if config.prefer_git else None
    if candidates is None:
        candidates = _walk_candidates(root)
    out = []
    for rel in candidates:
        if not config.admits(rel):
            continue
        ap = os.path.join(root, rel)
        try:
            if os.path.getsize(ap) > config.max_file_size:
                continue
        except OSError:
            continue
        out.append((ap, rel))
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


# -- Zig parser tier ---------------------------------------------------------
# Line-heuristic extractor matching the unit taxonomy of the reference's AST
# walker (src/ingestion/parsers/zig_parser.zig:80-134,317-440): units
# function/type/const/var/import/test with Container.name qualification,
# edges calls / calls_method / method_of / imports. tree-sitter is not in
# the container, so structure comes from brace-depth scanning with strings
# and comments stripped. Scope rules match the reference's golden cases
# (zig_parser.zig:673-975): TYPE and IMPORT decls are emitted at ANY scope,
# including inside function bodies ("parse nested function", "parse local
# const struct declaration" require Inner/LocalStruct units). Plain
# const/var decls are likewise emitted at ANY scope (r6 — the reference's
# process_var_decl: "create unit regardless of scope",
# zig_parser.zig:497-498), EXCEPT inside test bodies: the reference's
# walk_children has no .test_decl arm (zig_parser.zig:138-316), so test
# bodies are never walked and their locals produce no units. Because this
# store keys blocks by md5(codebase/file:name), fn-local const/var names
# (the same `const allocator = ...` in twenty fns of one file) are
# qualified by their enclosing function — the reference keeps bare names
# with a parent_container field and defers disambiguation to a higher
# level; the qualified spelling carries the same information in the id.
# Multiline declarations whose `struct {` / `@import(` opener sits on a
# continuation line (`pub const Foo =\n    struct {`) are matched against
# a joined lookahead head of the declaration (up to 8 lines).

_Z_STR = re.compile(r'"(?:[^"\\]|\\.)*"')
_Z_CHAR = re.compile(r"'(?:[^'\\]|\\.)*'")
_Z_FN = re.compile(
    r'^\s*(?:pub\s+)?(?:export\s+)?(?:extern\s+(?:"[^"]*"\s+)?)?(?:inline\s+|noinline\s+)?'
    r"fn\s+([A-Za-z_]\w*)\s*\("
)
_Z_TYPE = re.compile(
    r"^\s*(?:pub\s+)?const\s+([A-Za-z_]\w*)(?::[^=]+)?\s*=\s*"
    r"(?:packed\s+|extern\s+)?(?:struct|enum(?:\s*\([^)]*\))?|union(?:\s*\([^)]*\))?|opaque)\s*\{"
)
_Z_IMPORT = re.compile(
    r'^\s*(?:pub\s+)?const\s+([A-Za-z_]\w*)\s*=\s*@import\s*\(\s*"([^"]+)"'
)
_Z_CONST = re.compile(r"^\s*(?:pub\s+)?const\s+([A-Za-z_]\w*)")
_Z_VAR = re.compile(r"^\s*(?:pub\s+)?var\s+([A-Za-z_]\w*)")
_Z_TEST = re.compile(r'^\s*test\s+(?:"([^"]*)"|([A-Za-z_]\w*))?\s*\{')
_Z_CALL = re.compile(r"(?<![\w@.])([A-Za-z_]\w*)\s*\(")
_Z_METHOD = re.compile(r"\.([A-Za-z_]\w*)\s*\(")
_Z_KEYWORDS = frozenset(
    "if while for switch return break continue defer errdefer catch orelse try "
    "and or fn struct enum union opaque unreachable test comptime inline "
    "suspend resume await async asm align callconv linksection".split()
)


def _zig_structural(line: str) -> str:
    """Line with string/char literals and comments removed — safe for brace
    counting and call scanning."""
    if line.lstrip().startswith("\\\\"):  # multiline string literal line
        return ""
    line = _Z_STR.sub('""', line)
    line = _Z_CHAR.sub("''", line)
    i = line.find("//")
    return line[:i] if i >= 0 else line


def _parse_zig(rel_path: str, source: str) -> tuple[list, list]:
    """One Zig file → (units, syntactic edges), same tuple shapes as
    ``_parse_python``."""
    units, edges = [], []
    lines = source.splitlines()
    if not lines:
        return [(rel_path, "document", os.path.basename(rel_path), "", 1, 1,
                 source, None)], []
    sl = [_zig_structural(ln) for ln in lines]
    n = len(lines)
    depth_before = []
    d = 0
    for s in sl:
        depth_before.append(d)
        d += s.count("{") - s.count("}")

    def depth_after(i: int) -> int:
        return depth_before[i] + sl[i].count("{") - sl[i].count("}")

    def block_end(i: int) -> int:
        """Last line of the decl starting at line i: the line where depth
        returns to the decl's depth after a block opened, or the ';' line
        for blockless decls."""
        opened = False
        for j in range(i, n):
            opened = opened or "{" in sl[j]
            if opened and depth_after(j) <= depth_before[i]:
                return j
            if not opened and ";" in sl[j]:
                return j
        return n - 1

    def head(i: int, raw: bool = False) -> str:
        """Joined declaration head: lines i.. until one contains '{' or ';'
        (bounded at 8) — lets the single-line decl regexes see multiline
        continuations like ``pub const Foo =\\n    struct {``. ``raw``
        keeps string literals (the @import target)."""
        src_lines = lines if raw else sl
        parts = []
        for j in range(i, min(i + 8, n)):
            parts.append(src_lines[j].strip())
            if "{" in sl[j] or ";" in sl[j]:
                break
        return " ".join(parts)

    # pass 1: containers, functions, tests (their extents gate pass 2)
    containers: list[tuple[str, int, int]] = []  # (name, start, end)
    fn_extents: list[tuple[int, int, str]] = []  # (start, end, qual)
    test_extents: list[tuple[int, int]] = []

    def enclosing_container(i: int) -> str:
        best = ""
        for name, a, b in containers:
            if a < i <= b:
                best = name  # innermost wins (containers listed outer-first)
        return best

    for i in range(n):
        m = _Z_TYPE.match(sl[i]) or (
            _Z_CONST.match(sl[i]) and _Z_TYPE.match(head(i))
        )
        if m:
            containers.append((m.group(1), i, block_end(i)))

    for i in range(n):
        m = _Z_FN.match(sl[i])
        if m:
            name = m.group(1)
            end = block_end(i)
            container = enclosing_container(i)
            qual = f"{container}.{name}" if container else name
            fn_extents.append((i, end, qual))
            content = "\n".join(lines[i : end + 1])
            units.append((rel_path, "function", qual, container, i + 1, end + 1,
                          content, None))
            if container:
                edges.append((rel_path, qual, container, "method_of"))
            # calls inside the body (skip the decl line's own `fn name(`)
            for j in range(i, end + 1):
                body = sl[j]
                for mm in _Z_METHOD.finditer(body):
                    tgt = mm.group(1)
                    if tgt not in _Z_KEYWORDS:
                        edges.append((rel_path, qual, tgt, "calls_method"))
                for mm in _Z_CALL.finditer(body):
                    tgt = mm.group(1)
                    before = body[: mm.start()]
                    if re.search(r"\bfn\s*$", before):
                        continue  # the decl itself (this or a nested fn)
                    if tgt not in _Z_KEYWORDS and tgt != name:
                        edges.append((rel_path, qual, tgt, "calls"))
            continue
        # raw line: the quoted test name would be blanked by the structural pass
        m = _Z_TEST.match(lines[i]) if _Z_TEST.match(sl[i]) else None
        if m:
            tname = m.group(1) or m.group(2) or f"test_L{i + 1}"
            end = block_end(i)
            test_extents.append((i, end))
            safe = re.sub(r"\W+", "_", tname).strip("_") or f"test_L{i + 1}"
            units.append((rel_path, "test", safe, "", i + 1, end + 1,
                          "\n".join(lines[i : end + 1]), None))

    def enclosing_fn(i: int) -> str:
        """Qual of the innermost function whose body contains line i
        ('' when at file/container scope)."""
        best, best_start = "", -1
        for a, b, q in fn_extents:
            if a < i <= b and a > best_start:
                best, best_start = q, a
        return best

    def inside_test(i: int) -> bool:
        return any(a <= i <= b for a, b in test_extents)

    # pass 2: imports, types, AND const/var at ANY scope — the reference's
    # AST walk emits every var decl regardless of scope (golden cases
    # "parse nested function", "parse local const struct declaration";
    # process_var_decl zig_parser.zig:497-498). Test bodies are the one
    # exception: walk_children has no .test_decl arm, so nothing inside a
    # test produces units.
    for i in range(n):
        if inside_test(i):
            continue
        # raw line here: the structural pass blanks string literals, which
        # would erase the @import("...") target
        m = _Z_IMPORT.match(lines[i]) or (
            _Z_CONST.match(sl[i]) and _Z_IMPORT.match(head(i, raw=True))
        )
        if m:
            alias, target = m.group(1), m.group(2)
            end = block_end(i)
            container = enclosing_container(i)
            qual = f"{container}.{alias}" if container else alias
            units.append((rel_path, "import", qual, container, i + 1, end + 1,
                          "\n".join(lines[i : end + 1]), None))
            bare_target = os.path.basename(target)
            bare_target = bare_target[:-4] if bare_target.endswith(".zig") else bare_target
            edges.append((rel_path, qual, bare_target, "imports"))
            continue
        m = _Z_TYPE.match(sl[i]) or (
            _Z_CONST.match(sl[i]) and _Z_TYPE.match(head(i))
        )
        if m:
            name = m.group(1)
            end = block_end(i)
            container = enclosing_container(i)
            qual = f"{container}.{name}" if container and container != name else name
            units.append((rel_path, "type", qual, container, i + 1, end + 1,
                          "\n".join(lines[i : end + 1]), None))
            continue
        for rx, ut in ((_Z_CONST, "const"), (_Z_VAR, "var")):
            m = rx.match(sl[i])
            if m:
                name = m.group(1)
                end = block_end(i)
                fn_qual = enclosing_fn(i)
                container = enclosing_container(i)
                # fn-locals carry the fn qual (store ids are per-file-name
                # unique); the parent field still names the inner scope
                if fn_qual:
                    qual = f"{fn_qual}.{name}"
                    parent = fn_qual
                else:
                    qual = f"{container}.{name}" if container else name
                    parent = container
                units.append((rel_path, ut, qual, parent, i + 1, end + 1,
                              "\n".join(lines[i : end + 1]), None))
                break

    if not units:
        units.append((rel_path, "document", os.path.basename(rel_path), "", 1,
                      max(1, len(lines)), source, None))
    return units, edges


def _parse_source(rel_path: str, source: str) -> tuple[list, list]:
    """Extension-dispatched parser tier (S8): Python ast, Zig heuristic."""
    if rel_path.endswith(DEFAULT_EXTENSIONS):
        return _parse_python(rel_path, source)
    if rel_path.endswith(ZIG_EXTENSIONS):
        return _parse_zig(rel_path, source)
    return [(rel_path, "document", os.path.basename(rel_path), "", 1,
             max(1, source.count("\n") + 1), source, None)], []


def parse_files(
    spark: SparkSession,
    files: list[tuple[str, str]] | DataFrame,
    max_file_size: int = MAX_FILE_SIZE,
) -> tuple[DataFrame, DataFrame]:
    """Distributed parse: (units_df, raw_edges_df). Each partition parses its
    file subset inside one Python worker (Arrow-batched). ``files`` is a
    driver-side (abs_path, rel_path) list for directory ingest, or a
    DataFrame[abs_path, file_path] manifest for monorepo-scale ingest where
    the listing itself is a table.

    The size cap is enforced HERE, not only in list_files: the manifest path
    has no listing step, and resolve_and_build's 1M sequence stride relies
    on every file being <= MAX_FILE_SIZE (a multi-MiB file could exceed 1M
    units and collide sequence ranges). Oversize files become a single
    parse_error marker block."""

    if isinstance(files, DataFrame):
        paths_df = files.select("abs_path", "file_path")
    else:
        n_part = max(1, min(len(files), 32))
        paths_df = spark.createDataFrame(
            files, "abs_path string, file_path string"
        ).repartition(n_part)

    def _read_capped(ap: str) -> tuple[str | None, str | None]:
        """(source, error) — error set for unreadable or oversize files."""
        try:
            if os.path.getsize(ap) > max_file_size:
                return None, f"file exceeds max_file_size ({max_file_size})"
            with open(ap, encoding="utf-8", errors="replace") as f:
                return f.read(), None
        except OSError as exc:
            return None, f"read error: {exc}"

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ap, rp in zip(pdf["abs_path"], pdf["file_path"]):
                src, err = _read_capped(ap)
                if err is not None:
                    rows.append((rp, "document", os.path.basename(rp), "", 1, 1,
                                 "", err))
                    continue
                units, _ = _parse_source(rp, src)
                rows.extend(units)
            yield pd.DataFrame(rows, columns=[f.name for f in _UNIT_SCHEMA.fields])

    def edge_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ap, rp in zip(pdf["abs_path"], pdf["file_path"]):
                if not rp.endswith(CODE_EXTENSIONS):
                    continue
                src, err = _read_capped(ap)
                if err is not None:
                    continue
                _, edges = _parse_source(rp, src)
                rows.extend(edges)
            yield pd.DataFrame(rows, columns=[f.name for f in _EDGE_SCHEMA.fields])

    units = paths_df.mapInPandas(parse_batch, _UNIT_SCHEMA)
    raw_edges = paths_df.mapInPandas(edge_batch, _EDGE_SCHEMA)
    return units, raw_edges


def file_hashes(
    spark: SparkSession, files: list[tuple[str, str]] | DataFrame
) -> DataFrame:
    """(file_path, content_hash) — md5 of raw bytes, computed on executors
    (the change-detection pass of incremental sync; reading beats parsing by
    an order of magnitude, and unchanged files are never parsed)."""
    import hashlib

    if isinstance(files, DataFrame):
        paths_df = files.select("abs_path", "file_path")
    else:
        n_part = max(1, min(len(files), 32)) if files else 1
        paths_df = spark.createDataFrame(
            files, "abs_path string, file_path string"
        ).repartition(n_part)

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ap, rp in zip(pdf["abs_path"], pdf["file_path"]):
                try:
                    with open(ap, "rb") as f:
                        rows.append((rp, hashlib.md5(f.read()).hexdigest()))
                except OSError:
                    rows.append((rp, None))
            yield pd.DataFrame(rows, columns=["file_path", "content_hash"])

    return paths_df.mapInPandas(
        hash_batch, "file_path string, content_hash string"
    )


def resolve_and_build(
    units: DataFrame,
    raw_edges: DataFrame,
    codebase: str,
    sequence_base: int = 0,
    file_index: DataFrame | None = None,
    extra_symbols: DataFrame | None = None,
    known_ids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Semantic resolution + ContextBlock/GraphEdge materialization.

    Resolution (S9 semantics): an edge's raw target name resolves to
    (1) a unit in the same file whose bare name matches, else
    (2) the unique unit with that bare name anywhere in the codebase.
    Unresolved edges are dropped (the reference drops edges whose endpoints
    don't exist, ``src/storage/engine.zig:1207-1217``).

    Incremental re-ingest (a subset of the codebase's files): pass
    ``extra_symbols`` — DataFrame[file_path, bare, unit_id] for the
    *unchanged* files (derivable from the store's visible blocks) so
    cross-file targets resolve codebase-wide, and ``known_ids`` — visible
    block ids — so edges into unchanged files survive the endpoint check.

    Edges carry provenance (codebase, src_file, ingest_seq=sequence_base):
    the storage layer's epoch rule uses it to shadow a re-ingested file's
    older edges (BlockStore.visible_edges).

    Sequence assignment: base + file_idx*1_000_000 + row_number within the
    file. The per-file window keeps sequence generation fully parallel (a
    single global row_number would funnel every row through one partition);
    MVCC only needs sequences to be unique within a batch and monotone
    *across* batches, which ``sequence_base`` provides. The stride cannot
    collide: a MAX_FILE_SIZE (1 MiB) file yields < 1M units (every unit
    spans at least one source line).
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
    seq = F.lit(sequence_base) + F.col("file_idx") * 1_000_000 + in_file
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
    if extra_symbols is not None:
        syms = syms.unionByName(
            extra_symbols.select("file_path", "bare", "unit_id")
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
        F.lit(codebase).alias("codebase"),
        F.col("file_path").alias("src_file"),
        F.lit(sequence_base).cast("bigint").alias("ingest_seq"),
    ).where(F.col("src") != F.col("dst"))

    # endpoints must exist (put_edge contract); incremental re-ingest also
    # admits endpoints already visible in the store
    ids = blocks.select("id")
    if known_ids is not None:
        ids = ids.unionByName(known_ids.select(F.col(known_ids.columns[0]).alias("id")))
    edges = (
        edges.join(ids, edges.src == ids.id, "left_semi")
        .join(ids, edges.dst == ids.id, "left_semi")
    )
    return blocks, edges


def ingest_manifest(
    spark: SparkSession, manifest: DataFrame, codebase: str,
    sequence_base: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Monorepo-scale ingest: the file listing is a DataFrame[abs_path,
    file_path] (e.g. a build-system manifest table), never a driver list.
    The per-file index for sequence assignment is a row_number over the
    one-row-per-file manifest ordered by path — a narrow single pass over
    file COUNT (not unit count), the only global ordering the pipeline
    needs; parsing and resolution stay fully distributed."""
    from pyspark.sql.window import Window

    file_index = manifest.select("file_path").distinct().select(
        "file_path",
        (F.row_number().over(Window.orderBy("file_path")) - 1)
        .cast("bigint")
        .alias("file_idx"),
    )
    units, raw_edges = parse_files(spark, manifest)
    return resolve_and_build(units, raw_edges, codebase, sequence_base, file_index)


def ingest_directory(
    spark: SparkSession, root: str, codebase: str, sequence_base: int = 0,
    config: IngestConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """S7 end-to-end: discover (git-aware, glob-configurable) → parse →
    resolve → (blocks, edges)."""
    files = list_files(root, config=config)
    units, raw_edges = parse_files(spark, files)
    file_index = spark.createDataFrame(
        [(i, rel) for i, (_, rel) in enumerate(files)], "file_idx long, file_path string"
    )
    return resolve_and_build(units, raw_edges, codebase, sequence_base, file_index)

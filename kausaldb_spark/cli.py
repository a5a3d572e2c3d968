"""CLI — the reference's command surface (``src/cli/parser.zig:38-156``):
``link / unlink / find / show / trace / search / filter / status / compact``.

The reference splits client/daemon over a binary TCP protocol because its
core is single-threaded; a Spark engine *is* the daemon, so the CLI is a thin
argparse layer over ``KausalEngine`` (the client/daemon split maps to Spark
Connect if remoting is needed).

Output formats (S11/S12): ``text`` table, ``json`` lines, and ``llm`` — the
reference's LLM context format (``src/query/operations.zig:156-174``):
    --- BEGIN CONTEXT BLOCK ---
    id: ...
    source: ...
    <content>
    --- END CONTEXT BLOCK ---
Response caps mirror protocol limits: ≤1000 blocks per response
(``src/cli/protocol.zig:27-32``).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame

MAX_RESPONSE_BLOCKS = 1000    # src/cli/protocol.zig:27-32
MAX_RESPONSE_EDGES = 10_000   # src/cli/protocol.zig:27-32 (ShowResponse)


def format_llm(rows) -> str:
    """S11: stream blocks as LLM context sections."""
    out = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        out.append("--- BEGIN CONTEXT BLOCK ---")
        out.append(f"id: {d.get('id', '')}")
        out.append(f"unit: {d.get('unit_id', '')} [{d.get('unit_type', '')}]")
        out.append(f"source: {d.get('source_uri', d.get('file_path', ''))}")
        if "content" in d:
            out.append(d["content"] or "")
        out.append("--- END CONTEXT BLOCK ---")
    return "\n".join(out)


def emit(df: DataFrame, fmt: str, file=None, cap: int = MAX_RESPONSE_BLOCKS) -> int:
    """Render ≤cap rows. The cap is the CALLER's choice — each command knows
    whether it emits blocks (≤1000) or edges (≤10000); inferring it from
    column shape mis-capped any src/dst-shaped non-edge frame."""
    file = file or sys.stdout
    rows = df.limit(cap).collect()
    if fmt == "json":
        for r in rows:
            print(json.dumps(r.asDict(), default=str), file=file)
    elif fmt == "llm":
        print(format_llm(rows), file=file)
    else:
        cols = df.columns
        print("\t".join(cols), file=file)
        for r in rows:
            print("\t".join(str(r[c]) for c in cols), file=file)
    return len(rows)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kausal", description="kausaldb_spark CLI")
    p.add_argument("--store", required=True, help="block store directory")
    p.add_argument("--format", choices=["text", "json", "llm"], default="text")
    sub = p.add_subparsers(dest="command", required=True)

    link = sub.add_parser("link", help="ingest a source tree")
    link.add_argument("--path", required=True)
    link.add_argument("--name", required=True)

    # sync = incremental re-ingest: hash-diff against the stored file state,
    # re-parse only changed files, tombstone removed ones
    sync = sub.add_parser("sync", help="incrementally re-sync a linked source tree")
    sync.add_argument("--path", help="defaults to the linked path from the registry")
    sync.add_argument("--name", required=True)

    unlink = sub.add_parser("unlink", help="tombstone a codebase")
    unlink.add_argument("--name", required=True)

    find = sub.add_parser("find", help="find by type+name")
    find.add_argument("--workspace", required=True)
    find.add_argument("--type", dest="unit_type", default="function")
    find.add_argument("--name", required=True)

    show = sub.add_parser("show", help="relations of a target")
    show.add_argument("--workspace", required=True)
    show.add_argument(
        "--relation", choices=["callers", "callees", "references"], required=True
    )
    show.add_argument("--target", required=True)
    show.add_argument("--depth", type=int, default=1)

    trace = sub.add_parser("trace", help="paths between two units")
    trace.add_argument("--workspace", required=True)
    trace.add_argument("--from", dest="from_name", required=True)
    trace.add_argument("--to", dest="to_name", required=True)
    trace.add_argument("--depth", type=int, default=10)

    search = sub.add_parser("search", help="keyword search")
    search.add_argument("--query", required=True)
    search.add_argument("--threshold", type=float, default=0.7)
    search.add_argument(
        "--ranked", action="store_true",
        help="multi-term ranked retrieval (query split on whitespace; "
        "ordered by distinct terms matched, then total term frequency)",
    )
    search.add_argument("--limit", type=int, default=20)

    flt_p = sub.add_parser("filter", help="boolean-filtered scan")
    flt_p.add_argument(
        "--where",
        action="append",
        required=True,
        metavar="TARGET:OP:VALUE",
        help="condition, e.g. content:contains:foo or sequence:gt:42 or "
        "metadata.unit_type:eq:function (repeat for AND)",
    )
    flt_p.add_argument("--offset", type=int, default=0)
    flt_p.add_argument("--limit", type=int, default=100)

    sub.add_parser("ping", help="engine liveness check")
    sub.add_parser("status", help="store + query statistics")
    sub.add_parser("list", help="linked codebases (name, path, counts)")
    sub.add_parser("compact", help="rewrite store to visible snapshot")

    cur = sub.add_parser(
        "curate", help="run the corpus curation pipeline to training shards"
    )
    cur.add_argument("--in", dest="in_path", required=True,
                     help="corpus path (parquet/jsonl/csv/text dir)")
    cur.add_argument("--out", dest="out_path", required=True,
                     help="output directory for the sharded corpus")
    cur.add_argument("--format", dest="corpus_format", default=None,
                     help="corpus format override (default: infer from suffix)")
    cur.add_argument("--shards", type=int, default=16)
    cur.add_argument("--seed", type=int, default=7)
    cur.add_argument("--budget-tokens", type=int, default=None)
    cur.add_argument(
        "--target", action="append", default=[],
        metavar="SOURCE=FRACTION",
        help="mixture target, repeatable (requires --budget-tokens)",
    )

    vs = sub.add_parser(
        "verify-shards", help="re-hash a sharded training corpus against its manifest"
    )
    vs.add_argument("--path", required=True, help="sharded corpus directory")
    vs.add_argument("--id-col", default="doc_id")

    srv = sub.add_parser(
        "serve", help="run the resident TCP daemon (client/daemon split)"
    )
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=7654)
    srv.add_argument(
        "--token",
        default=None,
        help="shared secret; REQUIRED for a non-loopback --host (the daemon "
        "executes destructive argv)",
    )
    return p


def parse_condition(spec: str):
    """TARGET:OP:VALUE → filtering.Expr leaf. metadata fields spell the
    target as metadata.<field>."""
    from kausaldb_spark.operators import filtering as flt

    parts = spec.split(":", 2)
    if len(parts) != 3:
        raise SystemExit(f"bad --where {spec!r}: expected TARGET:OP:VALUE")
    target, op, value = parts
    if target.startswith("metadata."):
        return flt.Expr.cond(flt.TARGET_METADATA, op, value, target.split(".", 1)[1])
    return flt.Expr.cond(target, op, value)


def main(argv: list[str] | None = None, spark=None, engine=None, file=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    file = file or sys.stdout
    if "--remote" in argv:
        # client mode: forward the command to a running daemon (which owns
        # the store and the warm SparkSession) and relay its response
        i = argv.index("--remote")
        if i + 1 >= len(argv):
            print("--remote requires HOST:PORT (e.g. --remote 127.0.0.1:7654)",
                  file=file)
            return 2
        hostport = argv[i + 1]
        fwd = argv[:i] + argv[i + 2:]
        token = None
        if "--token" in fwd:  # client-side secret, not a forwarded arg
            j = fwd.index("--token")
            if j + 1 >= len(fwd):
                print("--token requires a value", file=file)
                return 2
            token = fwd[j + 1]
            fwd = fwd[:j] + fwd[j + 2:]
        # the daemon injects its own --store: scrub both spellings
        while "--store" in fwd:
            j = fwd.index("--store")
            fwd = fwd[:j] + fwd[j + 2:]
        fwd = [a for a in fwd if not a.startswith("--store=")]
        host, _, port = hostport.rpartition(":")
        if not port.isdigit():
            print(f"bad --remote {hostport!r}: expected HOST:PORT with a "
                  "numeric port", file=file)
            return 2
        from kausaldb_spark.server import KausalClient

        with KausalClient(host or "127.0.0.1", int(port), token=token) as client:
            resp = client.request(fwd)
        print(resp.get("output") or resp.get("error", ""), end="", file=file)
        return int(resp.get("exit", 1))

    args = build_parser().parse_args(argv)
    if engine is None:
        from kausaldb_spark.engine import KausalEngine
        from kausaldb_spark.session import get_spark

        spark = spark or get_spark("kausal-cli")
        engine = KausalEngine(spark, args.store)

    if args.command == "link":
        info = engine.link_codebase(args.path, args.name)
        print(json.dumps({"linked": args.name, **info}), file=file)
        return 0
    if args.command == "sync":
        info = engine.sync_codebase(args.name, root=args.path)
        print(json.dumps({"synced": args.name, **info}), file=file)
        return 0
    if args.command == "unlink":
        n = engine.unlink_codebase(args.name)
        print(json.dumps({"unlinked": args.name, "blocks_tombstoned": n}), file=file)
        return 0
    if args.command == "find":
        df = engine.find_by_name(args.workspace, args.unit_type, args.name)
        return 0 if emit(df, args.format, file) else 1
    if args.command == "show":
        fn = {
            "callers": engine.find_callers,
            "callees": engine.find_callees,
            "references": engine.find_references,
        }[args.relation]
        df = fn(args.workspace, args.target, args.depth)
        return 0 if emit(df, args.format, file) >= 0 else 1
    if args.command == "trace":
        df = engine.trace_paths(args.workspace, args.from_name, args.to_name, args.depth)
        emit(df, args.format, file)
        return 0
    if args.command == "search":
        if args.ranked:
            df = engine.ranked_search(args.query.split(), k=args.limit)
        else:
            df = engine.keyword_search(args.query, args.threshold)
        emit(df, args.format, file)
        return 0
    if args.command == "filter":
        from kausaldb_spark.operators import filtering as flt

        conds = [parse_condition(w) for w in args.where]
        expr = conds[0] if len(conds) == 1 else flt.Expr.and_(*conds)
        df = engine.filtered(expr, offset=args.offset, max_results=args.limit)
        emit(df, args.format, file)
        return 0
    if args.command == "ping":
        engine.spark.range(1).count()
        print(json.dumps({"pong": True}), file=file)
        return 0
    if args.command == "status":
        print(json.dumps(engine.status(), default=str), file=file)
        return 0
    if args.command == "list":
        for cb in engine.list_codebases():
            print(json.dumps(cb, default=str), file=file)
        return 0
    if args.command == "compact":
        engine.store.compact()
        print(json.dumps({"compacted": True}), file=file)
        return 0
    if args.command == "curate":
        from kausaldb_spark.functions.curation import curate_and_write

        targets = None
        if args.target:
            targets = {}
            for spec in args.target:
                if "=" not in spec:
                    print(json.dumps({"error": f"bad --target {spec!r}; "
                                      "expected SOURCE=FRACTION"}), file=file)
                    return 2
                name, frac = spec.split("=", 1)
                try:
                    targets[name] = float(frac)
                except ValueError:
                    print(json.dumps({"error": f"bad fraction in --target "
                                      f"{spec!r}"}), file=file)
                    return 2
            if args.budget_tokens is None:
                print(json.dumps({"error": "--target requires "
                                  "--budget-tokens"}), file=file)
                return 2
        manifest = curate_and_write(
            engine.spark, args.in_path, args.out_path,
            targets=targets, budget_tokens=args.budget_tokens,
            n_shards=args.shards, seed=args.seed, fmt=args.corpus_format,
        )
        print(json.dumps(manifest, default=str), file=file)
        return 0
    if args.command == "verify-shards":
        from kausaldb_spark.sinks import verify_shards

        try:
            verify_shards(engine.spark, args.path, id_col=args.id_col)
        except (ValueError, FileNotFoundError) as exc:
            print(json.dumps({"verified": False, "error": str(exc)}), file=file)
            return 1
        print(json.dumps({"verified": True, "path": args.path}), file=file)
        return 0
    if args.command == "serve":
        from kausaldb_spark.server import KausalServer

        with KausalServer(engine, args.store, args.host, args.port,
                          token=args.token) as srv:
            h, p = srv.server_address[:2]
            print(json.dumps({"serving": True, "host": h, "port": p}), file=file)
            srv.serve_forever()
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())

"""TCP daemon + client — the reference's client/daemon process boundary.

The reference runs a long-lived single-threaded server over a framed binary
protocol (``src/cli/protocol.zig:21-131``, ``src/server/network_server.zig``)
because cold process start would dwarf every query; the same holds here — a
SparkSession costs ~15 s to start, so the daemon owns ONE warm session +
``KausalEngine`` (hot JVM, persisted caches, result cache) and every client
command reuses it.

Protocol (documented divergence: NDJSON framing instead of the reference's
length-prefixed binary — same request/response semantics, same response
caps):

    request : {"argv": ["find", "--workspace", "w", "--name", "x"]}\\n
    response: {"ok": true, "exit": 0, "output": "..."}\\n

``argv`` is exactly the CLI surface minus ``--store`` (the daemon injects its
own); one request per line, one response per line, connection may pump many
requests. Commands execute under a single lock — single-writer semantics,
like the reference's event loop. ``{"argv": ["shutdown"]}`` stops the daemon
(reference: ``kausal server stop``).

For full remote-DataFrame semantics the production mapping remains Spark
Connect (SURVEY.md §4); this daemon covers the reference's actual UX — a
resident engine answering CLI commands.
"""

from __future__ import annotations

import io
import json
import socket
import socketserver
import threading

from kausaldb_spark import cli


def _is_loopback(host: str) -> bool:
    """True iff ``host`` names a loopback interface (127/8, ::1, localhost).
    Resolution failures count as non-loopback — fail closed."""
    import ipaddress

    if host in ("localhost", ""):
        return True
    try:
        return ipaddress.ip_address(host).is_loopback
    except ValueError:
        try:
            infos = socket.getaddrinfo(host, None)
        except OSError:
            return False
        return bool(infos) and all(
            ipaddress.ip_address(i[4][0]).is_loopback for i in infos
        )


#: subcommands a client may NOT forward: ``serve`` would run serve_forever
#: inside the handler while holding cmd_lock (wedging the daemon), and the
#: daemon lifecycle verbs are handled by the protocol itself.
_FORBIDDEN_FORWARDED = {"serve", "shutdown"}


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection, many requests
        srv = self.server
        while True:
            line = self.rfile.readline()
            if not line:
                return
            try:
                req = json.loads(line)
                if not isinstance(req, dict):
                    raise ValueError("request must be a JSON object")
                argv = req["argv"]
                if not isinstance(argv, list) or not all(isinstance(a, str) for a in argv):
                    raise ValueError("argv must be a list of strings")
            except (ValueError, KeyError, TypeError) as exc:
                self._send({"ok": False, "exit": 2, "error": f"bad request: {exc}"})
                continue
            if srv.token is not None and req.get("token") != srv.token:
                self._send({"ok": False, "exit": 3, "error": "auth required: bad or missing token"})
                continue
            if argv and argv != ["shutdown"] and argv[0] in _FORBIDDEN_FORWARDED:
                self._send({"ok": False, "exit": 2,
                            "error": f"subcommand {argv[0]!r} cannot be forwarded to a daemon"})
                continue
            if argv == ["shutdown"]:
                self._send({"ok": True, "exit": 0, "output": ""})
                threading.Thread(target=srv.shutdown, daemon=True).start()
                return
            out = io.StringIO()
            try:
                with srv.cmd_lock:  # single-writer, like the reference
                    code = cli.main(
                        ["--store", srv.store_path, *argv],
                        engine=srv.engine,
                        file=out,
                    )
                self._send({"ok": code == 0, "exit": code, "output": out.getvalue()})
            except SystemExit as exc:  # argparse rejection
                self._send({"ok": False, "exit": int(exc.code or 2),
                            "error": f"bad argv: {argv}"})
            except Exception as exc:  # noqa: BLE001 — daemon must not die
                self._send({"ok": False, "exit": 1,
                            "error": f"{type(exc).__name__}: {exc}"})

    def _send(self, obj: dict) -> None:
        self.wfile.write((json.dumps(obj, default=str) + "\n").encode())
        self.wfile.flush()


class KausalServer(socketserver.ThreadingTCPServer):
    """Resident engine behind a TCP socket. ``port=0`` picks an ephemeral
    port (read it from ``server_address`` after construction)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, engine, store_path: str, host: str = "127.0.0.1", port: int = 0,
                 token: str | None = None):
        # The daemon executes arbitrary CLI argv, including destructive
        # delete/unlink/compact and link of any local path — so a
        # non-loopback bind without a shared secret is refused outright
        # (r6, per ADVICE). Loopback needs no token: same-host callers
        # already have the store on disk.
        if not _is_loopback(host) and not token:
            raise ValueError(
                f"refusing to bind {host!r} without a token: the daemon "
                "executes unauthenticated argv (delete/unlink/link of local "
                "paths); pass token=... (clients send {'token': ...}) or "
                "bind loopback"
            )
        self.engine = engine
        self.store_path = store_path
        self.token = token
        self.cmd_lock = threading.Lock()
        super().__init__((host, port), _Handler)

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


class KausalClient:
    """Line-oriented client: ``request([...argv...]) -> response dict``."""

    def __init__(self, host: str, port: int, timeout: float = 300.0,
                 token: str | None = None):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")
        self._token = token

    def request(self, argv: list[str]) -> dict:
        req: dict = {"argv": argv}
        if self._token is not None:
            req["token"] = self._token
        self._sock.sendall((json.dumps(req) + "\n").encode())
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("daemon closed the connection")
        return json.loads(line)

    def close(self) -> None:
        self._rfile.close()
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def serve(store_path: str, host: str = "127.0.0.1", port: int = 7654,
          spark=None, token: str | None = None) -> None:
    """``kausal serve`` entrypoint: build the engine once, serve until
    ``shutdown``."""
    from kausaldb_spark.engine import KausalEngine
    from kausaldb_spark.session import get_spark

    spark = spark or get_spark("kausal-daemon")
    engine = KausalEngine(spark, store_path)
    with KausalServer(engine, store_path, host, port, token=token) as srv:
        h, p = srv.server_address[:2]
        print(json.dumps({"serving": True, "host": h, "port": p}), flush=True)
        srv.serve_forever()

"""Client/daemon process boundary (reference: src/cli/protocol.zig:21-131,
src/server/network_server.zig): a resident engine behind a TCP socket
answering the full CLI surface, plus the --remote client path."""

import io
import json
import textwrap

import pytest

from kausaldb_spark.cli import main as cli_main
from kausaldb_spark.engine import KausalEngine
from kausaldb_spark.server import KausalClient, KausalServer


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("srvproj")
    (root / "lib.py").write_text(textwrap.dedent('''
        def helper_function(x):
            return x + 1

        def main():
            return helper_function(41)
    '''))
    store = str(tmp_path_factory.mktemp("srvstore"))
    eng = KausalEngine(spark, store)
    eng.link_codebase(str(root), "proj")
    srv = KausalServer(eng, store, port=0)  # ephemeral port
    srv.serve_background()
    host, port = srv.server_address[:2]
    yield host, port
    srv.shutdown()
    srv.server_close()


def test_daemon_answers_cli_surface(served):
    host, port = served
    with KausalClient(host, port) as c:
        pong = c.request(["ping"])
        assert pong["ok"] and json.loads(pong["output"])["pong"] is True

        # many requests on ONE connection — the resident-session point
        found = c.request(
            ["--format", "json", "find", "--workspace", "proj",
             "--type", "function", "--name", "helper_function"]
        )
        assert found["ok"], found
        row = json.loads(found["output"].splitlines()[0])
        assert row["unit_id"] == "lib.py:helper_function"

        callers = c.request(
            ["--format", "json", "show", "--workspace", "proj",
             "--relation", "callers", "--target", "helper_function"]
        )
        assert callers["ok"]
        assert any(
            json.loads(ln).get("unit_id") == "lib.py:main"
            for ln in callers["output"].splitlines()
        )

        status = c.request(["status"])
        assert status["ok"] and "blocks_visible" in status["output"]


def test_daemon_survives_bad_requests(served):
    host, port = served
    with KausalClient(host, port) as c:
        bad = c.request(["no-such-command"])
        assert not bad["ok"] and bad["exit"] != 0
        # engine still alive on the same connection
        assert c.request(["ping"])["ok"]


def test_remote_client_flag(served):
    host, port = served
    buf = io.StringIO()
    rc = cli_main(
        ["--store", "ignored", "--remote", f"{host}:{port}", "--format", "json",
         "find", "--workspace", "proj", "--type", "function", "--name", "main"],
        file=buf,
    )
    assert rc == 0
    assert json.loads(buf.getvalue().splitlines()[0])["unit_id"] == "lib.py:main"


def test_shutdown_command(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("shutstore"))
    eng = KausalEngine(spark, store)
    srv = KausalServer(eng, store, port=0)
    t = srv.serve_background()
    host, port = srv.server_address[:2]
    with KausalClient(host, port) as c:
        assert c.request(["shutdown"])["ok"]
    t.join(timeout=30)
    assert not t.is_alive()
    srv.server_close()


def test_daemon_rejects_non_object_json_and_stays_alive(served):
    """r6 ADVICE: a valid-JSON non-object request ([1], "x") must produce a
    bad-request response, not a TypeError that kills the handler thread."""
    import socket as _socket

    host, port = served
    s = _socket.create_connection((host, port), timeout=30)
    rf = s.makefile("rb")
    for payload in (b'[1]\n', b'"x"\n', b'{"argv": "ping"}\n', b'{"no_argv": 1}\n'):
        s.sendall(payload)
        resp = json.loads(rf.readline())
        assert resp["ok"] is False and resp["exit"] == 2, resp
    # same connection still serves good requests
    s.sendall(json.dumps({"argv": ["ping"]}).encode() + b"\n")
    assert json.loads(rf.readline())["ok"] is True
    rf.close(); s.close()


def test_daemon_rejects_forwarded_serve(served):
    """Forwarding {"argv": ["serve", ...]} would run serve_forever under
    cmd_lock and wedge the daemon — must be rejected up front."""
    host, port = served
    with KausalClient(host, port) as c:
        resp = c.request(["serve", "--host", "0.0.0.0"])
        assert resp["ok"] is False and "cannot be forwarded" in resp["error"]
        assert c.request(["ping"])["ok"]


def test_non_loopback_bind_requires_token(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("authstore"))
    eng = KausalEngine(spark, store)
    with pytest.raises(ValueError, match="refusing to bind"):
        KausalServer(eng, store, host="0.0.0.0", port=0)
    # loopback spellings are fine without a token
    srv = KausalServer(eng, store, host="localhost", port=0)
    srv.server_close()


def test_token_auth_enforced(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("tokstore"))
    eng = KausalEngine(spark, store)
    srv = KausalServer(eng, store, port=0, token="s3cret")
    srv.serve_background()
    host, port = srv.server_address[:2]
    try:
        with KausalClient(host, port) as c:  # no token
            resp = c.request(["ping"])
            assert resp["ok"] is False and resp["exit"] == 3
        with KausalClient(host, port, token="wrong") as c:
            assert c.request(["ping"])["exit"] == 3
        with KausalClient(host, port, token="s3cret") as c:
            assert c.request(["ping"])["ok"] is True
    finally:
        srv.shutdown()
        srv.server_close()


def test_remote_flag_validation_and_store_scrub(served):
    host, port = served
    # missing value
    buf = io.StringIO()
    assert cli_main(["ping", "--remote"], file=buf) == 2
    assert "HOST:PORT" in buf.getvalue()
    # non-numeric port
    buf = io.StringIO()
    assert cli_main(["ping", "--remote", "localhost:abc"], file=buf) == 2
    assert "numeric port" in buf.getvalue()
    # --store=PATH equals-form scrubbed before forwarding (daemon injects
    # its own store; an unscrubbed --store= would be rejected by argparse)
    buf = io.StringIO()
    rc = cli_main([f"--store=/nonexistent", "--remote", f"{host}:{port}", "ping"],
                  file=buf)
    assert rc == 0 and json.loads(buf.getvalue())["pong"] is True

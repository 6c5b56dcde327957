"""The `pqs`-analog client CLI (pqstream_spark/client.py): dial,
subscribe, print one JSON per line — reference cmd/pqs/main.go:28-88.
The client is pure stdlib (no Spark), so it runs in-thread against a
WireServer and as a real subprocess against the daemon."""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import threading
import time

import pytest

from pqstream_spark.client import build_parser, main
from pqstream_spark.streaming.source import stream_changelog
from pqstream_spark.streaming.subscribe import Dispatcher
from pqstream_spark.streaming.wire_http import WireServer

from .test_wire_http import _drop_events

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parser_flag_surface():
    args = build_parser().parse_args(
        ["--connect", "127.0.0.1:7000", "--tables", "notes|users",
         "--policy", "drop-oldest", "--buffer", "8"]
    )
    assert args.connect == "127.0.0.1:7000"
    assert args.tables == "notes|users"
    assert args.policy == "drop-oldest" and args.buffer == 8


def test_client_bad_address_is_an_error(capsys):
    assert main(["--connect", "nonsense"]) == 1
    assert "HOST:PORT" in capsys.readouterr().err


@pytest.fixture()
def wire(spark, tmp_path):
    src = str(tmp_path / "cli_src")
    os.makedirs(src)
    disp = Dispatcher(stream_changelog(spark, src))
    srv = WireServer(disp, port=0)
    srv.start_background()
    q = disp.start()
    try:
        yield src, srv
    finally:
        srv.stop()
        disp.stop()
        if q.isActive:
            q.stop()


def test_client_streams_filtered_events(spark, tmp_path, wire):
    src, srv = wire
    host, port = srv.server_address[:2]
    buf = io.StringIO()
    rc: dict = {}

    def run():
        rc["rc"] = main(
            ["--connect", f"{host}:{port}", "--tables", "notes",
             "--max-events", "5"],
            out=buf,
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(1.0)  # subscription lands before events flow
    _drop_events(spark, tmp_path, src)
    t.join(timeout=120)
    assert not t.is_alive() and rc["rc"] == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 5
    for l in lines:
        assert json.loads(l)["table"] == "notes"


def test_client_bad_regexp_fails_before_streaming(wire, capsys):
    _, srv = wire
    host, port = srv.server_address[:2]
    # Listen parity (server.go:305-307): invalid pattern is an error at
    # subscribe time, not a hung stream
    assert main(["--connect", f"{host}:{port}", "--tables", "(["]) == 1
    assert "400" in capsys.readouterr().err


def test_client_subprocess_against_daemon(spark, tmp_path):
    """Full binary-to-binary flow: `python -m pqstream_spark
    --listen-http` daemon + `python -m pqstream_spark.client`
    subprocess — the pqsd ↔ pqs pairing."""
    import pqstream_spark.__main__ as cli

    src = str(tmp_path / "dsrc")
    out_dir = str(tmp_path / "dout")
    os.makedirs(src)
    os.makedirs(out_dir)
    args = cli.build_parser().parse_args(
        ["--connect", src, "--out", out_dir, "--listen-http", "0"]
    )
    stop = threading.Event()
    t = threading.Thread(target=cli._run_changelog_dir, args=(args, stop))
    t.start()
    try:
        deadline = time.time() + 60
        while cli._ACTIVE_WIRE is None and time.time() < deadline:
            time.sleep(0.2)
        assert cli._ACTIVE_WIRE is not None, "wire server never started"
        host, port = cli._ACTIVE_WIRE.server_address[:2]
        proc = subprocess.Popen(
            [sys.executable, "-m", "pqstream_spark.client",
             "--connect", f"{host}:{port}", "--tables", "users",
             "--max-events", "3"],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        time.sleep(1.0)
        _drop_events(spark, tmp_path, src, name="dcli")
        stdout, stderr = proc.communicate(timeout=120)
        assert proc.returncode == 0, stderr.decode()
        lines = [l for l in stdout.decode().splitlines() if l.strip()]
        assert len(lines) == 3
        assert all(json.loads(l)["table"] == "users" for l in lines)
    finally:
        stop.set()
        t.join(timeout=120)
        assert not t.is_alive()

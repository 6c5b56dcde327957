"""End-to-end wire test for the HTTP Listen surface: a real
StreamingQuery feeds the Dispatcher, a WireServer serves
/listen?tables=REGEXP, and a plain http.client consumer receives
byte-parity NDJSON events in seq order. This is the closest this
container can get to the reference's pqs client flow
(clients/python/example.py) without grpcio."""

from __future__ import annotations

import http.client
import json
import os
import shutil
import threading
import time

import pytest

from pqstream_spark.streaming.source import stream_changelog
from pqstream_spark.streaming.subscribe import Dispatcher
from pqstream_spark.streaming.wire_http import WireServer


@pytest.fixture()
def wire(spark, tmp_path):
    src = str(tmp_path / "wire_src")
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


def _drop_events(spark, tmp_path, src, n=60, name="b1", sf="sf0.001"):
    ev = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
    stage = str(tmp_path / ("wire_stage_" + name))
    ev.orderBy("event_id").limit(n).coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(stage, part), os.path.join(src, name + ".parquet"))


def _read_lines(url_host, url_port, path, n, timeout=90):
    conn = http.client.HTTPConnection(url_host, url_port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    lines = []
    if resp.status == 200:
        while len(lines) < n:
            line = resp.fp.readline()
            if not line:
                break
            lines.append(line.decode().strip())
    conn.close()
    return resp.status, resp.getheader("Content-Type"), lines


def test_listen_streams_filtered_events_in_order(spark, tmp_path, wire):
    src, srv = wire
    host, port = srv.server_address[:2]
    got: dict = {}

    def client():
        got["result"] = _read_lines(host, port, "/listen?tables=notes", 1)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    time.sleep(1.0)  # let the subscription land before events flow
    _drop_events(spark, tmp_path, src)
    t.join(timeout=120)
    assert not t.is_alive(), "client never completed"
    status, ctype, lines = got["result"]
    assert status == 200 and ctype == "application/x-ndjson"
    assert lines, "no events received"
    ev = json.loads(lines[0])
    assert ev["table"] == "notes"
    assert set(ev) <= {"schema", "table", "op", "id", "payload", "changes"}


def test_listen_rejects_bad_regexp_before_streaming(wire):
    _, srv = wire
    host, port = srv.server_address[:2]
    status, _, _ = _read_lines(host, port, "/listen?tables=%28unclosed", 1, timeout=10)
    assert status == 400


def test_listen_unknown_path_404(wire):
    _, srv = wire
    host, port = srv.server_address[:2]
    status, _, _ = _read_lines(host, port, "/nope", 1, timeout=10)
    assert status == 404


def test_disconnect_unsubscribes(spark, tmp_path, wire):
    src, srv = wire
    host, port = srv.server_address[:2]
    got: dict = {}

    def client():
        got["result"] = _read_lines(host, port, "/listen?tables=.*", 3)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    time.sleep(1.0)
    _drop_events(spark, tmp_path, src, name="b1")
    t.join(timeout=120)
    assert not t.is_alive()
    assert len(got["result"][2]) == 3
    # client closed after 3 lines; the next batch's failed write must
    # remove the subscriber from the dispatcher
    _drop_events(spark, tmp_path, src, name="b2")
    deadline = time.time() + 60
    while srv.dispatcher.subscribers() and time.time() < deadline:
        time.sleep(0.5)
    assert srv.dispatcher.subscribers() == []


def test_stalled_client_does_not_block_fast_client(spark, tmp_path, wire):
    """Beating server.go:291's head-of-line TODO on the wire: a client
    that never reads its socket (tiny SO_RCVBUF, no recv) subscribed
    with policy=disconnect-slow must neither delay nor starve a
    concurrent default client, which receives the ENTIRE event batch;
    the stalled subscription is removed on overflow. Under the
    reference's inline semantics this test hangs: the loop blocks on
    the stalled socket once the kernel buffers fill."""
    import socket

    src, srv = wire
    host, port = srv.server_address[:2]

    # stalled client: tiny receive window negotiated at connect, then
    # never reads — the server-side writes block once buffers fill
    slow = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    slow.connect((host, port))
    slow.sendall(
        b"GET /listen?tables=.*&policy=disconnect-slow&buffer=4 HTTP/1.1\r\n"
        b"Host: wire\r\n\r\n"
    )
    time.sleep(0.5)  # let the subscription land

    got: dict = {}

    def client():
        got["result"] = _read_lines(host, port, "/listen?tables=.*", 10000)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    time.sleep(1.0)
    # sf0.01: 10000 events => 10000 changelog lines, ~1.5 MB — far
    # beyond the stalled socket's receive+send buffers
    _drop_events(spark, tmp_path, src, n=10000, name="hol", sf="sf0.01")
    t.join(timeout=240)
    try:
        assert not t.is_alive(), "fast client never completed (loop blocked?)"
        status, _, lines = got["result"]
        assert status == 200 and len(lines) == 10000
        # the overflowing subscriber was disconnected during the batch
        deadline = time.time() + 30
        while time.time() < deadline and len(srv.dispatcher.subscribers()) > 1:
            time.sleep(0.25)
        assert len(srv.dispatcher.subscribers()) <= 1
    finally:
        slow.close()


def test_concurrent_clients_isolated_filters(spark, tmp_path, wire):
    """Two simultaneous wire clients with different regexps receive
    disjoint, correctly-filtered streams from ONE event loop — the
    fan-out isolation the reference guarantees per subscription
    (server.go:284-302)."""
    src, srv = wire
    host, port = srv.server_address[:2]
    got: dict = {}

    def client(key, pattern, n):
        got[key] = _read_lines(host, port, f"/listen?tables={pattern}", n)

    t1 = threading.Thread(target=client, args=("notes", "notes", 2), daemon=True)
    t2 = threading.Thread(target=client, args=("users", "users", 2), daemon=True)
    t1.start()
    t2.start()
    time.sleep(1.0)
    _drop_events(spark, tmp_path, src, n=120, name="c1")
    t1.join(timeout=120)
    t2.join(timeout=120)
    assert not t1.is_alive() and not t2.is_alive()
    for key in ("notes", "users"):
        status, _, lines = got[key]
        assert status == 200 and len(lines) == 2
        assert all(json.loads(l)["table"] == key for l in lines)


def test_health_and_stats_endpoints(spark, tmp_path, wire):
    """/health and /stats expose the Dispatcher's observability
    snapshot — the engine's answer to the reference's gops/pprof debug
    agents (cmd/pqs/main.go:41-46, pqsd -debugaddr)."""
    src, srv = wire
    host, port = srv.server_address[:2]

    def get_json(path):
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", path)
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        return resp.status, body

    status, health = get_json("/health")
    assert status == 200 and health["status"] == "ok"
    assert health["subscribers"] == 0

    got: dict = {}
    t = threading.Thread(
        target=lambda: got.update(
            r=_read_lines(host, port, "/listen?tables=users&policy=block", 3)
        ),
        daemon=True,
    )
    t.start()
    time.sleep(1.0)
    _drop_events(spark, tmp_path, src, name="stats1")
    t.join(timeout=120)
    assert not t.is_alive() and got["r"][0] == 200

    _, stats = get_json("/stats")
    assert stats["active"] is True
    assert stats["dispatched"] >= 60  # the dropped file's events
    # the listen subscriber has disconnected by now (max lines read),
    # so per-subscriber entries may be empty — but totals persist
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    conn.close()

"""Consumer resume on the HTTP Listen wire: /listen?from_seq=N replays
retained history, then splices into the live feed exactly-once.

This is capability the reference cannot express — NOTIFY delivers only
to connected listeners (server.go:98-109), so a reconnecting pqs
client has lost every event in between. Here the retained changelog
IS the history, and a subscriber names its resume point."""

from __future__ import annotations

import http.client
import json
import os
import shutil
import threading
import time

import pytest

from pqstream_spark.streaming.source import batch_changelog, stream_changelog
from pqstream_spark.streaming.subscribe import Dispatcher
from pqstream_spark.streaming.wire_http import WireServer


@pytest.fixture()
def wire(spark, tmp_path):
    src = str(tmp_path / "replay_src")
    os.makedirs(src)
    disp = Dispatcher(stream_changelog(spark, src))

    def history(from_seq: int):
        from pyspark.sql import functions as F

        df = batch_changelog(spark, src)
        it = df.filter(F.col("seq") >= from_seq).orderBy("seq").toLocalIterator()
        return (r.asDict() for r in it)

    srv = WireServer(disp, port=0, history=history)
    srv.start_background()
    q = disp.start()
    try:
        yield src, srv, disp
    finally:
        srv.stop()
        disp.stop()
        if q.isActive:
            q.stop()


def _drop_events(spark, tmp_path, src, name, lo, n):
    """Copy events with event_id in [lo, lo+n) into the changelog dir."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stage = str(tmp_path / ("replay_stage_" + name))
    (ev.filter(f"event_id >= {lo} AND event_id < {lo + n}")
       .coalesce(1).write.mode("overwrite").parquet(stage))
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(stage, part), os.path.join(src, name + ".parquet"))


def _read_lines(host, port, path, n, timeout=120):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    lines = []
    if resp.status == 200:
        while len(lines) < n:
            line = resp.fp.readline()
            if not line:
                break
            lines.append(json.loads(line))
    conn.close()
    return resp.status, lines


def test_replay_then_live_exactly_once(spark, tmp_path, wire):
    """Events written BEFORE the client connects are replayed from
    retained history; events written after arrive live; the union is
    every seq exactly once, in ascending order."""
    src, srv, disp = wire
    host, port = srv.server_address[:2]

    _drop_events(spark, tmp_path, src, "b1", lo=0, n=40)
    # let the dispatcher consume b1 with zero subscribers: those rows
    # are GONE from the live feed — only history can serve them
    disp._query.processAllAvailable()

    got: dict = {}

    def client():
        got["r"] = _read_lines(host, port, "/listen?tables=.*&from_seq=0&with_seq=1", 80)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    time.sleep(2.0)  # replay finishes; subscription is live
    _drop_events(spark, tmp_path, src, "b2", lo=500, n=40)
    t.join(timeout=120)
    assert not t.is_alive(), "client never completed"
    status, rows = got["r"]
    assert status == 200
    seqs = [r["seq"] for r in rows]
    assert len(seqs) == 80
    assert len(set(seqs)) == 80, "duplicate seq across the replay/live splice"
    assert seqs == sorted(seqs), "seq order broken across the splice"
    assert set(seqs[:40]) == set(range(0, 40)), "replayed b1 incomplete"
    assert all(s >= 500 for s in seqs[40:]), "live b2 leaked pre-replay rows"


def test_from_seq_prunes_history(spark, tmp_path, wire):
    src, srv, disp = wire
    _drop_events(spark, tmp_path, src, "b1", lo=0, n=40)
    disp._query.processAllAvailable()
    host, port = srv.server_address[:2]
    status, rows = _read_lines(
        host, port, "/listen?tables=.*&from_seq=25&with_seq=1", 15, timeout=60
    )
    assert status == 200
    assert [r["seq"] for r in rows] == list(range(25, 40))


def test_from_seq_without_history_is_an_error(spark, tmp_path):
    src = str(tmp_path / "nohist_src")
    os.makedirs(src)
    disp = Dispatcher(stream_changelog(spark, src))
    srv = WireServer(disp, port=0)  # no history backend
    srv.start_background()
    try:
        host, port = srv.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/listen?tables=.*&from_seq=0&with_seq=1")
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        srv.stop()
        disp.stop()


def test_stats_exposes_replay_progress(spark, tmp_path, wire):
    """While a resumed connection is open, /stats carries its replay
    progress (from_seq, replayed count, live flag); the entry is
    removed when the connection closes."""
    src, srv, disp = wire
    _drop_events(spark, tmp_path, src, "b1", lo=0, n=40)
    disp._query.processAllAvailable()
    host, port = srv.server_address[:2]

    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/listen?tables=.*&from_seq=0&with_seq=1")
    resp = conn.getresponse()
    assert resp.status == 200
    for _ in range(40):  # drain the replay so info is fully populated
        assert resp.fp.readline()

    sconn = http.client.HTTPConnection(host, port, timeout=30)
    sconn.request("GET", "/stats")
    stats = json.loads(sconn.getresponse().read())
    sconn.close()
    assert "replays" in stats and len(stats["replays"]) == 1
    (info,) = stats["replays"].values()
    assert info["from_seq"] == 0
    assert info["replayed"] == 40
    assert info["live"] is True

    # resp.close() matters: HTTPConnection.close() alone leaves the fd
    # open through the response's makefile reference, so no FIN reaches
    # the server and idle-disconnect detection has nothing to see
    resp.close()
    conn.close()
    deadline = time.time() + 20
    while time.time() < deadline:
        sconn = http.client.HTTPConnection(host, port, timeout=30)
        sconn.request("GET", "/stats")
        stats = json.loads(sconn.getresponse().read())
        sconn.close()
        if "replays" not in stats:
            break
        time.sleep(0.3)
    assert "replays" not in stats, "replay entry must vanish on close"

"""STOMP 1.2 wire tests: the stdlib-socket client against an
in-process broker stub that enforces the spec's framing (CONNECT →
CONNECTED, SEND with content-length, DISCONNECT → RECEIPT). The stub
validates byte-level protocol shape, so the client is checked as an
interoperable STOMP producer — not just against itself. The
StompForwarder integration then runs the pqsamq topology end to end:
a micro-batch of events → seq-ordered SEND frames on a real TCP
socket (contrib/cmd/pqsamq/main.go:68-87 parity)."""

from __future__ import annotations

import json
import socket
import threading

import pytest

from pqstream_spark.streaming.stomp_wire import (
    StompClient,
    encode_frame,
    escape_header,
    read_frame,
    unescape_header,
)


class BrokerStub:
    """Accepts one producer connection; records SEND frames."""

    def __init__(self):
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.frames: list[tuple[str, dict, bytes]] = []
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.srv.accept()
        f = conn.makefile("rb")
        cmd, headers, _ = read_frame(f)
        assert cmd == "CONNECT" and headers["accept-version"] == "1.2"
        conn.sendall(
            encode_frame("CONNECTED", {"version": "1.2", "session": "s1"})
        )
        while True:
            try:
                cmd, headers, body = read_frame(f)
            except (ConnectionError, OSError):
                break
            if cmd == "DISCONNECT":
                conn.sendall(
                    encode_frame("RECEIPT", {"receipt-id": headers["receipt"]})
                )
                break
            self.frames.append((cmd, headers, body))
        conn.close()
        self.srv.close()


def test_header_escaping_roundtrip():
    for raw in ["plain", "colon:colon", "nl\nnl", "back\\slash", "cr\rcr", "a:\\\n"]:
        assert unescape_header(escape_header(raw)) == raw


def test_client_send_disconnect_against_stub():
    broker = BrokerStub()
    c = StompClient("127.0.0.1", broker.port)
    assert c.session == "s1"
    c.send("/queue/pqstream", '{"op":"INSERT"}', content_type="application/json")
    c.send("/queue/pqstream", b"\x00binary\x00body")  # content-length framing
    c.disconnect()
    broker.thread.join(timeout=10)
    assert len(broker.frames) == 2
    cmd, headers, body = broker.frames[0]
    assert cmd == "SEND"
    assert headers["destination"] == "/queue/pqstream"
    assert headers["content-type"] == "application/json"
    assert int(headers["content-length"]) == len(body)
    assert json.loads(body) == {"op": "INSERT"}
    assert broker.frames[1][2] == b"\x00binary\x00body"


def test_forwarder_sends_batch_in_seq_order(spark):
    """pqsamq topology: handled events → STOMP SENDs, seq-ordered."""
    from pqstream_spark.sources.changelog import build_changelog
    from pqstream_spark.streaming.sinks import StompForwarder

    broker = BrokerStub()
    client = StompClient("127.0.0.1", broker.port)
    fwd = StompForwarder("/queue/pqstream", client=client)
    batch = build_changelog(spark, "/root/testdata/sf0.001").limit(25)
    fwd.foreach_batch()(batch, epoch_id=0)
    client.disconnect()
    broker.thread.join(timeout=10)
    assert len(broker.frames) == 25
    events = [json.loads(b) for _, _, b in broker.frames]
    assert all({"schema", "table", "op"} <= set(e) for e in events)


def test_connect_refused_surfaces():
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def refuse():
        conn, _ = srv.accept()
        f = conn.makefile("rb")
        read_frame(f)
        conn.sendall(encode_frame("ERROR", {"message": "no"}))
        conn.close()
        srv.close()

    threading.Thread(target=refuse, daemon=True).start()
    with pytest.raises(ConnectionError, match="broker refused"):
        StompClient("127.0.0.1", port)


def test_frame_roundtrip_property():
    """Any header value and binary body survives encode → read_frame."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        dest=st.text(min_size=1, max_size=40),
        ctype=st.text(min_size=1, max_size=20),
        body=st.binary(max_size=200),
    )
    def roundtrip(dest, ctype, body):
        frame = encode_frame(
            "SEND",
            {
                "destination": dest,
                "content-type": ctype,
                "content-length": str(len(body)),
            },
            body,
        )
        cmd, headers, got = read_frame(io.BufferedReader(io.BytesIO(frame)))
        assert cmd == "SEND"
        assert headers["destination"] == dest
        assert headers["content-type"] == ctype
        assert got == body

    roundtrip()

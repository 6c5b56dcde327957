"""Live wire surface for F3: the reference's `Listen(regexp) → stream
of events` contract (/root/reference/pqstream.proto:6-15,
server.go:284-315) served over HTTP NDJSON line-streaming.

grpcio is absent from this environment (tests/test_transport_probe.py
documents it), so the wire FRAMING is HTTP instead of gRPC — but
everything the framing carries is the real thing: the Dispatcher's
single-event-loop fan-out, per-client table-regexp filtering validated
at subscribe time (server.go:305-307 returns an error before streaming
starts), byte-parity event rendering (event_to_json_line — the pqs CLI
jsonpb layout), global seq order, and disconnect-driven unsubscribe
(a failed write returns False to the dispatcher, which removes the
subscriber — subscription.fn parity, server.go:30-33). When grpcio
appears, `Listen` becomes a thin gRPC method over the same Dispatcher
and renderer; nothing below the framing changes.

Backpressure semantics DEFAULT to the reference's: the event loop
writes to each client inline, so a slow client delays the batch for
everyone (the unbuffered channel at server.go:291). Bounded
micro-batches (maxFilesPerTrigger / OutboxPoller.max_rows) cap how
much a stall can hold in flight. Unlike the reference, a client may
opt OUT of head-of-line blocking per connection —
`/listen?tables=...&policy=drop-oldest|disconnect-slow|block&buffer=N`
moves its delivery onto a bounded per-subscriber queue + worker thread
(Dispatcher buffer policies), so one stalled socket no longer delays
any other subscriber's delivery: the fix the reference's own TODO
(server.go:291, "will likely buffer after benchmarking") never
shipped. Teardown order: dispatcher.stop() before WireServer.stop()
(the order __main__ uses) — the reverse closes handler wfiles while a
batch may be mid-write, which the callback tolerates (ValueError →
unsubscribe) but delivers less.
"""

from __future__ import annotations

import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..operators.filters import compile_or_raise
from .sinks import event_to_json_line
from .subscribe import BUFFER_POLICIES, Dispatcher


class _ListenHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "pqstream-spark-wire/1"

    def log_message(self, fmt, *args):  # quiet: tests assert on stdout
        pass

    def _send_json(self, obj) -> None:
        import json

        body = json.dumps(obj, separators=(",", ":")).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib naming)
        parsed = urlparse(self.path)
        server: WireServer = self.server  # type: ignore[assignment]
        if parsed.path == "/health":
            # liveness: is the fan-out query running? (the engine's
            # answer to the reference's -debugaddr agents)
            st = server.dispatcher.stats()
            self._send_json(
                {"status": "ok" if st["active"] else "inactive",
                 "subscribers": len(st["subscribers"])}
            )
            return
        if parsed.path == "/stats":
            self._send_json(server.dispatcher.stats())
            return
        if parsed.path != "/listen":
            self.send_error(
                404,
                "unknown path (use /listen?tables=REGEXP, /stats, /health)",
            )
            return
        qs = parse_qs(parsed.query)
        regexp = qs.get("tables", [".*"])[0]
        try:
            compile_or_raise(regexp)
        except Exception as ex:
            # invalid pattern is an error BEFORE any streaming starts —
            # Listen parity (server.go:305-307)
            self.send_error(400, f"bad tables regexp: {ex}")
            return
        policy = qs.get("policy", [None])[0]
        if policy is not None and policy not in BUFFER_POLICIES:
            self.send_error(
                400, f"bad policy {policy!r} (use one of {BUFFER_POLICIES})"
            )
            return
        try:
            capacity = int(qs.get("buffer", ["64"])[0])
        except ValueError:
            self.send_error(400, "bad buffer size (integer required)")
            return

        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.send_header("Cache-Control", "no-store")
        self.send_header("Connection", "close")
        self.end_headers()

        done = threading.Event()
        name = f"http-{uuid.uuid4().hex[:8]}"

        def cb(row: dict) -> bool:
            try:
                self.wfile.write((event_to_json_line(row) + "\n").encode())
                self.wfile.flush()
                return True
            except (OSError, ValueError):
                # OSError: client went away. ValueError: wfile was closed
                # on OUR side (WireServer.stop() while the dispatcher is
                # mid-batch) — either way unsubscribe via False instead of
                # letting the exception kill the shared foreachBatch query
                # for every other client.
                done.set()
                return False

        server.dispatcher.subscribe(name, regexp, cb, policy=policy, capacity=capacity)
        try:
            # the dispatcher's event loop writes from its own thread;
            # this handler thread just holds the connection open until
            # the client disconnects (detected on write) or the server
            # shuts down
            while not done.is_set() and not server.closing.is_set():
                if not server.dispatcher.is_active(name):
                    break  # removed (cb False or disconnect-slow): close
                done.wait(0.2)
        finally:
            server.dispatcher.unsubscribe(name)


class WireServer(ThreadingHTTPServer):
    """`Listen` over HTTP NDJSON, bridging a Dispatcher.

    Usage:
        d = Dispatcher(events)
        srv = WireServer(d, port=0)   # port 0 = ephemeral
        srv.start_background()
        d.start()
        ... clients GET /listen?tables=users|notes ...
        srv.stop()
    """

    daemon_threads = True

    def __init__(self, dispatcher: Dispatcher, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _ListenHandler)
        self.dispatcher = dispatcher
        self.closing = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self.server_address[:2]
        return f"http://{host}:{port}"

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.closing.set()
        self.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.server_close()

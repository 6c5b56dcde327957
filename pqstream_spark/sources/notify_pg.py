"""Live NOTIFY transport: the reference's ACTUAL wire — PL/pgSQL
trigger → `pg_notify('pqstream_notify', envelope)` → LISTEN — running
against a real PostgreSQL server (SURVEY.md §2 S1/S5 true parity).

The outbox backend (`sources/outbox_pg.py`) is this engine's UPGRADED
capture path (durable seqs, replay, at-least-once). This module is the
faithful re-creation of what the reference actually does
(`server.go:98-109`: `pq.Listener` on the notify channel, envelope
per event, nothing durable):

- **Delivery is at-most-once by design.** NOTIFY is fire-and-forget;
  events fired while no listener is connected are lost, and there is
  no cursor to resume from — exactly the reference's semantics (its
  proto has no seq field, which is why its clients cannot resume).
  The divergence from the outbox backend is the POINT: both transports
  run live, and the tests pin which guarantees each one makes.
- **Transport is a long-lived `psql` subprocess** (no psycopg2 in this
  environment): one session issues `LISTEN <channel>`, then a pump
  thread periodically executes a no-op `SELECT` — psql reports every
  pending notification after each command completes — and a reader
  thread parses the `Asynchronous notification ... with payload "…"`
  lines into envelope strings. `stdbuf -oL` defeats libc block
  buffering on the pipe.
- **Envelope → RawEvent**: `parse_notify_envelope` decodes the
  reference envelope `{schema, table, op, id, payload, previous}`
  (queries.go:26-32); `batch_df` mints session-local synthetic seqs
  (monotonic within the listener, NOT durable — there is nothing
  durable to anchor them to) so the downstream pipeline
  (`handle_events`: parse → redact → merge-patch → fan-out) runs
  unchanged on either transport.

Trigger side: `outbox_pg.NOTIFY_TRIGGER_FUNCTION_SQL` (the engine's
rendering of queries.go:10-53, byte-parity pinned in
tests/test_degrade_pg.py) — install with
`outbox_pg.install_notify_trigger_sql(table)`.
"""

from __future__ import annotations

import json
import queue
import re
import shutil
import subprocess
import threading
import time
from datetime import datetime, timezone

from .outbox_local import OUTBOX_BATCH_SCHEMA
from .outbox_pg import NOTIFY_CHANNEL, _NOTIFY_RE  # shared line parser


def parse_notify_envelope(payload_text: str) -> dict | None:
    """One NOTIFY payload (the reference envelope JSON) → a dict with
    the outbox batch column names. Returns None for unparseable
    payloads (the reference logs and drops those too). Degraded
    envelopes (8 KB tiers) simply lack payload/previous keys — they
    parse to NULL columns, and P3 fallback can re-enrich."""
    try:
        env = json.loads(payload_text)
    except (json.JSONDecodeError, ValueError):
        return None
    if not isinstance(env, dict) or "op" not in env:
        return None

    def _json_or_none(key: str) -> str | None:
        v = env.get(key)
        if v is None:
            return None
        return json.dumps(v, separators=(",", ":"))

    return {
        "schema_name": env.get("schema"),
        "table_name": env.get("table"),
        "op": env.get("op"),
        "id": env.get("id"),
        "payload_json": _json_or_none("payload"),
        "previous_json": _json_or_none("previous"),
    }


class NotifyListener:
    """LISTEN on a channel through one long-lived psql session.

    start() → notifications accumulate in an internal queue;
    poll(max_events, timeout) drains them; batch_df(spark) renders a
    drain as the shared outbox-batch frame. close() ends the session
    (anything fired after that is lost — at-most-once, the contract
    under test)."""

    def __init__(self, conninfo: str, channel: str = NOTIFY_CHANNEL,
                 pump_interval: float = 0.15) -> None:
        self.conninfo = conninfo
        self.channel = channel
        self.pump_interval = pump_interval
        self._q: queue.Queue[str] = queue.Queue()
        self._proc: subprocess.Popen | None = None
        self._stop = threading.Event()
        self._ready = threading.Event()
        self._threads: list[threading.Thread] = []
        self._seq = 0  # session-local synthetic seq (NOT durable)
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", channel):
            raise ValueError(f"bad channel name: {channel!r}")

    _READY = "__pqstream_listener_ready__"

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "NotifyListener":
        """Blocks until the session's LISTEN is live server-side:
        after LISTEN, the session notifies ITSELF with a sentinel and
        start() waits for it to come back through the reader — without
        this handshake, writes issued immediately after start() (from
        other connections) can beat the LISTEN registration and be
        silently lost even while a listener 'exists'."""
        cmd = ["psql", self.conninfo, "-X", "-q", "-A", "-t"]
        if shutil.which("stdbuf"):
            cmd = ["stdbuf", "-oL", "-eL"] + cmd
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, cwd="/tmp",
        )
        assert self._proc.stdin is not None
        self._proc.stdin.write(
            f"LISTEN {self.channel};\n"
            f"SELECT pg_notify('{self.channel}', '{self._READY}');\n"
        )
        self._proc.stdin.flush()

        t_read = threading.Thread(target=self._reader, daemon=True)
        t_pump = threading.Thread(target=self._pump, daemon=True)
        t_read.start()
        t_pump.start()
        self._threads = [t_read, t_pump]
        # the READY sentinel is consumed by the READER thread (not
        # re-enqueued here): pulling-and-re-queueing racing events in
        # start() would put them BEHIND later arrivals and invert the
        # synthetic seq order FIFO guarantees downstream
        if not self._ready.wait(timeout=15):
            self.close()  # no leaked psql session / pump thread
            raise RuntimeError(
                f"NotifyListener: LISTEN on {self.channel!r} did not "
                "acknowledge within 15 s"
            )
        return self

    def _reader(self) -> None:
        assert self._proc and self._proc.stdout
        for line in self._proc.stdout:
            m = _NOTIFY_RE.search(line)
            if m and m.group("chan") == self.channel:
                payload = m.group("payload")
                # swallow only the handshake's own sentinel (first
                # occurrence, pre-ready); a user payload that happens
                # to equal it later still flows through
                if not self._ready.is_set() and payload == self._READY:
                    self._ready.set()
                else:
                    self._q.put(payload)
            if self._stop.is_set():
                break

    def _pump(self) -> None:
        # psql surfaces pending notifications after each command
        # completes; an idle session would sit on them indefinitely
        while not self._stop.is_set():
            try:
                assert self._proc and self._proc.stdin
                self._proc.stdin.write("SELECT 1;\n")
                self._proc.stdin.flush()
            except (BrokenPipeError, ValueError, AssertionError):
                return
            time.sleep(self.pump_interval)

    def close(self) -> None:
        self._stop.set()
        if self._proc is not None:
            try:
                if self._proc.stdin:
                    self._proc.stdin.close()
            except BrokenPipeError:
                pass
            self._proc.terminate()
            try:
                self._proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self._proc.kill()
                self._proc.wait(timeout=10)
            self._proc = None

    def __enter__(self) -> "NotifyListener":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()

    # -- consumption ------------------------------------------------------
    def poll(self, max_events: int = 10_000, timeout: float = 2.0) -> list[str]:
        """Drain up to max_events raw payloads, waiting up to `timeout`
        for the FIRST one (subsequent ones are taken without waiting —
        micro-batch shape, bounded by construction)."""
        out: list[str] = []
        deadline = time.time() + timeout
        while len(out) < max_events:
            remaining = deadline - time.time()
            try:
                if not out and remaining > 0:
                    out.append(self._q.get(timeout=remaining))
                else:
                    out.append(self._q.get_nowait())
            except queue.Empty:
                break
        return out

    def batch_df(self, spark, payloads: list[str]):
        """Payload texts → the shared outbox-batch frame. Synthetic
        seqs are minted per listener session (monotonic, NOT durable —
        NOTIFY has no cursor; this is the documented at-most-once
        divergence from the outbox backend, whose seqs are bigserial
        commit order)."""
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = []
        for p in payloads:
            env = parse_notify_envelope(p)
            if env is None:
                continue
            self._seq += 1
            rows.append((
                self._seq, now, env["schema_name"], env["table_name"],
                env["op"], env["id"], env["payload_json"],
                env["previous_json"],
            ))
        return spark.createDataFrame(rows, OUTBOX_BATCH_SCHEMA)

"""`python -m pqstream_spark.client` — the subscriber CLI, parity with
the reference's `pqs` binary (/root/reference/cmd/pqs/main.go:28-88):
dial the daemon, subscribe with a table regexp, print one JSON per
line until interrupted.

    -connect → --connect HOST:PORT of a daemon started with
                         --listen-http (default 127.0.0.1:7000, the
                         reference's default ":7000")
    -tables  → --tables  regexp of tables to match (default ".*")
    (new)      --policy / --buffer  opt out of head-of-line blocking:
                         ask the server to decouple this subscriber
                         behind a bounded queue (block | drop-oldest |
                         disconnect-slow) — the knob the reference's
                         server.go:291 TODO never shipped
    (new)      --from-seq N  replay retained history with seq >= N
                         before going live (consumer resume; NOTIFY
                         loses everything while disconnected)

The wire is HTTP NDJSON (streaming/wire_http.py) because grpcio is
absent from this environment (tests/test_transport_probe.py); each
line is already rendered jsonpb-parity server-side, so this client is
pure stdlib — no Spark, no dependencies — exactly as thin as pqs
itself (Recv → Marshal → println, main.go:69-87).

Exit codes: 0 on interrupt/server shutdown (the reference treats
context-done as a clean exit), 1 on dial/subscribe errors (bad
address, bad regexp — Listen fails before any event streams,
server.go:305-307 parity).
"""

from __future__ import annotations

import argparse
import http.client
import sys
import urllib.parse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pqstream_spark.client",
        description="subscribe to a pqstream-spark daemon and print "
        "change events one JSON per line",
    )
    p.add_argument(
        "--connect", default="127.0.0.1:7000",
        help="daemon address HOST:PORT (daemon side: --listen-http PORT)",
    )
    p.add_argument("--tables", default=".*", help="table name regexp")
    p.add_argument(
        "--policy", default=None,
        choices=("block", "drop-oldest", "disconnect-slow"),
        help="per-subscriber buffering policy (default: inline delivery, "
        "reference semantics)",
    )
    p.add_argument(
        "--buffer", type=int, default=64,
        help="bounded queue capacity when --policy is set",
    )
    p.add_argument(
        "--max-events", type=int, default=None,
        help="exit 0 after N events (testing/scripting; the reference "
        "client streams forever)",
    )
    p.add_argument(
        "--from-seq", type=int, default=None,
        help="resume from retained history: replay events with "
        "seq >= N before going live (Kafka-style consumer resume; "
        "the reference's NOTIFY design loses everything while "
        "disconnected)",
    )
    p.add_argument(
        "--with-seq", action="store_true",
        help="prepend the outbox seq to each line (so the next "
        "--from-seq is knowable; off = reference byte-parity)",
    )
    return p


def main(argv: list[str] | None = None, out=None) -> int:
    args = build_parser().parse_args(argv)
    out = out if out is not None else sys.stdout
    host, _, port_s = args.connect.rpartition(":")
    if not host or not port_s.isdigit():
        print(f"--connect: expected HOST:PORT, got {args.connect!r}",
              file=sys.stderr)
        return 1
    path = f"/listen?tables={urllib.parse.quote(args.tables)}"
    if args.policy:
        path += f"&policy={args.policy}&buffer={args.buffer}"
    if args.from_seq is not None:
        path += f"&from_seq={args.from_seq}"
    if args.with_seq:
        path += "&with_seq=1"

    conn = http.client.HTTPConnection(host.strip("[]"), int(port_s))
    try:
        conn.request("GET", path)
        resp = conn.getresponse()
    except OSError as ex:
        print(f"dial {args.connect}: {ex}", file=sys.stderr)
        return 1
    if resp.status != 200:
        # subscribe-time failure (bad regexp/policy): the server
        # rejects BEFORE streaming starts — surface its message
        print(f"listen: {resp.status} {resp.reason}: "
              f"{resp.read().decode(errors='replace').strip()}",
              file=sys.stderr)
        conn.close()
        return 1
    n = 0
    try:
        while True:
            line = resp.fp.readline()
            if not line:
                return 0  # server shut down: clean exit
            out.write(line.decode())
            out.flush()
            n += 1
            if args.max_events is not None and n >= args.max_events:
                return 0
    except KeyboardInterrupt:
        return 0
    finally:
        conn.close()


if __name__ == "__main__":
    sys.exit(main())

"""Environment probe for the wire-transport packages the reference's
sink surface needs (gRPC Listen server per pqstream.proto:6-15, Kafka /
STOMP forwarders per contrib/cmd/pqsamq).

The repo serves Listen over HTTP NDJSON (streaming/wire_http.py — a
live, end-to-end-tested wire with the Dispatcher fan-out, per-client
regexp validation, byte-parity rendering, and disconnect-driven
unsubscribe; tests/test_wire_http.py). Only the FRAMING diverges from
the reference: gRPC needs grpcio, Kafka/STOMP need their client
packages, all absent here. This probe documents the absence per-round
AND fails loudly the moment a transport package appears, so the
framing gap can never silently outlive its excuse.
"""

from __future__ import annotations

import importlib.util


def _importable(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is not None
    except ModuleNotFoundError:  # parent package itself absent
        return False


def test_transport_packages_probe():
    status = {
        m: _importable(m)
        for m in (
            "grpc",
            "google.protobuf",
            "confluent_kafka",
            "kafka",
            "stomp",
            "pika",
        )
    }
    appeared = [m for m, ok in status.items() if ok]
    assert not appeared, (
        f"transport packages now available: {appeared} — the declared "
        "framing gap for F3/K2 is no longer excused. grpc -> add a "
        "Listen gRPC method over the same Dispatcher + renderer as "
        "streaming/wire_http.py (nothing below the framing changes); "
        "kafka/stomp -> replace the injected-client forwarders in "
        "streaming/sinks.py with real producers, then delete this assert."
    )

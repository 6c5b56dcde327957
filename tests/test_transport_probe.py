"""Environment probe for the wire-transport packages the reference's
sink surface needs (gRPC Listen server per pqstream.proto:6-15, Kafka /
STOMP forwarders per contrib/cmd/pqsamq).

The repo's F3/K2 components are declared PARTIAL because these packages
are absent from the container: the subscription semantics and
byte-parity JSON rendering exist (tests/test_wire_parity.py), but no
wire server can start. This probe documents the absence per-round AND
fails loudly the moment a transport package appears, so the partial can
never silently outlive its excuse.
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
        "PARTIAL for F3/K2 is no longer excused. Wire the real surface: "
        "grpc -> Listen server bridging streaming/subscribe.Dispatcher "
        "(render with streaming/sinks.event_to_json_line for byte parity), "
        "kafka/stomp -> replace the injected-client forwarders in "
        "streaming/sinks.py with real producers, then delete this assert."
    )

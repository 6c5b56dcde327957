"""F1/F2/F3 — the subscription surface (`Listen(table_regexp)`).

Reference: one event-loop goroutine multicasts every event to N
dynamic subscribers, each filtering by its own table regexp over an
UNBUFFERED channel — a slow client stalls the whole loop
(`/root/reference/server.go:249-315`, head-of-line TODO at :291).

Spark-first redesign: each subscriber is its own StreamingQuery over
the shared source. Isolation is structural — a slow sink slows only
its own query; there is no shared event loop to stall. Dynamic
subscribe/unsubscribe = start/stop of queries at runtime, which
Structured Streaming supports natively. Ordering within a subscriber
is by `seq` (the reference's implicit total order made explicit —
SURVEY.md §3.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.filters import compile_or_raise
from ..pipeline import handle_events
from ..operators.redact import FieldRedactions


class SubscriptionManager:
    """Manages per-client Listen queries over one raw event stream.

    `source_factory` returns a fresh streaming RawEvent DataFrame; each
    subscription builds its own plan from it (Spark requires one query
    per sink; sources share files/offsets but not execution)."""

    def __init__(
        self,
        source_factory: Callable[[], DataFrame],
        redactions: FieldRedactions | None = None,
    ) -> None:
        self._source_factory = source_factory
        self._redactions = redactions or {}
        self._queries: dict[str, StreamingQuery] = {}

    def listen(
        self,
        name: str,
        table_regexp: str = ".*",
        sink_format: str = "memory",
        output_mode: str = "append",
        checkpoint_dir: str | None = None,
        foreach_batch: Callable | None = None,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        """Start a subscription — parity with Server.Listen
        (server.go:284-302): bad regexp raises before any query starts;
        the filter applies per-subscriber on the shared pipeline."""
        compile_or_raise(table_regexp)
        if name in self._queries and self._queries[name].isActive:
            raise ValueError(f"subscription {name!r} already active")

        ev = handle_events(
            self._source_factory(),
            redactions=self._redactions,
            table_regexp=table_regexp,
        )
        if foreach_batch is not None:
            writer = ev.writeStream.foreachBatch(foreach_batch)
        else:
            writer = ev.writeStream.format(sink_format)
        writer = writer.outputMode(output_mode).queryName(name)
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if trigger:
            writer = writer.trigger(**trigger)
        q = writer.start()
        self._queries[name] = q
        return q

    def stop(self, name: str) -> None:
        """Unsubscribe — the reference prunes a subscriber when its
        callback returns false (server.go:249-253); here it's an
        explicit stop of that subscriber's query only."""
        q = self._queries.pop(name, None)
        if q is not None and q.isActive:
            q.stop()

    def active(self) -> list[str]:
        return [n for n, q in self._queries.items() if q.isActive]

    def stop_all(self) -> None:
        for name in list(self._queries):
            self.stop(name)

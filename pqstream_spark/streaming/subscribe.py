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
        typed_wire: bool = False,
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
            typed_wire=typed_wire,
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


class Dispatcher:
    """Single-query fan-out — the reference's exact topology (one event
    loop, N subscribers, `/root/reference/server.go:249-267`) as one
    StreamingQuery + a foreachBatch dispatcher.

    Trade-off vs per-query subscriptions (SubscriptionManager): the
    source is read ONCE per micro-batch regardless of subscriber count
    (cheaper at high fan-out), but subscribers share the batch cadence
    — a slow callback delays the next micro-batch for everyone, which
    is precisely the reference's head-of-line blocking (server.go:291).
    Use this for many cheap subscribers, per-query isolation for few
    expensive ones.

    A callback returning False unsubscribes (subscription.fn parity,
    server.go:30-33). Registration/removal is effective from the next
    micro-batch.
    """

    def __init__(self, events: DataFrame) -> None:
        self._events = events
        self._subs: dict[str, tuple] = {}
        self._query: StreamingQuery | None = None

    def subscribe(self, name: str, table_regexp: str, callback) -> None:
        import re

        pattern = re.compile(compile_or_raise(table_regexp))
        self._subs[name] = (pattern, callback)

    def unsubscribe(self, name: str) -> None:
        self._subs.pop(name, None)

    def subscribers(self) -> list[str]:
        return sorted(self._subs)

    def start(self, trigger: dict | None = None) -> StreamingQuery:
        def dispatch(batch_df: DataFrame, epoch_id: int) -> None:
            if not self._subs:
                return
            # toLocalIterator streams the sorted batch one partition at a
            # time — driver memory is bounded by a partition, not the
            # micro-batch (collect() here was the classic driver
            # bottleneck: "many cheap subscribers" routed the full event
            # stream through one list). Rows arrive in global seq order;
            # each is multicast to the surviving subscribers — the
            # reference's event-loop shape (server.go:249-267).
            for r in batch_df.orderBy("seq").toLocalIterator():
                if not self._subs:
                    break
                row = r.asDict()
                for name, (pattern, cb) in list(self._subs.items()):
                    if not pattern.search(row["table_name"] or ""):
                        continue
                    if not cb(row):
                        self.unsubscribe(name)  # False → unsubscribe

        writer = self._events.writeStream.foreachBatch(dispatch).queryName(
            "pqstream_dispatcher"
        )
        if trigger:
            writer = writer.trigger(**trigger)
        self._query = writer.start()
        return self._query

    def stop(self, drain: bool = False) -> None:
        """Stop the fan-out query. drain=True first processes every
        micro-batch already visible to the source, so subscribers see
        the in-flight work before shutdown (the graceful-stop contract,
        cmd/pqsd/main.go:113-118)."""
        if self._query is not None and self._query.isActive:
            if drain:
                try:
                    self._query.processAllAvailable()
                except Exception:
                    pass  # already terminal: nothing to drain
            self._query.stop()

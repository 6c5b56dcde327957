"""`pqstream_outbox` — a real Structured Streaming source for the
outbox, via the PySpark Python DataSource API (SURVEY.md §4.2: "the
JDBC outbox incremental reader … or a custom DataSourceStreamReader").

This replaces the reference's LISTEN loop (`/root/reference/server.go:
258-281`) with the engine-native contract: the streaming engine asks
for `latestOffset()` each trigger, plans bounded `(start, end]` seq
ranges as input partitions, and persists committed offsets in the
query checkpoint — reconnect/backoff/keepalive collapse into offset
replay (at-least-once upgraded from the reference's lossy NOTIFY).

    spark.dataSource.register(OutboxDataSource)
    spark.readStream.format("pqstream_outbox")
        .option("url", "sqlite:/path/app.db")
        .option("maxRowsPerBatch", 10000)
        .load()

Scale shape: the seq range splits into `numPartitions` slices so a
large backlog is read in parallel (each executor runs one bounded
range query — the classic JDBC partitioned read); steady-state batches
are capped by maxRowsPerBatch (rate limiting by construction, the
micro-batch analog of the reference's unbuffered-channel backpressure,
server.go:291). sqlite here; the same reader shape points at Postgres
by swapping the DB-API connect call — partition planning and offsets
are backend-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .outbox_local import LOCAL_OUTBOX_TABLE, OUTBOX_BATCH_SCHEMA


def _connect(url: str):
    if url.startswith("sqlite:"):
        import sqlite3

        return sqlite3.connect(url[len("sqlite:"):])
    raise ValueError(
        f"unsupported outbox url {url!r} (this environment has sqlite only; "
        "a Postgres deployment swaps in its DB-API driver here)"
    )


@dataclass
class SeqRange(InputPartition):
    lo: int  # exclusive
    hi: int  # inclusive


class OutboxStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._url = options.get("url")
        if not self._url:
            raise ValueError("pqstream_outbox requires option url=sqlite:PATH")
        self._max_rows = int(options.get("maxrowsperbatch", 100_000))
        self._num_partitions = int(options.get("numpartitions", 4))
        self._last_end: int | None = None

    # -- offsets: the outbox seq high-water mark ------------------------------
    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        """Rate limiting lives HERE, not in partitions(): the engine
        commits exactly the offset this returns, so clamping the planned
        range later would silently skip the clamped-off rows. Instead
        the reported latest advances at most max_rows per trigger past
        the previous report (the first trigger of a fresh reader is
        uncapped — the engine gives a restarted reader no committed
        base to cap from; bound recovery with the checkpoint instead)."""
        conn = _connect(self._url)
        try:
            row = conn.execute(
                f"SELECT COALESCE(MAX(seq), 0) FROM {LOCAL_OUTBOX_TABLE}"
            ).fetchone()
        finally:
            conn.close()
        true_max = int(row[0])
        if self._last_end is not None:
            true_max = min(true_max, self._last_end + self._max_rows)
        self._last_end = true_max
        return {"seq": true_max}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["seq"]), int(end["seq"])
        if hi <= lo:
            return [SeqRange(lo, lo)]
        n = min(self._num_partitions, hi - lo)
        step = (hi - lo + n - 1) // n
        return [
            SeqRange(p_lo, min(p_lo + step, hi))
            for p_lo in range(lo, hi, step)
        ]

    def read(self, partition: SeqRange):
        if partition.hi <= partition.lo:
            return
        from datetime import datetime

        conn = _connect(self._url)
        try:
            cur = conn.execute(
                f"SELECT seq, ts, schema_name, table_name, op, id, "
                f"payload, previous FROM {LOCAL_OUTBOX_TABLE} "
                f"WHERE seq > ? AND seq <= ? ORDER BY seq",
                (partition.lo, partition.hi),
            )
            for seq, ts, schema_name, table_name, op, id_, payload, prev in cur:
                yield (
                    int(seq),
                    datetime.fromisoformat(ts.replace("Z", "+00:00")).replace(
                        tzinfo=None
                    ),
                    schema_name,
                    table_name,
                    op,
                    id_,
                    payload,
                    prev,
                )
        finally:
            conn.close()

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint; the outbox is append-only
        # (retention/compaction is a DDL concern, not the reader's)
        pass


class OutboxDataSource(DataSource):
    """spark.dataSource.register(OutboxDataSource); then
    readStream.format("pqstream_outbox")."""

    @classmethod
    def name(cls) -> str:
        return "pqstream_outbox"

    def schema(self) -> StructType:
        return OUTBOX_BATCH_SCHEMA

    def streamReader(self, schema: StructType) -> OutboxStreamReader:
        return OutboxStreamReader(self.options)

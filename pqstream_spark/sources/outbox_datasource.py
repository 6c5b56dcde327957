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
        .option("url", "sqlite:/path/app.db")        # or
        .option("url", "postgres:host=/run/pg dbname=app user=pq")
        .option("maxRowsPerBatch", 10000)
        .load()

Backends:
- `sqlite:PATH` — the in-process backend (stdlib sqlite3).
- `postgres:CONNINFO` / `postgresql:CONNINFO` — live PostgreSQL over
  the psql transport (SURVEY §3.4's S5 mapping completed for the real
  database). `latestOffset` is FENCED by `PgSeqFence`: the reported
  offset never passes a seq a still-open transaction could commit
  below (BIGSERIAL seq order != commit order), so checkpointed
  offsets stay loss-free under concurrent writers — the same fix the
  poller carries. Partition reads run `psql --csv` ON THE EXECUTORS
  (each InputPartition is one bounded seq sub-range, planned from row
  quantiles so sparse seq spaces still balance), zero driver
  materialization — the engine-managed-offset form of
  `pg_read_outbox_distributed`.

Scale shape: the seq range splits into `numPartitions` slices so a
large backlog is read in parallel (each executor runs one bounded
range query — the classic JDBC partitioned read); steady-state batches
are capped by maxRowsPerBatch (rate limiting by construction, the
micro-batch analog of the reference's unbuffered-channel backpressure,
server.go:291). On a real cluster the postgres backend needs TCP
conninfo + client binaries on executors, or swap in the JDBC path
(`sources.outbox.OutboxPoller`) — partition planning and offsets are
backend-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .outbox_local import (
    LOCAL_OFFSET_TABLE,
    LOCAL_OUTBOX_TABLE,
    OUTBOX_BATCH_SCHEMA,
)


def _connect(url: str):
    if url.startswith("sqlite:"):
        import sqlite3

        return sqlite3.connect(url[len("sqlite:"):])
    raise ValueError(
        f"unsupported sqlite outbox url {url!r}"
    )


def _split_url(url: str) -> tuple[str, str]:
    """→ (backend, rest): 'sqlite:PATH' → ('sqlite', PATH);
    'postgres:CONNINFO' / 'postgresql:CONNINFO' → ('postgres', CONNINFO)."""
    for scheme, backend in (
        ("sqlite:", "sqlite"),
        ("postgresql:", "postgres"),
        ("postgres:", "postgres"),
    ):
        if url.startswith(scheme):
            return backend, url[len(scheme):]
    raise ValueError(
        f"unsupported outbox url {url!r} (want sqlite:PATH or "
        "postgres:CONNINFO)"
    )


@dataclass
class SeqRange(InputPartition):
    lo: int  # exclusive
    hi: int  # inclusive


def _read_range_sqlite(url: str, lo: int, hi: int):
    from datetime import datetime

    conn = _connect(url)
    try:
        cur = conn.execute(
            f"SELECT seq, ts, schema_name, table_name, op, id, "
            f"payload, previous FROM {LOCAL_OUTBOX_TABLE} "
            f"WHERE seq > ? AND seq <= ? ORDER BY seq",
            (lo, hi),
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


def _read_range_pg(conninfo: str, lo: int, hi: int):
    """One bounded psql CSV read (PsqlRunner.query_csv — the single
    home of the psql invocation contract), ON the executor the
    partition was scheduled to (the reader object is pickled there) —
    rows never pass through the driver. Safe under concurrent writers
    because the planned range was fenced: every seq <= hi is final, so
    this late-running read sees exactly the planned row set."""
    from .outbox import OUTBOX_TABLE
    from .outbox_pg import PsqlRunner, _parse_pg_ts

    rows = PsqlRunner(conninfo).query_csv(
        f"SELECT seq, ts, schema_name, table_name, op, id, "
        f"payload::text AS payload_json, "
        f"previous::text AS previous_json "
        f"FROM {OUTBOX_TABLE} "
        f"WHERE seq > {int(lo)} AND seq <= {int(hi)} "
        f"ORDER BY seq"
    )
    for r in rows:
        yield (
            int(r["seq"]),
            _parse_pg_ts(r["ts"]),
            r["schema_name"],
            r["table_name"],
            r["op"],
            r["id"],
            r["payload_json"],
            r["previous_json"],
        )


class _ReaderCommon:
    """Option parsing + partition planning + range reads shared by the
    stream and batch readers (one planner, one read dispatch — a fix
    to either applies to both paths)."""

    def _init_common(self, options: dict) -> None:
        self._url = options.get("url")
        if not self._url:
            raise ValueError(
                "pqstream_outbox requires option url=sqlite:PATH or "
                "url=postgres:CONNINFO"
            )
        self._backend, self._target = _split_url(self._url)
        self._num_partitions = int(options.get("numpartitions", 4))
        self._fence_wait = float(options.get("fencewait", 2.0))

    def _plan_ranges(self, lo: int, hi: int) -> list[SeqRange]:
        if hi <= lo:
            return [SeqRange(lo, lo)]
        if self._backend == "postgres":
            # row-quantile splits: a sparse post-compaction seq space
            # still spreads evenly across the executor readers
            from .outbox_pg import PsqlRunner, pg_plan_balanced_bounds

            bounds = pg_plan_balanced_bounds(
                PsqlRunner(self._target), lo, hi, self._num_partitions
            )
            if not bounds:
                return [SeqRange(lo, lo)]
            return [SeqRange(b_lo, b_hi) for b_lo, b_hi in bounds]
        n = min(self._num_partitions, hi - lo)
        step = (hi - lo + n - 1) // n
        return [
            SeqRange(p_lo, min(p_lo + step, hi))
            for p_lo in range(lo, hi, step)
        ]

    def _read_range(self, partition: SeqRange):
        if partition.hi <= partition.lo:
            return
        if self._backend == "postgres":
            yield from _read_range_pg(self._target, partition.lo, partition.hi)
        else:
            yield from _read_range_sqlite(self._url, partition.lo, partition.hi)


class OutboxStreamReader(_ReaderCommon, DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        import random

        self._init_common(options)
        self._max_rows = int(options.get("maxrowsperbatch", 100_000))
        self._floor_consumer = options.get("consumer", "datasource")
        # txnAligned (round 10, VERDICT r9 #5): reported offsets are
        # pulled back to TRANSACTION boundaries (no xid's rows on both
        # sides of the offset), so a micro-batch is all-or-nothing per
        # writer transaction — the outbox-path analog of the logical
        # DataSource's inherent alignment. Postgres only: the sqlite
        # backend's outbox has no xid column (single-writer, nothing
        # to tear).
        self._txn_aligned = str(
            options.get("txnaligned", "")).lower() in ("1", "true", "yes")
        if self._txn_aligned and options.get("url", "").startswith("sqlite:"):
            raise ValueError(
                "txnAligned requires the postgres backend (the sqlite "
                "outbox is single-writer and carries no xid)"
            )
        if self._txn_aligned:
            # xid extent lookups as index probes; created HERE (reader
            # construction), never inside a poll — CREATE INDEX queues
            # behind open writers and would wedge the trigger loop
            from .outbox_pg import OUTBOX_TABLE as _OT
            from .outbox_pg import PsqlRunner as _PR

            _PR(self._target).sql(
                f"CREATE INDEX IF NOT EXISTS {_OT}_xid_idx "
                f"ON {_OT} (xid);"
            )
        self._last_end: int | None = None
        self._fence = None  # lazy: driver-side only, never shipped state
        self._floor_persisted = 0
        # Consumer-key collision guard (VERDICT r8 "what's wrong" #3):
        # two live queries sharing one consumer key share the retention
        # row — compact() keyed on the faster query's commit can delete
        # rows the slower one has not checkpointed (silent loss on its
        # restart). The engine gives this reader no query-stable
        # identity to derive a unique default from (checkpointLocation
        # is a SINK option; verified empirically that only readStream
        # options reach DataSource.options), so collisions are detected
        # at runtime instead: each reader stamps a random nonce into a
        # `{consumer}#lease` row whenever it writes offsets, and reads
        # the previous stamp in the same statement. A foreign stamp
        # seen TWICE consecutively means the other writer re-stamped
        # after our overwrite — both readers are alive — and the query
        # fails loudly naming the fix. One foreign stamp is tolerated
        # (a crashed predecessor's leftover; takeover is the restart
        # path). SIGKILL-restart stress keeps passing: a fresh reader's
        # first write is always a takeover.
        self._lease_nonce = random.getrandbits(62)
        self._lease_foreign_streak = 0
        if self._backend == "postgres":
            # restart floor (review finding): a FRESH fence under an
            # open writer proves nothing and would report an offset
            # BELOW the checkpointed start; Spark compares offsets by
            # equality only, so the regressed end lands in the offset
            # log and the next drained batch re-delivers the whole
            # sub-checkpoint history. Every offset latestOffset REPORTS
            # is therefore persisted first (monotone, GREATEST-merged)
            # under `{consumer}#reportfloor` in pqstream_consumer_offset
            # in the source database — report time, not commit() time,
            # because the engine calls commit() lazily and not at all
            # before a stop(), leaving exactly the restart window open
            # (observed live). A restarted reader starts its reporting
            # floor there.
            #
            # The report floor is deliberately NOT the retention offset:
            # it runs AHEAD of the query checkpoint (report → checkpoint
            # write is a crash window), so compaction keyed on it could
            # delete rows a restarted query still needs to re-read.
            # compact() excludes `%#reportfloor`; retention is held by
            # the plain `{consumer}` row instead — registered at 0 here
            # (protected from first connect, the LocalOutboxPoller
            # contract) and advanced only in commit(), when the engine
            # has durably finished the batch. Distinct queries on one
            # outbox MUST set distinct option("consumer", ...) keys —
            # enforced at runtime by the lease guard above.
            self._last_end = self._read_floor()
            self._floor_persisted = self._last_end or 0
        else:
            # sqlite needs no report floor (MAX(seq) over an append-only
            # single-writer table is monotone by construction), but the
            # retention contract is the same: register the delivered
            # consumer at 0 so a durable poller's compact() on the same
            # outbox cannot prune rows this query has not checkpointed.
            self._register_delivered_sqlite()

    # -- offsets: the outbox seq high-water mark ------------------------------
    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _runner(self):
        from .outbox_pg import PG_OFFSET_TABLE, PsqlRunner, _quote_lit

        return (PsqlRunner(self._target), PG_OFFSET_TABLE,
                _quote_lit(self._floor_consumer),
                _quote_lit(self._floor_consumer + "#reportfloor"))

    def _collision_error(self) -> RuntimeError:
        return RuntimeError(
            f"pqstream_outbox: another live streaming query is using "
            f"consumer key {self._floor_consumer!r} on this outbox. A "
            "shared key shares the retention row and report floor, so "
            "the slower query's replay window can be compacted away. "
            'Give each query a distinct .option("consumer", ...) key.'
        )

    def _check_lease_stamp(self, old: int | None) -> None:
        """`old` is the lease row's value BEFORE this reader's stamp
        landed. Constructor comment: one foreign stamp = takeover
        (crashed predecessor); two consecutive = both writers alive."""
        if old is None or int(old) == self._lease_nonce:
            self._lease_foreign_streak = 0
            return
        self._lease_foreign_streak += 1
        if self._lease_foreign_streak >= 2:
            raise self._collision_error()

    def _stamp_lease_pg(self, runner, table, lease_key) -> None:
        # data-modifying CTE: the outer SELECT sees the statement-start
        # snapshot, i.e. the PREVIOUS stamp — write + read-old in one
        # round trip
        old = runner.scalar(
            f"WITH up AS (INSERT INTO {table} (consumer, last_seq) "
            f"VALUES ({lease_key}, {self._lease_nonce}) "
            f"ON CONFLICT (consumer) DO UPDATE SET "
            f"last_seq = excluded.last_seq) "
            f"SELECT last_seq FROM {table} WHERE consumer = {lease_key}"
        )
        self._check_lease_stamp(None if old is None else int(old))

    def _lease_key(self):
        from .outbox_pg import _quote_lit

        return _quote_lit(self._floor_consumer + "#lease")

    def _read_floor(self) -> int | None:
        runner, table, key, floor_key = self._runner()
        runner.sql(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "consumer TEXT PRIMARY KEY, last_seq BIGINT NOT NULL);"
            # register the DELIVERED consumer at 0 immediately:
            # compaction's low-water mark only protects consumers it
            # can see (constructor comment)
            f"INSERT INTO {table} (consumer, last_seq) "
            f"VALUES ({key}, 0) ON CONFLICT (consumer) DO NOTHING;"
        )
        # establish lease ownership up front (always a takeover here:
        # streak starts at 0, so a predecessor's stamp never raises)
        self._stamp_lease_pg(runner, table, self._lease_key())
        got = runner.scalar(
            f"SELECT last_seq FROM {table} WHERE consumer = {floor_key}"
        )
        return int(got) if got is not None else None

    def _register_delivered_sqlite(self) -> None:
        conn = _connect(self._url)
        try:
            conn.execute(
                f"CREATE TABLE IF NOT EXISTS {LOCAL_OFFSET_TABLE} ("
                "consumer TEXT PRIMARY KEY, last_seq INTEGER NOT NULL)"
            )
            conn.execute(
                f"INSERT INTO {LOCAL_OFFSET_TABLE} (consumer, last_seq) "
                "VALUES (?, 0) ON CONFLICT(consumer) DO NOTHING",
                (self._floor_consumer,),
            )
            self._stamp_lease_sqlite(conn)
            conn.commit()
        finally:
            conn.close()

    def _stamp_lease_sqlite(self, conn) -> None:
        """Same lease protocol as PG; read-old + stamp are atomic under
        sqlite's whole-database write lock (caller commits)."""
        lease = self._floor_consumer + "#lease"
        row = conn.execute(
            f"SELECT last_seq FROM {LOCAL_OFFSET_TABLE} WHERE consumer = ?",
            (lease,),
        ).fetchone()
        conn.execute(
            f"INSERT INTO {LOCAL_OFFSET_TABLE} (consumer, last_seq) "
            "VALUES (?, ?) ON CONFLICT(consumer) DO UPDATE SET "
            "last_seq = excluded.last_seq",
            (lease, self._lease_nonce),
        )
        self._check_lease_stamp(None if row is None else int(row[0]))

    def _pg_fence_seq(self) -> int:
        from .outbox_pg import PgSeqFence, PsqlRunner

        if self._fence is None:
            self._fence = PgSeqFence(PsqlRunner(self._target))
        return self._fence.safe_seq(wait=self._fence_wait)

    def latestOffset(self) -> dict:
        """Rate limiting lives HERE, not in partitions(): the engine
        commits exactly the offset this returns, so clamping the planned
        range later would silently skip the clamped-off rows. Instead
        the reported latest advances at most max_rows per trigger past
        the previous report (the first trigger of a fresh reader is
        uncapped above the durable floor — the floor, not the cap,
        bounds recovery).

        postgres: the reported offset is the FENCED safe ceiling, never
        the visible MAX(seq) — an offset the checkpoint commits is a
        promise no in-flight transaction can break (see PgSeqFence) —
        and never regresses below the durable floor (constructor
        comment)."""
        if self._backend == "postgres":
            true_max = self._pg_fence_seq()
        else:
            conn = _connect(self._url)
            try:
                row = conn.execute(
                    f"SELECT COALESCE(MAX(seq), 0) FROM {LOCAL_OUTBOX_TABLE}"
                ).fetchone()
            finally:
                conn.close()
            true_max = int(row[0])
        if self._last_end is not None:
            capped = min(true_max, self._last_end + self._max_rows)
        else:
            capped = true_max
        if self._txn_aligned and capped > (self._last_end or 0):
            base = self._last_end or 0
            aligned = self._txn_boundary(base, capped)
            if aligned <= base and true_max > capped:
                # one transaction larger than the rate cap: atomicity
                # wins — report the SMALLEST boundary past the base
                # within the fence (the logical DataSource's stance)
                aligned = self._txn_boundary(base, true_max,
                                             smallest=True)
            capped = max(aligned, base)
        self._last_end = max(capped, self._last_end or 0)
        if (self._backend == "postgres"
                and self._last_end > self._floor_persisted):
            self._persist_floor(self._last_end)
        return {"seq": self._last_end}

    def _txn_boundary(self, base: int, cap: int,
                      smallest: bool = False) -> int:
        """Largest (or smallest, for the oversized-txn escape) seq B in
        (base, cap] such that NO transaction has rows on both sides of
        B — one window query over the fenced range: per-xid max seq
        (NULL xids are their own one-row groups: no txn identity,
        nothing to tear), running max by seq, boundary where the
        running reach equals the row's own seq. Every candidate is
        <= the fence, so all its rows are final; rows of a straddling
        committed txn above the fence are visible to this read and
        push the reach past the boundary — exactly the tear the pullback
        prevents."""
        from .outbox_pg import OUTBOX_TABLE, PsqlRunner

        runner = PsqlRunner(self._target)
        agg = "MIN" if smallest else "MAX"
        got = runner.scalar(
            "WITH win AS (SELECT seq, xid "
            f"FROM {OUTBOX_TABLE} WHERE seq > {int(base)} "
            f"AND seq <= {int(cap)}), "
            "ext AS (SELECT x.xid, MAX(o.seq) AS mx "
            "FROM (SELECT DISTINCT xid FROM win WHERE xid IS NOT NULL) x "
            f"JOIN {OUTBOX_TABLE} o ON o.xid = x.xid GROUP BY x.xid), "
            "r AS (SELECT win.seq, MAX(COALESCE(ext.mx, win.seq)) "
            "OVER (ORDER BY win.seq) AS reach "
            "FROM win LEFT JOIN ext ON win.xid = ext.xid) "
            f"SELECT COALESCE({agg}(seq), {int(base)}) FROM r "
            "WHERE reach = seq"
        )
        return int(got or base)

    def _persist_floor(self, seq: int) -> None:
        runner, table, _key, floor_key = self._runner()
        runner.sql(
            f"INSERT INTO {table} (consumer, last_seq) "
            f"VALUES ({floor_key}, {int(seq)}) "
            f"ON CONFLICT (consumer) DO UPDATE SET last_seq = "
            f"GREATEST({table}.last_seq, excluded.last_seq);"
        )
        self._floor_persisted = seq
        # collision check rides every floor advance — exactly the
        # moments a shared key could mask another query's replay window
        self._stamp_lease_pg(runner, table, self._lease_key())

    def partitions(self, start: dict, end: dict):
        return self._plan_ranges(int(start["seq"]), int(end["seq"]))

    def read(self, partition: SeqRange):
        yield from self._read_range(partition)

    def commit(self, end: dict) -> None:
        """The query checkpoint owns restart offsets and the report
        floor is written at REPORT time in latestOffset (constructor
        comment — commit() is called too lazily to close the restart
        window). What commit() DOES own is retention: it advances the
        plain `{consumer}` row — the only one compact() keys on — so
        rows stay replayable until the engine has durably finished the
        batch, never merely reported it."""
        seq = int(end["seq"])
        if self._backend == "postgres":
            runner, table, key, _floor_key = self._runner()
            runner.sql(
                f"INSERT INTO {table} (consumer, last_seq) "
                f"VALUES ({key}, {seq}) "
                f"ON CONFLICT (consumer) DO UPDATE SET last_seq = "
                f"GREATEST({table}.last_seq, excluded.last_seq);"
            )
        else:
            conn = _connect(self._url)
            try:
                conn.execute(
                    f"INSERT INTO {LOCAL_OFFSET_TABLE} (consumer, last_seq) "
                    "VALUES (?, ?) ON CONFLICT(consumer) DO UPDATE SET "
                    "last_seq = MAX(last_seq, excluded.last_seq)",
                    (self._floor_consumer, seq),
                )
                # sqlite has no report floor, so retention advance is
                # this backend's only recurring write point — the lease
                # check rides it
                self._stamp_lease_sqlite(conn)
                conn.commit()
            finally:
                conn.close()


class OutboxBatchReader(_ReaderCommon, DataSourceReader):
    """Batch form — `spark.read.format("pqstream_outbox")` — for
    backfills and ad-hoc changelog queries: one bounded partitioned
    scan of the outbox seq range. Options `sinceSeq` (exclusive,
    default 0) and `untilSeq` (inclusive; default = the current safe
    ceiling — FENCED on postgres, so a backfill boundary is final and
    a follow-up stream from `untilSeq` misses nothing committed
    later with a lower seq)."""

    def __init__(self, options: dict) -> None:
        self._init_common(options)
        self._since = int(options.get("sinceseq", 0))
        self._until = options.get("untilseq")

    def _ceiling(self) -> int:
        if self._backend == "postgres":
            from .outbox_pg import PgSeqFence, PsqlRunner

            return PgSeqFence(PsqlRunner(self._target)).safe_seq(
                wait=self._fence_wait
            )
        conn = _connect(self._url)
        try:
            row = conn.execute(
                f"SELECT COALESCE(MAX(seq), 0) FROM {LOCAL_OUTBOX_TABLE}"
            ).fetchone()
            return int(row[0])
        finally:
            conn.close()

    def partitions(self):
        lo = self._since
        hi = int(self._until) if self._until is not None else self._ceiling()
        return self._plan_ranges(lo, hi)

    def read(self, partition: SeqRange):
        yield from self._read_range(partition)


class OutboxDataSource(DataSource):
    """spark.dataSource.register(OutboxDataSource); then
    readStream.format("pqstream_outbox") for the changelog stream, or
    read.format("pqstream_outbox") for a bounded backfill scan."""

    @classmethod
    def name(cls) -> str:
        return "pqstream_outbox"

    def schema(self) -> StructType:
        return OUTBOX_BATCH_SCHEMA

    def streamReader(self, schema: StructType) -> OutboxStreamReader:
        return OutboxStreamReader(self.options)

    def reader(self, schema: StructType) -> OutboxBatchReader:
        return OutboxBatchReader(self.options)

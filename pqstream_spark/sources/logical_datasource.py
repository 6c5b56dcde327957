"""`pqstream_logical` — the logical-replication transport as a real
Structured Streaming source (round 9; the engine-managed-offset form
of `sources/logical_pg.py`, completing parity with the outbox's
`pqstream_outbox` DataSource).

    spark.dataSource.register(LogicalDataSource)
    spark.readStream.format("pqstream_logical")
        .option("url", "postgres:host=/run/pg dbname=app user=pq")
        .option("slot", "my_consumer_slot")
        .option("maxChangesPerBatch", 10000)
        .load()

Offset model: offsets are the poller's replay-stable dense seqs,
always TRANSACTION-ALIGNED — `latestOffset` reports only complete-
transaction boundaries (read_rows never tears a transaction), so a
micro-batch is all-or-nothing at the transaction level by
construction: the property the outbox path needs TxnAssembler for,
free here. `commit(end)` advances the replication slot (and the
(seq, LSN) anchor rows) to the boundary the engine durably finished —
the slot's `confirmed_flush_lsn` is the crash-safe cursor, so a
restart replays exactly the unconfirmed window with byte-identical
seqs (PgLogicalPoller's numbering invariant).

Execution shape: WAL decode is inherently serial (it IS the definition
of the changelog), so each trigger's rows are parsed once driver-side
and shipped to executors inside the InputPartitions (bounded by
maxChangesPerBatch; the same driver-materialization stance as
PgLogicalPoller, stated honestly). Downstream parallelism comes from
Spark repartitioning the envelope stream; independent consumers use
independent slots.

Unlike the outbox DataSource there is no consumer-key lease and no
report floor: the slot IS the consumer identity (cluster-global name —
two queries cannot share one slot's confirmed_flush_lsn without
Postgres itself serializing them), and offsets never regress because
the numbering anchor is committed before the slot advance."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .outbox_local import OUTBOX_BATCH_SCHEMA


@dataclass
class RowsPartition(InputPartition):
    rows: list = field(default_factory=list)


class LogicalStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        from .logical_pg import DEFAULT_SLOT, PgLogicalPoller
        from .outbox_pg import PsqlRunner

        url = options.get("url", "")
        for scheme in ("postgresql:", "postgres:"):
            if url.startswith(scheme):
                conninfo = url[len(scheme):]
                break
        else:
            raise ValueError(
                "pqstream_logical requires option url=postgres:CONNINFO"
            )
        plugin = options.get("plugin", "test_decoding")
        if plugin == "pgoutput":
            # the replication-grade binary plugin with server-side
            # publication filtering — same poller contract, so the
            # entire offset/staging machinery below is plugin-agnostic
            from .pgoutput_pg import DEFAULT_PUBLICATION, PgOutputPoller

            self._poller = PgOutputPoller.open_durable(
                PsqlRunner(conninfo),
                slot=options.get("slot", DEFAULT_SLOT),
                consumer=options.get("consumer", "datasource"),
                publication=options.get("publication", DEFAULT_PUBLICATION),
                table_regexp=options.get("tableregexp") or None,
                # protocol v2 streamed in-progress transactions: large
                # txns stream at logical_decoding_work_mem instead of
                # buffering server-side; batches stay txn-aligned
                streaming=str(options.get("streaming", "")
                              ).lower() in ("1", "true", "yes"),
                # giant-transaction spool (round 11): binary spool via
                # structural reframing of pg_recvlogical's output
                spill_dir=options.get("spilldir") or None,
            )
        elif plugin == "test_decoding":
            self._poller = PgLogicalPoller.open_durable(
                PsqlRunner(conninfo),
                slot=options.get("slot", DEFAULT_SLOT),
                consumer=options.get("consumer", "datasource"),
                table_regexp=options.get("tableregexp") or None,
                # giant-transaction spill drain (round 10): without it
                # a GiantTxnError (torn-anchor replay window wider than
                # max_peek) fails the query loudly; with it the backlog
                # spools through pg_recvlogical and arrives as one
                # txn-aligned batch. Spool batches compose with the
                # normal commit path: advance_to's GREATEST guard
                # absorbs the already-advanced slot, and the
                # consumed-check cleans the spool on the next trigger.
                spill_dir=options.get("spilldir") or None,
            )
        else:
            raise ValueError(
                f"unknown plugin {plugin!r} (test_decoding or pgoutput)"
            )
        self._poller.max_changes = int(
            options.get("maxchangesperbatch", 100_000)
        )
        self._poller.max_peek = int(
            options.get("maxpeek", self._poller.max_peek)
        )
        # staging from the most recent read_rows: seq-keyed rows and the
        # txn boundaries they can be committed at. Rebuilt on every
        # latestOffset (the peek re-reads the slot's unconfirmed window
        # with identical seqs, so a post-restart partitions() call for
        # a checkpointed range re-stages the same rows).
        self._staged_rows: list[tuple] = []
        self._boundaries: dict[int, tuple[str, int]] = {}
        self._reported = self._poller.last_seq

    def __getstate__(self) -> dict:
        """pyspark pickles the reader into the executor-side read
        closure (reader.read(partition)); the staged window and
        boundary map are driver-state that read() never touches —
        shipping them would double each micro-batch's serialized
        payload (review finding). Executors get an empty stage."""
        state = self.__dict__.copy()
        state["_staged_rows"] = []
        state["_boundaries"] = {}
        return state

    def initialOffset(self) -> dict:
        return {"seq": self._poller.last_seq}

    def _stage(self, upto: int | None = None) -> None:
        rows, boundaries = self._poller.read_rows(upto=upto)
        self._staged_rows = rows
        for end_seq, lsn_text, lsn_big in boundaries:
            self._boundaries[end_seq] = (lsn_text, lsn_big)

    def latestOffset(self) -> dict:
        """Reports the seq of the last staged ROW, not the last txn
        boundary: change-free transactions (the poller's own flush
        barrier, engine-table writes) do not move seqs, and reporting
        their boundaries would make every poll manufacture a new
        offset — processAllAvailable would chase the barrier forever.
        Their LSNs still fold into the boundary map under the same seq
        key (dict overwrite keeps the latest), so committing a row
        boundary advances the slot past trailing change-free txns
        too.

        Progress-aware escalation: the slot re-peeks its whole
        unconfirmed window each trigger, so a small maxChangesPerBatch
        can fill the window with ALREADY-REPORTED transactions — the
        uncommitted batch — and cut off the next one, reporting no
        progress while data is pending (the engine would believe the
        source drained). When staged rows show no progress past the
        last report, the window escalates until it does (bounded by
        max_peek); an empty stage never escalates here (idle polls
        must stay one cheap peek)."""
        self._stage()
        upto = self._poller.max_changes
        while (self._staged_rows
               and self._staged_rows[-1][0] <= self._reported
               and upto < self._poller.max_peek):
            upto = min(upto * 4, self._poller.max_peek)
            self._stage(upto=upto)
        new_bounds = [s for s in self._boundaries if s > self._reported]
        if new_bounds:
            # rate limit survives the escalation: report the largest
            # txn boundary within maxChangesPerBatch of the last
            # report, or the smallest new boundary when one oversized
            # transaction exceeds the cap (txn atomicity wins)
            cap = self._reported + self._poller.max_changes
            within = [s for s in new_bounds if s <= cap]
            chosen = max(within) if within else min(new_bounds)
            self._reported = chosen
            return {"seq": chosen}
        # no new boundaries: hold the line at the last REPORT, never the
        # poller's committed position — an in-flight (reported, not yet
        # committed) batch keeps last_seq behind _reported, and a
        # regressed offset lands in Spark's offset log, re-planning a
        # range the slot will have advanced past by the next trigger
        self._reported = max(self._reported, self._poller.last_seq)
        # Idle housekeeping (round 10, ADVICE r9): each poll's flush
        # barrier writes one WAL record, but the slot only advances in
        # commit() — which never fires while the stream is idle, so
        # confirmed_flush_lsn froze while every trigger appended
        # another barrier transaction: WAL retention AND the per-poll
        # decode window grew without bound for the whole idle period.
        # When the staged window holds ONLY change-free boundaries
        # (no undelivered rows anywhere — an in-flight reported batch
        # would re-peek its rows into _staged_rows), advancing the slot
        # to the newest one is safe: those transactions deliver no rows
        # and no seqs depend on them.
        if not self._staged_rows:
            idle = self._boundaries.pop(self._poller.last_seq, None)
            if idle is not None:
                self._poller.advance_to(
                    idle[0], idle[1], self._poller.last_seq)
        return {"seq": self._reported}

    def _restage_until(self, target_seq: int) -> None:
        """Re-peek with an escalating window until the staged rows
        reach `target_seq` (or the window caps): a checkpointed range
        originally staged via latestOffset's escalation is NOT
        reproducible by one default-window peek after a restart
        (review finding) — the window must grow the same way."""
        upto = self._poller.max_changes
        self._stage()
        while ((not self._staged_rows
                or self._staged_rows[-1][0] < target_seq)
               and upto < self._poller.max_peek):
            upto = min(upto * 4, self._poller.max_peek)
            self._stage(upto=upto)

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["seq"]), int(end["seq"])
        if hi <= lo:
            return [RowsPartition([])]
        rows = [r for r in self._staged_rows if lo < r[0] <= hi]
        if len(rows) != hi - lo:
            # restart replay: the checkpointed range predates this
            # process — re-peek (replay-stable seqs) and re-slice
            self._restage_until(hi)
            rows = [r for r in self._staged_rows if lo < r[0] <= hi]
        if len(rows) != hi - lo:
            raise RuntimeError(
                f"pqstream_logical: cannot reconstruct offsets "
                f"({lo}, {hi}] from the slot — was the slot advanced "
                "externally or shared by another consumer?"
            )
        # a handful of bounded slices: decode is serial, but executor-
        # side parse/downstream work still spreads
        n = max(1, min(4, len(rows) // 2500 + 1))
        step = (len(rows) + n - 1) // n
        return [
            RowsPartition(rows[i:i + step]) for i in range(0, len(rows), step)
        ] or [RowsPartition([])]

    def read(self, partition: RowsPartition):
        yield from partition.rows

    def commit(self, end: dict) -> None:
        end_seq = int(end["seq"])
        if end_seq <= self._poller.last_seq:
            return
        if end_seq not in self._boundaries:
            # offsets are only ever boundaries this reader reported; a
            # restart rebuilds the map with the same escalating window
            self._restage_until(end_seq)
        if end_seq not in self._boundaries:
            raise RuntimeError(
                f"pqstream_logical: commit offset {end_seq} is not a "
                "transaction boundary the slot can reproduce — was the "
                "slot advanced externally or shared by another consumer?"
            )
        lsn_text, lsn_big = self._boundaries[end_seq]
        self._poller.advance_to(lsn_text, lsn_big, end_seq)
        self._boundaries = {
            s: v for s, v in self._boundaries.items() if s > end_seq
        }


class LogicalDataSource(DataSource):
    """spark.dataSource.register(LogicalDataSource); then
    readStream.format("pqstream_logical") for the commit-ordered,
    transaction-aligned changelog stream. With option `shards=N`
    (pgoutput + spillDir required) the stream rides N publication-
    scoped slots decoded in parallel with executor-side spool parse —
    the daemon's round-11 scale-out on the engine-native surface
    (sharded_datasource module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "pqstream_logical"

    def schema(self) -> StructType:
        return OUTBOX_BATCH_SCHEMA

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self.options.get("shards") is not None:
            from .sharded_datasource import ShardedLogicalStreamReader

            return ShardedLogicalStreamReader(self.options)
        return LogicalStreamReader(self.options)

"""The pqstream_outbox DataSource on LIVE PostgreSQL (round-8 ask #2):
`readStream.format("pqstream_outbox").option("url", "postgres:...")`
runs the changelog through engine-managed checkpointed offsets — the
SURVEY §3.4 S5 mapping (checkpointed readStream replacing the
reference's LISTEN loop, server.go:258-281) completed for the real
database. Offsets are fenced (PgSeqFence), partition reads are
executor-side psql, and crash recovery is exercised with a genuine
SIGKILL of the whole streaming-query process."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from pqstream_spark.sources.outbox_pg import (
    EphemeralPostgres,
    PgCaptureManager,
    pg_available,
)

pytestmark = pytest.mark.skipif(
    not pg_available(), reason="PostgreSQL server binaries not installed"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTES_DDL = "CREATE TABLE notes (id serial, created_at timestamp, note text)"


@pytest.fixture(scope="module")
def pg():
    srv = EphemeralPostgres.temp()
    srv.initdb()
    srv.start()
    yield srv
    srv.destroy()


def _fresh_db(pg, name):
    r = pg.createdb(name)
    r.sql(NOTES_DDL + ";")
    PgCaptureManager(r, table_regexp="notes").install()
    return r


def test_pg_stream_reads_live_writes(spark, pg, tmp_path):
    """readStream on the postgres url: initial backlog plus writes
    arriving mid-query all surface, exactly once, engine offsets."""
    from pqstream_spark.sources.outbox_datasource import OutboxDataSource

    r = _fresh_db(pg, "ds_live")
    spark.dataSource.register(OutboxDataSource)
    r.sql(
        "INSERT INTO notes SELECT g, now(), 's' || g "
        "FROM generate_series(1, 6) g;"
    )
    stream = (
        spark.readStream.format("pqstream_outbox")
        .option("url", f"postgres:{pg.conninfo('ds_live')}")
        .option("numPartitions", "3")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("outbox_ds_pg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql(
            "select seq, op, table_name, payload_json from outbox_ds_pg"
        ).collect()
        assert sorted(row.seq for row in first) == list(range(1, 7))
        assert {row.op for row in first} == {"INSERT"}
        assert all(row.table_name == "notes" for row in first)
        assert first[0].payload_json.startswith("{")

        r.sql("UPDATE notes SET note = 'redo' WHERE id = 2;")
        q.processAllAvailable()
        rows = spark.sql(
            "select seq, op, previous_json from outbox_ds_pg order by seq"
        ).collect()
        assert len(rows) == 7
        assert rows[-1].op == "UPDATE" and rows[-1].previous_json
    finally:
        q.stop()


def test_pg_stream_fenced_offsets_under_open_txn(spark, pg, tmp_path):
    """The checkpointed offset must never pass a seq an open writer
    could still commit below: with writer A holding seq N open while B
    commits N+1, the query sees NOTHING until A resolves, then both —
    in seq order, exactly once (the r7 loss scenario, engine-level)."""
    from pqstream_spark.sources.outbox_datasource import OutboxDataSource
    from tests.test_outbox_pg import TxnSession

    r = _fresh_db(pg, "ds_fence")
    spark.dataSource.register(OutboxDataSource)
    stream = (
        spark.readStream.format("pqstream_outbox")
        .option("url", f"postgres:{pg.conninfo('ds_fence')}")
        .option("fenceWait", "0.3")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("outbox_ds_fence")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    a = TxnSession(pg.conninfo("ds_fence"))
    try:
        q.processAllAvailable()
        a.run("BEGIN;\nINSERT INTO notes VALUES (default, default, 'A');")
        r.sql("INSERT INTO notes VALUES (default, default, 'B');")
        q.processAllAvailable()
        held = spark.sql("select seq from outbox_ds_fence").collect()
        assert held == [], (
            f"offset passed an open transaction: {[x.seq for x in held]}"
        )
        a.run("COMMIT;")
        q.processAllAvailable()
        rows = spark.sql(
            "select seq, payload_json from outbox_ds_fence order by seq"
        ).collect()
        assert [row.seq for row in rows] == [1, 2]
        assert '"note":"A"' in rows[0].payload_json
        assert '"note":"B"' in rows[1].payload_json
    finally:
        a.close()
        q.stop()


def test_pg_stream_restart_floor_no_redelivery(spark, pg, tmp_path):
    """Review finding: a RESTARTED reader's fresh fence proves nothing
    while a writer is open, and Spark compares offsets by equality
    only — without a durable floor the regressed latestOffset lands in
    the offset log and the next drained batch re-delivers the whole
    sub-checkpoint history. The floor (persisted via commit() into
    pqstream_consumer_offset) must prevent any re-delivery."""
    from pqstream_spark.sources.outbox_datasource import OutboxDataSource
    from tests.test_outbox_pg import TxnSession

    r = _fresh_db(pg, "ds_floor")
    conninfo = pg.conninfo("ds_floor")
    spark.dataSource.register(OutboxDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_query():
        return (
            spark.readStream.format("pqstream_outbox")
            .option("url", f"postgres:{conninfo}")
            .option("fenceWait", "0.3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    r.sql(
        "INSERT INTO notes SELECT g, now(), 'f' || g "
        "FROM generate_series(1, 10) g;"
    )
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _sink_seqs(spark, out) == list(range(1, 11))

    # restart WITH an open writer claiming the next seq: the fresh
    # fence cannot prove anything — the floor must hold the reported
    # offset at the committed end, not let it crash to zero
    a = TxnSession(conninfo)
    q = run_query()
    try:
        a.run("BEGIN;\nINSERT INTO notes VALUES (default, default, 'open');")
        q.processAllAvailable()
        assert _sink_seqs(spark, out) == list(range(1, 11)), (
            "restart under an open writer re-delivered or lost rows"
        )
        a.run("COMMIT;")
        q.processAllAvailable()
        assert _sink_seqs(spark, out) == list(range(1, 12)), (
            "the open writer's row must arrive exactly once after commit"
        )
    finally:
        a.close()
        q.stop()


def test_pg_batch_read_backfill_fenced(spark, pg, tmp_path):
    """Batch form on postgres: the default untilSeq is the FENCED safe
    ceiling, so a backfill boundary is FINAL — a follow-up stream from
    that boundary misses nothing committed later with a lower seq.
    A fresh reader has no fence history, so a transaction that stays
    open across the whole fenceWait window yields the conservative
    EMPTY scan (it cannot prove any ceiling final); an explicit
    untilSeq overrides when the caller owns the boundary risk; once
    the writer resolves, the full window reads."""
    from pqstream_spark.sources.outbox_datasource import OutboxDataSource
    from tests.test_outbox_pg import TxnSession

    r = _fresh_db(pg, "ds_batch")
    spark.dataSource.register(OutboxDataSource)
    r.sql(
        "INSERT INTO notes SELECT g, now(), 'b' || g "
        "FROM generate_series(1, 9) g;"
    )
    a = TxnSession(pg.conninfo("ds_batch"))
    try:
        a.run("BEGIN;\nINSERT INTO notes VALUES (default, default, 'open');")
        r.sql("INSERT INTO notes VALUES (default, default, 'later');")
        df = (
            spark.read.format("pqstream_outbox")
            .option("url", f"postgres:{pg.conninfo('ds_batch')}")
            .option("fenceWait", "0.3")
            .option("numPartitions", "3")
            .load()
        )
        # a fresh fence cannot prove ANY ceiling final while a writer
        # holds an unresolved claim — conservative empty, never wrong
        assert df.collect() == []
        # explicit untilSeq: caller-owned boundary, reads the window
        explicit = (
            spark.read.format("pqstream_outbox")
            .option("url", f"postgres:{pg.conninfo('ds_batch')}")
            .option("untilSeq", "9")
            .load()
        )
        assert sorted(x["seq"] for x in explicit.collect()) == list(range(1, 10))
        a.run("COMMIT;")
    finally:
        a.close()
    # after the open txn resolves, the full window is readable and the
    # default (fenced) boundary includes both late rows
    df2 = (
        spark.read.format("pqstream_outbox")
        .option("url", f"postgres:{pg.conninfo('ds_batch')}")
        .load()
    )
    assert sorted(x["seq"] for x in df2.collect()) == list(range(1, 12))


_RUNNER = """
import sys
conninfo, ckpt, out, mode = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("outbox-ds-crash").getOrCreate())
from pqstream_spark.sources.outbox_datasource import OutboxDataSource
spark.dataSource.register(OutboxDataSource)
q = (spark.readStream.format("pqstream_outbox")
     .option("url", "postgres:" + conninfo)
     .option("fenceWait", "0.5")
     .load()
     .writeStream.format("parquet")
     .option("path", out)
     .option("checkpointLocation", ckpt)
     .trigger(processingTime="300 milliseconds")
     .start())
if mode == "drain":
    q.processAllAvailable()
    q.stop()
    spark.stop()
else:
    print("RUNNER_STARTED", flush=True)
    q.awaitTermination()
"""


def _sink_seqs(spark, out_dir):
    if not os.path.isdir(out_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        return []
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        df = spark.read.parquet(out_dir)
        return sorted(r.seq for r in df.select("seq").collect())
    except AnalysisException:
        # files exist but the sink's _spark_metadata has no committed
        # batch yet (we may be polling mid-first-commit, or right
        # after the SIGKILL) — same as "nothing durably written"
        return []


def test_pg_stream_sigkill_checkpoint_recovery(spark, pg, tmp_path):
    """SIGKILL the whole streaming-query process mid-stream (mirroring
    the poller-level test_daemon_sigkill_crash_recovery), restart on
    the same checkpoint: the file sink's exactly-once log + the
    checkpointed fenced offsets deliver every captured write exactly
    once, including rows that arrived while the query was dead."""
    r = _fresh_db(pg, "ds_crash")
    conninfo = pg.conninfo("ds_crash")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    script = str(tmp_path / "runner.py")
    with open(script, "w") as f:
        f.write(_RUNNER.format(repo=REPO))
    r.sql(
        "INSERT INTO notes SELECT g, now(), 'pre' || g "
        "FROM generate_series(1, 20) g;"
    )
    log = open(str(tmp_path / "runner.log"), "ab")
    proc = subprocess.Popen(
        [sys.executable, script, conninfo, ckpt, out, "run"],
        cwd=REPO, stdout=log, stderr=log,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if len(_sink_seqs(spark, out)) >= 20:
                break
            if proc.poll() is not None:
                raise AssertionError("runner died before first drain")
            time.sleep(0.5)
        else:
            raise AssertionError("timed out waiting for first 20 rows")
    finally:
        proc.kill()  # SIGKILL — no stop(), no cleanup
        proc.wait(timeout=30)

    # rows arriving while the query is dead
    r.sql(
        "INSERT INTO notes SELECT g, now(), 'down' || g "
        "FROM generate_series(21, 35) g;"
    )
    rc = subprocess.run(
        [sys.executable, script, conninfo, ckpt, out, "drain"],
        cwd=REPO, stdout=log, stderr=log, timeout=300,
    ).returncode
    log.close()
    assert rc == 0
    seqs = _sink_seqs(spark, out)
    assert seqs == list(range(1, 36)), (
        f"lost or duplicated after SIGKILL restart: {seqs}"
    )


def test_pg_reportfloor_never_enables_compaction(pg):
    """The report floor runs AHEAD of the query checkpoint (report →
    checkpoint write is a crash window), so it must never let compact()
    prune rows the stream has not durably finished: the floor row is
    `#reportfloor`-suffixed and EXCLUDED from the retention MIN, while
    the plain consumer row — registered at 0 on first connect, advanced
    only in commit() — holds retention."""
    from pqstream_spark.sources.outbox import OUTBOX_TABLE
    from pqstream_spark.sources.outbox_datasource import OutboxStreamReader
    from pqstream_spark.sources.outbox_pg import PgOutboxPoller, PsqlRunner

    r = _fresh_db(pg, "ds_retention")
    conninfo = pg.conninfo("ds_retention")
    r.sql(
        "INSERT INTO notes SELECT g, now(), 'r' || g "
        "FROM generate_series(1, 8) g;"
    )

    reader = OutboxStreamReader(
        {"url": f"postgres:{conninfo}", "fencewait": "0.5"}
    )
    assert int(reader.latestOffset()["seq"]) == 8  # floor now persisted

    runner = PsqlRunner(conninfo)
    maint = PgOutboxPoller(runner)  # maintenance handle, no consumer row

    def remaining():
        return int(runner.scalar(f"SELECT count(*) FROM {OUTBOX_TABLE}"))

    # crash window: floor=8 written, query checkpoint NOT — compaction
    # must prune nothing (delivered row still 0)
    assert maint.compact() == 0 and remaining() == 8

    reader.commit({"seq": 8})
    assert maint.compact() == 8 and remaining() == 0

    # floor ahead again: two new rows reported but not committed
    r.sql("INSERT INTO notes SELECT 100 + g, now(), 'x' || g "
          "FROM generate_series(1, 2) g;")
    assert int(reader.latestOffset()["seq"]) == 10
    assert maint.compact() == 0 and remaining() == 2, (
        "report floor leaked into the retention low-water mark"
    )
    reader.commit({"seq": 10})
    assert maint.compact() == 2 and remaining() == 0


def test_pg_consumer_key_collision_guard(pg):
    """VERDICT r8 #3: two LIVE queries sharing one consumer key share
    the retention row and report floor — the slower query's replay
    window can be compacted away. checkpointLocation never reaches
    DataSource.options (sink option), so no query-stable default
    exists; instead the lease guard fails the collision loudly on the
    second alternating offset write, while same-key restarts (one
    takeover stamp) and distinct keys stay green."""
    from pqstream_spark.sources.outbox_datasource import OutboxStreamReader

    r = _fresh_db(pg, "ds_collide")
    opts = {"url": f"postgres:{pg.conninfo('ds_collide')}",
            "fencewait": "0.5"}

    r.sql("INSERT INTO notes SELECT g, now(), 'c' || g "
          "FROM generate_series(1, 4) g;")
    a = OutboxStreamReader(dict(opts))
    assert int(a.latestOffset()["seq"]) == 4
    b = OutboxStreamReader(dict(opts))  # takeover stamp: tolerated once
    with pytest.raises(RuntimeError, match="distinct"):
        for i in range(5, 9):
            r.sql(f"INSERT INTO notes VALUES ({i}, now(), 'c{i}');")
            a.latestOffset()  # floor advance re-stamps a's nonce
            b.latestOffset()  # alternation → second foreign stamp trips
    # restart with the same key (predecessors dead): green
    c = OutboxStreamReader(dict(opts))
    r.sql("INSERT INTO notes VALUES (20, now(), 'c20');")
    c.latestOffset()
    # distinct keys: two live queries coexist indefinitely
    d = OutboxStreamReader(dict(opts) | {"consumer": "q2"})
    for i in range(21, 25):
        r.sql(f"INSERT INTO notes VALUES ({i}, now(), 'c{i}');")
        c.latestOffset()
        d.latestOffset()


def test_ds_randomized_multi_writer_stress_with_restart(spark, pg, tmp_path):
    """The poller's randomized 4-writer stress (the test that caught
    the xmax-keyed fence bug), re-run through the ENGINE path:
    readStream.format("pqstream_outbox") draining under shuffled
    BEGIN/INSERT/hold/COMMIT/ROLLBACK interleavings, with a full
    query stop/restart mid-stress — writers possibly open across the
    restart — so the fenced offsets, the durable report floor and the
    checkpoint replay are all exercised by the same adversarial
    schedule. Every committed row lands in the sink exactly once;
    rolled-back rows never appear. Deterministic seed."""
    import random
    import time as _time

    from pqstream_spark.sources.outbox_datasource import OutboxDataSource
    from tests.test_outbox_pg import TxnSession

    rng = random.Random(0xD57E55)
    r = _fresh_db(pg, "ds_stress")
    conninfo = pg.conninfo("ds_stress")
    spark.dataSource.register(OutboxDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("pqstream_outbox")
            .option("url", f"postgres:{conninfo}")
            .option("fenceWait", "0.2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def sink_ids() -> list[int]:
        import os as _os

        if not _os.path.isdir(out) or not any(
            f.endswith(".parquet") for f in _os.listdir(out)
        ):
            return []
        return [int(row["id"]) for row in
                spark.read.parquet(out).select("id").collect()]

    writers = [TxnSession(conninfo) for _ in range(4)]
    committed: set[int] = set()
    aborted: set[int] = set()
    open_ids: dict[int, list[int]] = {i: [] for i in range(4)}
    next_id = 0
    q = start()
    try:
        for step in range(40):
            w = rng.randrange(4)
            action = rng.random()
            sess = writers[w]
            if not open_ids[w] and action < 0.6:
                sess.run("BEGIN;")
                for _ in range(rng.randrange(1, 3)):
                    next_id += 1
                    sess.run(f"INSERT INTO notes VALUES "
                             f"({next_id}, default, 'w{w}');")
                    open_ids[w].append(next_id)
            elif open_ids[w]:
                if action < 0.85:
                    sess.run("COMMIT;")
                    committed.update(open_ids[w])
                else:
                    sess.run("ROLLBACK;")
                    aborted.update(open_ids[w])
                open_ids[w] = []
            if step % 8 == 7:
                q.processAllAvailable()
            if step == 19:
                # restart mid-stress — writers may hold open txns
                # straddling the restart; the report floor must keep
                # the restarted reader's offsets monotone
                q.stop()
                q = start()
    finally:
        for w, sess in enumerate(writers):
            if open_ids[w]:
                sess.run("COMMIT;")
                committed.update(open_ids[w])
            sess.close()
    try:
        # the fence finalizes a ceiling only once every claimer
        # resolved — poll until the sink converges on the committed set
        for _ in range(30):
            q.processAllAvailable()
            if sorted(sink_ids()) == sorted(committed):
                break
            _time.sleep(0.3)
    finally:
        q.stop()
    got = sink_ids()
    assert sorted(got) == sorted(committed), (
        f"sink diverged: missing={sorted(committed - set(got))[:5]} "
        f"extra={sorted(set(got) - committed)[:5]} "
        f"dups={len(got) - len(set(got))}"
    )
    assert not (set(got) & aborted), "rolled-back rows leaked to the sink"


def test_cli_lag_on_live_pg(pg, capsys):
    """--lag against live PostgreSQL: reads offsets and the outbox
    ceiling read-only (to_regclass guards — probing a database without
    the capture installed reports empty instead of creating tables)."""
    from pqstream_spark.__main__ import main
    from pqstream_spark.sources.outbox_pg import PgOutboxPoller, PsqlRunner

    r = _fresh_db(pg, "lag_db")
    conninfo = pg.conninfo("lag_db")
    r.sql("INSERT INTO notes SELECT g, now(), 'l' || g "
          "FROM generate_series(1, 7) g;")
    PgOutboxPoller.open_durable(PsqlRunner(conninfo), consumer="worker")

    import json as _json
    rc = main(["--connect", f"postgres:{conninfo}", "--lag"])
    assert rc == 0
    lines = [_json.loads(l) for l in
             capsys.readouterr().out.splitlines() if l.strip()]
    by = {l["consumer"]: l for l in lines if "consumer" in l}
    assert by["worker"] == {"consumer": "worker", "kind": "consumer",
                            "last_seq": 0, "max_seq": 7, "lag": 7}
    assert [l for l in lines if l.get("summary")][0]["max_seq"] == 7

    # a database with no capture installed: read-only empty report
    pg.createdb("lag_empty")
    rc = main(["--connect", f"postgres:{pg.conninfo('lag_empty')}", "--lag"])
    assert rc == 0
    lines = [_json.loads(l) for l in
             capsys.readouterr().out.splitlines() if l.strip()]
    assert lines == [{"summary": True, "max_seq": 0, "consumers": 0}]

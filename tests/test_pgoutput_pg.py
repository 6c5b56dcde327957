"""pgoutput capture backend on LIVE PostgreSQL (round 9, second
logical plugin): the replication-grade binary protocol with
SERVER-SIDE publication filtering, riding the test_decoding poller's
inherited peek/advance machinery — parity-pinned envelope for envelope."""

from __future__ import annotations

import json

import pytest

from pqstream_spark.sources.logical_pg import (
    PgLogicalCaptureManager,
    PgLogicalPoller,
)
from pqstream_spark.sources.outbox_pg import (
    EphemeralPostgres,
    PsqlRunner,
    pg_available,
)
from pqstream_spark.sources.pgoutput_pg import (
    PgOutputCaptureManager,
    PgOutputPoller,
)

pytestmark = pytest.mark.skipif(
    not pg_available(), reason="PostgreSQL server binaries not installed"
)

NOTES_DDL = ("CREATE TABLE notes (id serial PRIMARY KEY, "
             "created_at timestamp, note text, val float8, ok boolean)")


@pytest.fixture(scope="module")
def pg():
    srv = EphemeralPostgres.temp("pq_pgoutput_")
    srv.initdb()
    srv.start()
    yield srv
    srv.destroy()


def _fresh(pg, name):
    r = pg.createdb(name)
    r.sql(NOTES_DDL + ";")
    mgr = PgOutputCaptureManager(
        r, slot=f"po_{name}", publication=f"pub_{name}",
        table_regexp="notes")
    assert mgr.install() == ["notes"]
    return r, mgr


def test_pgoutput_golden_envelopes(pg, spark):
    """INSERT/UPDATE/DELETE/TRUNCATE through the binary protocol →
    the standard envelope: typed JSON (bare numerics, true/false
    booleans, ISO timestamps, nulls kept in OLD tuples too), dense
    commit-ordered seqs, commit timestamps."""
    r, mgr = _fresh(pg, "golden")
    r.sql(
        "INSERT INTO notes VALUES (default, '2020-01-02T03:04:05', "
        "E'qu''ote, comma', 1.5, true);"
        "UPDATE notes SET note = NULL, ok = false WHERE id = 1;"
        "DELETE FROM notes WHERE id = 1;"
        "TRUNCATE notes;"
    )
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    assert [row.op for row in rows] == [
        "INSERT", "UPDATE", "DELETE", "TRUNCATE"]
    assert [row.seq for row in rows] == [1, 2, 3, 4]
    ins, upd, dele, trunc = rows
    assert json.loads(ins.payload_json) == {
        "id": 1, "created_at": "2020-01-02T03:04:05",
        "note": "qu'ote, comma", "val": 1.5, "ok": True}
    assert ins.id == "1"
    assert json.loads(upd.payload_json)["note"] is None
    assert json.loads(upd.payload_json)["ok"] is False
    # fidelity gain over test_decoding: previous keeps non-null OLD row
    assert json.loads(upd.previous_json)["note"] == "qu'ote, comma"
    # DELETE payload = full OLD row INCLUDING the null column
    assert json.loads(dele.payload_json) == {
        "id": 1, "created_at": "2020-01-02T03:04:05",
        "note": None, "val": 1.5, "ok": False}
    assert (trunc.table_name, trunc.payload_json) == ("notes", None)
    assert all(row.ts is not None for row in rows)
    assert p.read_batch(spark).count() == 0


def test_pgoutput_parity_with_test_decoding(pg, spark):
    """The SAME writes through both plugins (separate slots) produce
    identical envelopes after normalizing test_decoding's old-tuple
    null omission — op, id, seq order, payload, previous."""
    r, mgr = _fresh(pg, "parity")
    PgLogicalCaptureManager(
        r, slot="td_parity", table_regexp="notes").install()
    r.sql(
        "INSERT INTO notes VALUES (default, '2021-05-06T07:08:09', "
        "'x', NULL, true);"
        "UPDATE notes SET note = 'y' WHERE id = 1;"
        "DELETE FROM notes WHERE id = 1;"
        "TRUNCATE notes;"
    )
    po = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="po", publication=mgr.publication)
    td = PgLogicalPoller.open_durable(r, slot="td_parity", consumer="td")
    po_rows = sorted(po.read_batch(spark).collect(), key=lambda x: x.seq)
    td_rows = sorted(td.read_batch(spark).collect(), key=lambda x: x.seq)
    assert len(po_rows) == len(td_rows) == 4

    def norm(row):
        def load(s):
            if s is None:
                return None
            return {k: v for k, v in json.loads(s).items() if v is not None}
        return (row.seq, row.op, row.id, load(row.payload_json),
                load(row.previous_json))

    assert [norm(a) for a in po_rows] == [norm(b) for b in td_rows]


def test_pgoutput_server_side_filtering(pg, spark):
    """The publication scopes decoding ON THE SERVER: writes to an
    unpublished table (and the engine's own offset-table bookkeeping)
    never reach the wire — the feedback problem the test_decoding
    parser filters client-side simply does not exist here."""
    r, mgr = _fresh(pg, "filter")
    r.sql("CREATE TABLE unpublished (id int, junk text);")
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    r.sql("INSERT INTO unpublished SELECT g, 'j' || g "
          "FROM generate_series(1, 50) g;")
    r.sql("INSERT INTO notes VALUES (default, now(), 'mine', 1, true);")
    rows = p.read_batch(spark).collect()
    p.advance()
    assert [(row.table_name, row.id) for row in rows] == [("notes", "1")]
    # advance()'s own offset writes breed no decodable changes: the
    # next poll is empty (no escalation churn, no feedback)
    assert p.read_batch(spark).count() == 0


def test_pgoutput_replay_and_small_window(pg, spark):
    """Inherited machinery re-proven on the binary plugin: a crash
    between sink and advance replays byte-identical seqs, and a
    restart with a tiny peek window escalates to cover the anchor."""
    r, mgr = _fresh(pg, "replay")
    r.sql(";\n".join(
        f"INSERT INTO notes VALUES ({i}, now(), 'w{i}', NULL, true)"
        for i in range(1, 21)) + ";")
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    first = sorted((row.seq, row.id) for row in p.read_batch(spark).collect())
    assert first == [(i, str(i)) for i in range(1, 21)]
    # torn advance: offset rows land, slot stays back — a restarted
    # poller with a TINY window must escalate to the stored anchor and
    # renumber the replay byte-identically
    lsn_text, lsn_big, end_seq = p._pending
    from pqstream_spark.sources.outbox_pg import PG_OFFSET_TABLE, _quote_lit
    r.sql(
        f"UPDATE {PG_OFFSET_TABLE} SET last_seq = {end_seq} "
        f"WHERE consumer = {_quote_lit(p._seq_key)};"
        f"UPDATE {PG_OFFSET_TABLE} SET last_seq = {lsn_big} "
        f"WHERE consumer = {_quote_lit(p._lsn_key)};"
    )
    p2 = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication,
        max_changes=4)
    replay = sorted(
        (row.seq, row.id) for row in p2.read_batch(spark).collect())
    assert replay == first
    p2.advance()
    r.sql("INSERT INTO notes VALUES (99, now(), 'new', NULL, false);")
    nxt = [(row.seq, row.id) for row in p2.read_batch(spark).collect()]
    assert nxt == [(21, "99")]


def test_pgoutput_multi_table_truncate(pg, spark):
    """TRUNCATE a, b arrives as ONE binary message carrying both
    relation ids — one delete-all envelope per table."""
    r, _ = _fresh(pg, "mtrunc")
    r.sql("CREATE TABLE extras (id int, note text);")
    mgr = PgOutputCaptureManager(
        r, slot="po_mtrunc2", publication="pub_mtrunc2",
        table_regexp="notes|extras")
    assert sorted(mgr.install()) == ["extras", "notes"]
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication,
        table_regexp="notes|extras")
    r.sql("INSERT INTO notes VALUES (1, now(), 'n', NULL, true);"
          "INSERT INTO extras VALUES (2, 'e');"
          "TRUNCATE notes, extras;")
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    assert [(row.table_name, row.op) for row in rows] == [
        ("notes", "INSERT"), ("extras", "INSERT"),
        ("notes", "TRUNCATE"), ("extras", "TRUNCATE")]


def test_pgoutput_lifecycle(pg):
    r, mgr = _fresh(pg, "lifecycle")
    assert mgr.install() == ["notes"]  # idempotent
    assert mgr.remove() == ["notes"]
    assert r.scalar(
        "SELECT count(*) FROM pg_publication "
        f"WHERE pubname = '{mgr.publication}'") == "0"
    assert r.scalar(
        "SELECT count(*) FROM pg_replication_slots "
        f"WHERE slot_name = '{mgr.slot}'") == "0"


def test_daemon_plugin_pgoutput_once(pg, tmp_path):
    """`pqsd --transport logical --plugin pgoutput --once`: publication
    install, incremental drains, durable resume — the full daemon
    pipeline over the binary protocol."""
    import glob
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pg.createdb("po_daemon").sql(NOTES_DDL + ";")
    conninfo = pg.conninfo("po_daemon")
    r = PsqlRunner(conninfo)

    out = str(tmp_path / "out")
    os.makedirs(out)
    argv = [sys.executable, "-m", "pqstream_spark",
            "--connect", f"postgres:{conninfo}", "--transport", "logical",
            "--plugin", "pgoutput", "--slot", "po_daemon",
            "--publication", "pub_daemon", "--tables", "notes",
            "--out", out, "--once"]
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}

    def run():
        from pqstream_spark.__main__ import main as _main

        return _main(argv[3:])

    def ids():
        got = []
        for f in sorted(glob.glob(out + "/*.jsonl")):
            with open(f) as fh:
                got.extend(_json.loads(l)["payload"]["id"]
                           for l in fh if l.strip())
        return got

    assert run() == 0  # installs publication + slot
    r.sql("INSERT INTO notes VALUES (default, now(), 'a', 1.0, true);"
          "INSERT INTO notes VALUES (default, now(), 'b', NULL, false);")
    assert run() == 0
    assert sorted(ids()) == [1, 2]
    assert run() == 0  # idle: nothing new
    assert sorted(ids()) == [1, 2]


def test_pgoutput_through_streaming_datasource(pg, spark, tmp_path):
    """readStream.format('pqstream_logical').option('plugin',
    'pgoutput'): the engine-managed-offset path over the binary
    protocol — live writes, checkpoint restart exactly once, server-
    side filtering intact."""
    from pqstream_spark.sources.logical_datasource import LogicalDataSource

    r, mgr = _fresh(pg, "ds")
    r.sql("CREATE TABLE unpublished (id int);")
    spark.dataSource.register(LogicalDataSource)
    conninfo = pg.conninfo("ds")
    ckpt = str(tmp_path / "ckpt")

    def run_query():
        stream = (
            spark.readStream.format("pqstream_logical")
            .option("url", f"postgres:{conninfo}")
            .option("plugin", "pgoutput")
            .option("slot", mgr.slot)
            .option("publication", mgr.publication)
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .start()
        )

    r.sql("INSERT INTO notes VALUES (default, now(), 'a', 1.0, true);"
          "INSERT INTO unpublished VALUES (99);")
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    r.sql("UPDATE notes SET note = 'b' WHERE id = 1;")  # while down
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = sorted(out.collect(), key=lambda x: x.seq)
    assert [(row.seq, row.op, row.table_name) for row in rows] == [
        (1, "INSERT", "notes"), (2, "UPDATE", "notes")]
    assert json.loads(rows[1].previous_json)["note"] == "a"


# -- unchanged-TOAST payload fidelity (round-10 lead fix, VERDICT r9 #1) -----


def test_pgoutput_unchanged_toast_matrix(pg, spark):
    """TupleData kind 'u' (unchanged TOAST, value not sent) used to be
    silently mapped to None — an UPDATE leaving a >2 KB body untouched
    delivered {"body": null}. Fixed by backfilling from the same
    message's FULL-identity old tuple. Matrix: INSERT / metadata-only
    UPDATE / body UPDATE / DELETE, pinned payload == previous ==
    original."""
    from tests.test_logical_pg import DOCS_DDL, _toast_text

    r = pg.createdb("po_toast")
    r.sql(DOCS_DDL)
    mgr = PgOutputCaptureManager(
        r, slot="po_toast", publication="pub_toast", table_regexp="docs")
    assert mgr.install() == ["docs"]
    body0 = _toast_text("po-v0")
    body1 = _toast_text("po-v1")
    r.sql(f"INSERT INTO docs VALUES (1, 'm0', '{body0}');"
          f"UPDATE docs SET meta = 'm1' WHERE id = 1;"
          f"UPDATE docs SET body = '{body1}' WHERE id = 1;"
          f"DELETE FROM docs WHERE id = 1;")
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    ins, upd_meta, upd_body, dele = rows
    assert json.loads(ins.payload_json)["body"] == body0
    pm = json.loads(upd_meta.payload_json)
    assert pm["meta"] == "m1"
    assert pm["body"] == body0, "unchanged-TOAST body nulled in payload"
    assert json.loads(upd_meta.previous_json)["body"] == body0
    assert json.loads(upd_body.payload_json)["body"] == body1
    assert json.loads(upd_body.previous_json)["body"] == body0
    assert json.loads(dele.payload_json)["body"] == body1


def test_pgoutput_unchanged_toast_non_full_identity(pg, spark):
    """With REPLICA IDENTITY DEFAULT there is no 'O' old tuple to
    backfill from ('K' key-only tuples null the non-key columns and
    must not be used): the inherited poller P3-re-selects the live
    row; a row already deleted degrades the payload to None."""
    from tests.test_logical_pg import DOCS_DDL, _toast_text

    r = pg.createdb("po_toastnf")
    r.sql(DOCS_DDL)
    mgr = PgOutputCaptureManager(
        r, slot="po_toastnf", publication="pub_toastnf",
        table_regexp="docs")
    mgr.install()
    r.sql("ALTER TABLE docs REPLICA IDENTITY DEFAULT;")
    body = _toast_text("po-nf")
    r.sql(f"INSERT INTO docs VALUES (1, 'm0', '{body}');"
          "UPDATE docs SET meta = 'm1' WHERE id = 1;")
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    upd = rows[1]
    assert json.loads(upd.payload_json)["body"] == body
    assert "\x00" not in upd.payload_json

    r.sql("UPDATE docs SET meta = 'm2' WHERE id = 1;"
          "DELETE FROM docs WHERE id = 1;")
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    upd2 = rows[0]
    assert upd2.op == "UPDATE" and upd2.id == "1"
    assert upd2.payload_json is None


def test_pgoutput_reinstall_keeps_publication_continuous(pg, spark):
    """Re-install on a live slot must never lapse publication
    membership (round-10 hardening): the old DROP-then-CREATE ran as
    two autocommitted statements, and a transaction committing in the
    gap was silently excluded from decode. Now re-install is ALTER
    PUBLICATION ... SET TABLE — pinned by (a) the publication oid
    surviving re-install (no drop ever happened) and (b) rows written
    around the re-install all decoding, including the newly added
    table."""
    r, mgr = _fresh(pg, "reinstall")
    p = PgOutputPoller.open_durable(
        r, slot=mgr.slot, consumer="c", publication=mgr.publication)
    r.sql("INSERT INTO notes VALUES (1, now(), 'before', NULL, true);")
    oid_before = r.scalar(
        "SELECT oid FROM pg_publication WHERE pubname = "
        f"'{mgr.publication}'")
    # re-install mid-stream, widening the captured set
    r.sql("CREATE TABLE extras (id int PRIMARY KEY, note text);")
    mgr2 = PgOutputCaptureManager(
        r, slot=mgr.slot, publication=mgr.publication,
        table_regexp="notes|extras")
    assert sorted(mgr2.install()) == ["extras", "notes"]
    oid_after = r.scalar(
        "SELECT oid FROM pg_publication WHERE pubname = "
        f"'{mgr.publication}'")
    assert oid_before == oid_after, "publication was dropped/recreated"
    r.sql("INSERT INTO notes VALUES (2, now(), 'after', NULL, false);"
          "INSERT INTO extras VALUES (3, 'extra-row');")
    rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
    p.advance()
    assert [(row.table_name, row.id) for row in rows] == [
        ("notes", "1"), ("notes", "2"), ("extras", "3")]


# -- protocol v2 streamed in-progress transactions (round 10) ----------------


def test_pgoutput_streamed_transactions(spark):
    """proto_version 2 + streaming=on: a transaction larger than
    logical_decoding_work_mem is emitted in Stream Start/Stop segments
    WHILE the server decodes (bounded server memory, no reorder-buffer
    spill) and completes at Stream Commit — the poller reassembles it
    into the same txn-atomic batch, a savepoint rollback inside it
    discards exactly the aborted subtransaction's rows, and envelopes
    are identical to a non-streaming slot over the same writes."""
    srv = EphemeralPostgres.temp("pq_postream_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("stream")
        r.sql(NOTES_DDL + ";")
        mgr = PgOutputCaptureManager(
            r, slot="po_stream", publication="pub_stream",
            table_regexp="notes")
        mgr.install()
        # second slot on the same publication, plain proto v1
        r.sql("SELECT pg_create_logical_replication_slot("
              "'po_plain', 'pgoutput');")

        # one large txn with an aborted savepoint inside, plus a small
        # trailing txn
        r.sql("BEGIN;\n"
              "INSERT INTO notes SELECT g, now(), 'big' || g, NULL, true "
              "FROM generate_series(1, 4000) g;\n"
              "SAVEPOINT sp;\n"
              "INSERT INTO notes SELECT 90000 + g, now(), 'poison', "
              "NULL, false FROM generate_series(1, 500) g;\n"
              "ROLLBACK TO sp;\n"
              "INSERT INTO notes VALUES (5000, now(), 'tail', 1.5, true);\n"
              "COMMIT;")
        r.sql("INSERT INTO notes VALUES (6000, now(), 'small', NULL, false);")

        p = PgOutputPoller.open_durable(
            r, slot="po_stream", consumer="c", publication="pub_stream",
            streaming=True)
        rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
        ids = [json.loads(row.payload_json)["id"] for row in rows]
        assert ids == list(range(1, 4001)) + [5000, 6000], (
            f"{len(ids)} rows; poison leaked: "
            f"{[i for i in ids if i >= 90000][:3]}")
        assert [row.seq for row in rows] == list(range(1, 4003))
        # the giant txn is ONE transaction boundary: replay without
        # advance is byte-stable through the streamed path too
        p2 = PgOutputPoller.open_durable(
            r, slot="po_stream", consumer="c", publication="pub_stream",
            streaming=True)
        replay = [(row.seq, row.id) for row in p2.read_batch(spark).collect()]
        assert sorted(replay) == sorted(
            (row.seq, row.id) for row in rows)
        p2.advance()
        assert p2.read_batch(spark).count() == 0

        # envelope parity with the non-streaming protocol
        pp = PgOutputPoller.open_durable(
            r, slot="po_plain", consumer="pp", publication="pub_stream")
        plain = sorted(pp.read_batch(spark).collect(), key=lambda x: x.seq)
        assert [
            (row.seq, row.op, row.id, row.payload_json) for row in plain
        ] == [
            (row.seq, row.op, row.id, row.payload_json) for row in rows
        ]
    finally:
        srv.destroy()


def test_pgoutput_streaming_through_datasource(spark, tmp_path):
    """readStream.format('pqstream_logical') with plugin=pgoutput +
    streaming=true: a work_mem-exceeding transaction arrives through a
    real StreamingQuery as ONE txn-aligned micro-batch."""
    from pqstream_spark.sources.logical_datasource import LogicalDataSource

    srv = EphemeralPostgres.temp("pq_postrds_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("ds")
        r.sql(NOTES_DDL + ";")
        mgr = PgOutputCaptureManager(
            r, slot="po_strds", publication="pub_strds",
            table_regexp="notes")
        mgr.install()
        spark.dataSource.register(LogicalDataSource)
        r.sql("BEGIN;\n"
              "INSERT INTO notes SELECT g, now(), 'v' || g, NULL, true "
              "FROM generate_series(1, 3000) g;\n"
              "COMMIT;")
        stream = (
            spark.readStream.format("pqstream_logical")
            .option("url", f"postgres:{srv.conninfo('ds')}")
            .option("plugin", "pgoutput")
            .option("slot", "po_strds")
            .option("publication", "pub_strds")
            .option("streaming", "true")
            .load()
        )
        batches: list[list[int]] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, ep: batches.append(
                    sorted(row.seq for row in df.collect()))
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        nonempty = [b for b in batches if b]
        assert len(nonempty) == 1 and nonempty[0] == list(range(1, 3001)), (
            f"streamed txn torn or lost: {[len(b) for b in batches]}")
    finally:
        srv.destroy()


def test_pgoutput_interleaved_streams_commit_order(spark):
    """Two concurrent work_mem-exceeding writers: their Stream
    Start/Stop segments INTERLEAVE on the wire; reassembly must keep
    each transaction whole and deliver them in COMMIT order (the
    writer that started first but committed last arrives last)."""
    import tests.test_outbox_pg as ob

    srv = EphemeralPostgres.temp("pq_pointer_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("inter")
        r.sql(NOTES_DDL + ";")
        mgr = PgOutputCaptureManager(
            r, slot="po_inter", publication="pub_inter",
            table_regexp="notes")
        mgr.install()
        conninfo = srv.conninfo("inter")
        a = ob.TxnSession(conninfo)
        b = ob.TxnSession(conninfo)
        try:
            # alternate large chunks so both reorder buffers exceed
            # work_mem and stream interleaved segments
            a.run("BEGIN;")
            b.run("BEGIN;")
            for i in range(4):
                a.run(f"INSERT INTO notes SELECT {i*1000} + g, now(), "
                      f"'a' || g, NULL, true FROM generate_series(1, 900) g;")
                b.run(f"INSERT INTO notes SELECT 100000 + {i*1000} + g, "
                      f"now(), 'b' || g, NULL, false "
                      f"FROM generate_series(1, 900) g;")
            b.run("COMMIT;")  # B commits FIRST though A started first
            a.run("COMMIT;")
        finally:
            a.close()
            b.close()
        p = PgOutputPoller.open_durable(
            r, slot="po_inter", consumer="c", publication="pub_inter",
            streaming=True)
        rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
        p.advance()
        assert len(rows) == 7200
        ids = [json.loads(row.payload_json)["id"] for row in rows]
        # commit order: ALL of B (ids >= 100000) before ALL of A
        assert all(i >= 100000 for i in ids[:3600]), "B's txn not first"
        assert all(i < 100000 for i in ids[3600:]), "A's txn torn/mixed"
    finally:
        srv.destroy()


def test_pgoutput_streamed_txn_unchanged_toast(spark):
    """The round-10 lead fix inside the round-10 streaming path: a
    work_mem-exceeding transaction of metadata-only UPDATEs over
    TOASTed rows — every streamed 'u' column is backfilled from its
    FULL-identity old tuple, bodies byte-intact."""
    from tests.test_logical_pg import DOCS_DDL, _toast_text

    srv = EphemeralPostgres.temp("pq_postoast_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("st")
        r.sql(DOCS_DDL)
        mgr = PgOutputCaptureManager(
            r, slot="po_sttoast", publication="pub_sttoast",
            table_regexp="docs")
        mgr.install()
        bodies = {i: _toast_text(f"st{i}") for i in range(1, 41)}
        r.sql(";\n".join(
            f"INSERT INTO docs VALUES ({i}, 'm0', '{bodies[i]}')"
            for i in bodies) + ";")
        # one streamed txn of metadata-only updates (40 x 8KB old
        # tuples exceed 64kB work_mem)
        r.sql("BEGIN;\nUPDATE docs SET meta = 'm1';\nCOMMIT;")
        p = PgOutputPoller.open_durable(
            r, slot="po_sttoast", consumer="c", publication="pub_sttoast",
            streaming=True)
        rows = sorted(p.read_batch(spark).collect(), key=lambda x: x.seq)
        p.advance()
        upds = [row for row in rows if row.op == "UPDATE"]
        assert len(upds) == 40
        for row in upds:
            obj = json.loads(row.payload_json)
            assert obj["meta"] == "m1"
            assert obj["body"] == bodies[obj["id"]], (
                f"streamed unchanged-TOAST corrupted for id {obj['id']}")
            assert json.loads(row.previous_json)["body"] == bodies[obj["id"]]
    finally:
        srv.destroy()


def test_pgoutput_streaming_randomized_multi_writer_stress(spark):
    """The randomized 4-writer stress (the harness that caught the
    round-8 fence bug) on the STREAMED pgoutput path with a 64kB
    decode budget: random interleave of large-chunk writers, commits
    and rollbacks — every committed row delivered exactly once, in
    dense commit-ordered seqs, rollbacks never delivered, transactions
    never torn across batches."""
    import random

    import tests.test_outbox_pg as ob

    rng = random.Random(0xBEEF)
    srv = EphemeralPostgres.temp("pq_postress_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("stress")
        r.sql(NOTES_DDL + ";")
        PgOutputCaptureManager(
            r, slot="po_stress", publication="pub_stress",
            table_regexp="notes").install()
        conninfo = srv.conninfo("stress")
        writers = [ob.TxnSession(conninfo) for _ in range(4)]
        p = PgOutputPoller.open_durable(
            r, slot="po_stress", consumer="c", publication="pub_stress",
            streaming=True, max_changes=700)
        delivered: list[tuple[int, int]] = []
        batch_of: dict[int, int] = {}  # row id -> batch index
        txn_of: dict[int, int] = {}    # row id -> writer txn number
        committed: set[int] = set()
        aborted: set[int] = set()
        next_id = 0
        txn_no = 0
        open_ids: dict[int, list[int]] = {i: [] for i in range(4)}
        open_txn: dict[int, int] = {}
        batches = 0

        def drain() -> int:
            nonlocal batches
            rows = p.read_batch(spark).collect()
            for row in rows:
                rid = json.loads(row.payload_json)["id"]
                delivered.append((row.seq, rid))
                batch_of[rid] = batches
            p.advance()
            batches += 1
            return len(rows)

        try:
            for step in range(40):
                w = rng.randrange(4)
                action = rng.random()
                sess = writers[w]
                if not open_ids[w] and action < 0.6:
                    txn_no += 1
                    open_txn[w] = txn_no
                    sess.run("BEGIN;")
                    # large chunks: every txn exceeds the 64kB budget
                    # and streams
                    for _ in range(rng.randrange(1, 3)):
                        base = next_id
                        n = rng.randrange(200, 500)
                        next_id += n
                        sess.run(
                            f"INSERT INTO notes SELECT {base} + g, now(), "
                            f"repeat('x', 300), NULL, true "
                            f"FROM generate_series(1, {n}) g;")
                        ids = list(range(base + 1, base + n + 1))
                        open_ids[w].extend(ids)
                        for i in ids:
                            txn_of[i] = open_txn[w]
                elif open_ids[w]:
                    if action < 0.85:
                        sess.run("COMMIT;")
                        committed.update(open_ids[w])
                    else:
                        sess.run("ROLLBACK;")
                        aborted.update(open_ids[w])
                    open_ids[w] = []
                if step % 5 == 4:
                    drain()
        finally:
            for w, sess in enumerate(writers):
                if open_ids[w]:
                    sess.run("COMMIT;")
                    committed.update(open_ids[w])
                sess.close()
        empty = 0
        while empty < 2:
            empty = empty + 1 if drain() == 0 else 0
        got_ids = [i for _, i in delivered]
        assert sorted(got_ids) == sorted(committed), "loss or duplication"
        assert not (set(got_ids) & aborted), "rolled-back rows delivered"
        seqs = [s for s, _ in delivered]
        assert seqs == list(range(1, len(seqs) + 1)), "seqs not dense/ordered"
        # txn atomicity across micro-batches: every committed txn's
        # rows landed in ONE batch
        by_txn: dict[int, set] = {}
        for rid in got_ids:
            by_txn.setdefault(txn_of[rid], set()).add(batch_of[rid])
        torn = {t: b for t, b in by_txn.items() if len(b) != 1}
        assert not torn, f"transactions torn across batches: {torn}"
    finally:
        srv.destroy()


# -- round 11: pgoutput giant-transaction binary spool (VERDICT r10 #3) -----


def test_scan_pgoutput_frames_reframes_binary_stream(pg):
    """Unit-level pin of the structural reframing: pg_recvlogical
    separates binary pgoutput messages with '\\n', which is ambiguous
    (message bodies can contain 0x0A — any text value with a newline).
    The scanner must recover EXACTLY the messages the SQL peek
    interface returns for the same WAL window."""
    from pqstream_spark.sources.logical_pg import recv_changes_walsender
    from pqstream_spark.sources.pgoutput_pg import scan_pgoutput_frames
    import subprocess

    r = pg.createdb("po_scan")
    r.sql(NOTES_DDL + ";")
    mgr = PgOutputCaptureManager(
        r, slot="po_scan", publication="pub_scan", table_regexp="notes")
    mgr.install()
    # second slot for the pg_recvlogical copy of the same window
    r.sql("SELECT pg_create_logical_replication_slot("
          "'po_scan2', 'pgoutput');")
    r.sql("INSERT INTO notes VALUES "
          "(1, now(), E'line1\\nCOMMIT 9\\n\\ntail''q', 1.5, true), "
          "(2, now(), 'plain', NULL, false);"
          "UPDATE notes SET note = E'x\\ny' WHERE id = 1;"
          "DELETE FROM notes WHERE id = 2;")
    r.sql("SET synchronous_commit = on;\n"
          "SELECT pg_logical_emit_message(true, 'pqstream_sync', '');")
    endpos = r.scalar("SELECT pg_current_wal_lsn()::text")
    p = PgOutputPoller.open_durable(
        r, slot="po_scan", consumer="c", publication="pub_scan")
    peeked = [row["data"] for row in p._peek(100000, barrier=False)]
    proc = subprocess.run(
        ["pg_recvlogical", "-d", r.conninfo, "--slot", "po_scan2",
         "--start", "--endpos", endpos, "-f", "-", "--no-loop",
         "-o", "proto_version=1", "-o", "publication_names=pub_scan"],
        capture_output=True, timeout=60, cwd="/tmp")
    assert proc.returncode == 0, proc.stderr
    frames = [f.hex() for f in scan_pgoutput_frames(proc.stdout)]
    assert frames == peeked, (
        f"reframed {len(frames)} vs peeked {len(peeked)} messages")


def test_pgoutput_giant_txn_4x_max_peek_spool_drain(spark, tmp_path):
    """The VERDICT r10 #3 done-criterion: a streamed transaction 4x
    max_peek drains txn-atomically through --spill-dir on a pgoutput
    slot — without switching plugins. Multi-line values survive the
    binary spool byte-exactly (the framing hazard the structural
    scanner exists for), and the stream continues on the peek path."""
    from pqstream_spark.sources.logical_pg import GiantTxnError

    srv = EphemeralPostgres.temp("pq_pospill_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("spill")
        r.sql(NOTES_DDL + ";")
        PgOutputCaptureManager(
            r, slot="po_spill", publication="pub_spill",
            table_regexp="notes").install()
        r.sql("BEGIN;\n"
              "INSERT INTO notes SELECT g, now(), "
              "'v' || g || E'\\nml''x', NULL, true "
              "FROM generate_series(1, 800) g;\n"
              "COMMIT;")
        r.sql("INSERT INTO notes VALUES (9001, now(), 'post', 1.5, true);")
        kw = dict(slot="po_spill", consumer="c", publication="pub_spill",
                  streaming=True, max_changes=50, max_peek=200)
        # without spill_dir: loud error (the streamed peek window stops
        # between chunks, never reaching the Stream Commit)
        with pytest.raises(GiantTxnError):
            PgOutputPoller.open_durable(r, **kw).read_rows()
        spool = str(tmp_path / "spool")
        p = PgOutputPoller.open_durable(r, spill_dir=spool, **kw)
        rows, bounds = p.read_rows()
        assert [x[0] for x in rows] == list(range(1, 802))
        for g, x in enumerate(rows[:800], start=1):
            assert json.loads(x[6])["note"] == f"v{g}\nml'x", g
        assert (rows[800][5], json.loads(rows[800][6])["note"]) == (
            "9001", "post")

        # crash window (a): no advance — a FRESH poller re-parses the
        # same spool byte-identically
        p2 = PgOutputPoller.open_durable(r, spill_dir=spool, **kw)
        rows_b, _ = p2.read_rows()
        assert rows_b == rows
        p2.advance()
        import os

        assert not os.path.isdir(os.path.join(spool, "po_spill"))
        # the stream continues on the peek path (drain loop over
        # change-free barrier txns, tiny window)
        r.sql("INSERT INTO notes VALUES (9002, now(), 'live', NULL, false);")
        got: list = []
        for _ in range(8):
            nxt, _ = p2.read_rows()
            got += nxt
            p2.advance()
            if got:
                break
        assert [(x[0], x[5]) for x in got] == [(802, "9002")]
    finally:
        srv.destroy()


def test_pgoutput_datasource_spilldir(spark, tmp_path):
    """option("spillDir", ...) now composes with plugin=pgoutput: a
    streamed giant transaction beyond maxPeek arrives through the
    DataSource as one txn-aligned batch instead of killing the query."""
    from pqstream_spark.sources.logical_datasource import LogicalStreamReader

    srv = EphemeralPostgres.temp("pq_podsspill_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("ds")
        r.sql(NOTES_DDL + ";")
        PgOutputCaptureManager(
            r, slot="po_ds", publication="pub_ds",
            table_regexp="notes").install()
        r.sql("BEGIN;\n"
              "INSERT INTO notes SELECT g, now(), 'g' || g, NULL, true "
              "FROM generate_series(1, 800) g;\n"
              "COMMIT;")
        opts = {"url": f"postgres:{r.conninfo}", "slot": "po_ds",
                "plugin": "pgoutput", "publication": "pub_ds",
                "streaming": "true", "consumer": "ds",
                "maxchangesperbatch": "50", "maxpeek": "200",
                "spilldir": str(tmp_path / "spool")}
        reader = LogicalStreamReader(opts)
        start = reader.initialOffset()
        end = reader.latestOffset()
        assert end["seq"] == 800  # the whole txn, one boundary
        rows = [row for part in reader.partitions(start, end)
                for row in reader.read(part)]
        assert len(rows) == 800
        reader.commit(end)
    finally:
        srv.destroy()


def test_pgoutput_spool_mode_parity_with_peek(pg, spark, tmp_path):
    """Continuous executor-side spool ingest on the pgoutput plugin
    (round 11): the binary spool scan is row-identical to the peek
    path over the same writes — publication-scoped decode, streamed
    protocol, multi-line values, UPDATE previous, DELETEs."""
    r = pg.createdb("po_spoolmode")
    r.sql(NOTES_DDL + ";")
    m1 = PgOutputCaptureManager(
        r, slot="po_sm_peek", publication="pub_sm", table_regexp="notes")
    m1.install()
    r.sql("SELECT pg_create_logical_replication_slot("
          "'po_sm_spool', 'pgoutput');")
    r.sql("INSERT INTO notes SELECT g, timestamp '2021-05-06 07:08:09', "
          "'v' || g || E'\\nml''x', g + 0.5, g % 2 = 0 "
          "FROM generate_series(1, 300) g;"
          "UPDATE notes SET note = note || '+' WHERE id <= 50;"
          "DELETE FROM notes WHERE id = 7;")
    kw = dict(consumer="c", publication="pub_sm", streaming=True)
    p1 = PgOutputPoller.open_durable(r, slot="po_sm_peek", **kw)
    peek_rows = sorted(tuple(x) for x in p1.read_batch(spark).collect())
    p1.advance()
    p2 = PgOutputPoller.open_durable(
        r, slot="po_sm_spool", spill_dir=str(tmp_path / "spool"), **kw)
    df, n = p2.read_batch_spool_distributed(spark)
    spool_rows = sorted(tuple(x) for x in df.collect())
    assert n == len(peek_rows) == 351
    assert spool_rows == peek_rows
    p2.advance()
    import os

    assert not os.path.isdir(p2._spool_dir())
    # the spool-mode stream continues
    r.sql("INSERT INTO notes VALUES (9001, now(), 'post', NULL, true);")
    df2, n2 = p2.read_batch_spool_distributed(spark)
    assert [(x.seq, x.id) for x in df2.collect()] == [(352, "9001")]
    p2.advance()

"""End-to-end capture path on sqlite: real triggers fire on real
writes, the outbox poller reads incremental micro-batches, and the
shared pipeline produces public Events — the engine's analog of the
reference's live-Postgres integration tests
(/root/reference/server_test.go:110-257: scripted INSERT/UPDATE on a
`notes` table; :362-406: install/remove lifecycle)."""

from __future__ import annotations

import json
import sqlite3

import pytest

from pqstream_spark.pipeline import handle_events
from pqstream_spark.sources.outbox_local import (
    LocalCaptureManager,
    LocalOutboxPoller,
    raw_events_from_outbox,
)


@pytest.fixture()
def db():
    conn = sqlite3.connect(":memory:")
    # the reference's test table: server_test.go:26
    conn.execute(
        "CREATE TABLE notes (id INTEGER PRIMARY KEY, created_at TEXT, note TEXT)"
    )
    conn.execute("CREATE TABLE other (x INTEGER)")
    yield conn
    conn.close()


def test_triggers_capture_ops_end_to_end(spark, db):
    cap = LocalCaptureManager(db, table_regexp="notes")
    cap.remove()  # remove-then-install startup (cmd/pqsd/main.go:95-102)
    assert cap.install() == ["notes"]

    db.execute("INSERT INTO notes VALUES (1, '2026-01-01', 'here is a sample note')")
    db.execute("UPDATE notes SET note = 'here is an updated note' WHERE id = 1")
    db.execute("DELETE FROM notes WHERE id = 1")
    db.execute("INSERT INTO other VALUES (42)")  # unmatched table: no trigger
    db.commit()

    poller = LocalOutboxPoller(db)
    batch = poller.read_batch(spark)
    events = handle_events(raw_events_from_outbox(batch)).orderBy("seq").collect()

    assert [e["op"] for e in events] == ["INSERT", "UPDATE", "DELETE"]
    assert all(e["table_name"] == "notes" for e in events)
    assert all(e["id"] == "1" for e in events)

    ins, upd, dele = events
    assert ins["payload"]["note"] == "here is a sample note"
    # UPDATE: payload is NEW, changes is the RFC-7386 NEW->OLD patch —
    # old values of exactly the changed fields (README.md:45,57 parity)
    assert upd["payload"]["note"] == "here is an updated note"
    assert dict(upd["changes"]) == {"note": "here is a sample note"}
    # DELETE: payload is the OLD row (queries.go:17-18)
    assert dele["payload"]["note"] == "here is an updated note"
    # exact-JSON projection kept alongside the map
    assert json.loads(ins["payload_json"])["id"] == 1


def test_poller_incremental_batches_and_replay(spark, db):
    LocalCaptureManager(db, table_regexp="notes").install()
    for i in range(5):
        db.execute(f"INSERT INTO notes VALUES ({i}, NULL, 'n{i}')")
    db.commit()

    poller = LocalOutboxPoller(db, max_rows=2)
    # micro-batch 1: bounded read, then commit the high-water mark
    b1 = poller.read_batch(spark).collect()
    assert [r["seq"] for r in b1] == [1, 2]
    poller.advance()

    # micro-batch 2 read but NOT advanced — crash before sink commit
    b2 = poller.read_batch(spark).collect()
    assert [r["seq"] for r in b2] == [3, 4]

    # restart from the checkpointed mark: at-least-once replay of 3,4
    restarted = LocalOutboxPoller(db, max_rows=100, last_seq=poller.last_seq)
    b2_replay = restarted.read_batch(spark).collect()
    assert [r["seq"] for r in b2_replay] == [3, 4, 5]
    restarted.advance()

    # fully drained: next batch is empty, mark stays put
    assert restarted.read_batch(spark).count() == 0
    assert restarted.advance() == 5


def test_lifecycle_remove_reinstall_and_no_match(db):
    cap = LocalCaptureManager(db)
    assert sorted(cap.install()) == ["notes", "other"]
    db.execute("INSERT INTO notes VALUES (1, NULL, 'x')")
    cap.remove()
    db.execute("INSERT INTO notes VALUES (2, NULL, 'y')")  # after removal
    db.commit()
    n = db.execute("SELECT COUNT(*) FROM pqstream_outbox").fetchone()[0]
    assert n == 1, "no events captured after remove()"
    # reinstall is idempotent; zero-match regexp errors (server.go:136-139)
    cap.install()
    cap.install()
    with pytest.raises(RuntimeError):
        LocalCaptureManager(db, table_regexp="nomatch^").install()


def test_discovery_never_captures_engine_tables(spark):
    """Regression: a daemon restart without --tables used to discover
    pqstream_consumer_offset (created by the durable poller on the
    first run) and install capture triggers on it — every offset write
    then fired a trigger, landed in the outbox, was consumed, advanced
    the offset, fired again: an infinite feedback loop. Engine tables
    (pqstream_%) must be invisible to discovery."""
    import sqlite3

    from pqstream_spark.sources.outbox_local import (
        LocalCaptureManager,
        LocalOutboxPoller,
    )

    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE notes (id INTEGER PRIMARY KEY, note TEXT)")
    cap = LocalCaptureManager(conn)  # no table filter — matches all
    cap.install()
    poller = LocalOutboxPoller.open_durable(conn)  # creates offset table

    # second install (daemon restart): offset table now exists
    cap2 = LocalCaptureManager(conn)
    tables = cap2.install()
    assert tables == ["notes"], tables

    conn.execute("INSERT INTO notes VALUES (1, 'x')")
    conn.commit()
    batch = poller.read_batch(spark)
    poller.advance()  # writes the offset row — must NOT fire a trigger
    poller.advance()
    assert poller.read_batch(spark).isEmpty(), (
        "offset writes generated outbox events: feedback loop"
    )
    assert batch.count() == 1
    conn.close()

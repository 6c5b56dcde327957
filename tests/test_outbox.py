"""Capture-side DDL lifecycle (SURVEY §2 S1/S3/S4) — pure SQL text +
a fake DB-API connection; mirrors the reference's DDL tests
(/root/reference/server_test.go:362-406) without a live Postgres."""

from __future__ import annotations

import pytest

from pqstream_spark.sources.outbox import (
    CaptureManager,
    filter_tables,
    install_trigger_sql,
    remove_trigger_sql,
)


class FakeCursor:
    def __init__(self, tables, payload_type="json"):
        self.tables = tables
        self.payload_type = payload_type
        self.executed = []

    def execute(self, sql):
        self.executed.append(sql)
        self._last = sql

    def fetchall(self):
        assert "information_schema" in self._last
        if "information_schema.columns" in self._last:
            # the json-type verification: an empty result (fresh install,
            # no outbox yet) or the existing columns' types
            if not self.tables:
                return []
            return [
                ("payload", self.payload_type),
                ("previous", self.payload_type),
            ]
        return [(t,) for t in self.tables]


class FakeConn:
    def __init__(self, tables, payload_type="json"):
        self._cur = FakeCursor(tables, payload_type)
        self.commits = 0

    def cursor(self):
        return self._cur

    def commit(self):
        self.commits += 1


def test_trigger_sql_shape():
    sql = install_trigger_sql("notes")
    assert "AFTER INSERT OR UPDATE OR DELETE" in sql
    assert 'ON "notes"' in sql
    assert "DROP TRIGGER IF EXISTS" in sql  # idempotent re-install
    assert 'ON "notes"' in remove_trigger_sql("notes")


def test_identifier_validation():
    with pytest.raises(ValueError):
        install_trigger_sql("notes; DROP TABLE users")


def test_table_regexp_filter():
    names = ["notes", "users", "orders_2024"]
    assert filter_tables(names, None) == names
    assert filter_tables(names, "^(notes|users)$") == ["notes", "users"]
    assert filter_tables(names, "orders") == ["orders_2024"]


def test_install_remove_lifecycle():
    conn = FakeConn(["notes", "users"])
    mgr = CaptureManager(conn, table_regexp="^notes$")
    installed = mgr.install()
    assert installed == ["notes"]
    sqls = conn._cur.executed
    assert any("CREATE TABLE IF NOT EXISTS pqstream_outbox" in s for s in sqls)
    assert any("CREATE OR REPLACE FUNCTION pqstream_outbox_capture" in s for s in sqls)
    assert any("CREATE TRIGGER" in s and '"notes"' in s for s in sqls)
    assert conn.commits == 1
    removed = mgr.remove()
    assert removed == ["notes"]


def test_install_no_match_errors():
    conn = FakeConn(["notes"])
    mgr = CaptureManager(conn, table_regexp="^nope$")
    with pytest.raises(RuntimeError):
        mgr.install()


def test_install_applies_claim_seq_migration():
    """ADVICE r8 (medium): the DB-API install path must apply the
    claim-seq function + seq DEFAULT migration like PgCaptureManager —
    otherwise outboxes installed via this path keep the bare nextval
    default and the xid-less direct-INSERT claim window stays open
    against PgSeqFence."""
    conn = FakeConn(["notes"])
    CaptureManager(conn, table_regexp="^notes$").install()
    sqls = conn._cur.executed
    assert any("pqstream_claim_seq" in s and "CREATE OR REPLACE" in s for s in sqls)
    assert any("SET DEFAULT pqstream_claim_seq()" in s for s in sqls)


def test_install_rejects_legacy_jsonb_outbox():
    """A legacy jsonb-typed outbox must fail loudly before any trigger
    attaches (same contract as PgCaptureManager, ADVICE r7)."""
    conn = FakeConn(["notes"], payload_type="jsonb")
    with pytest.raises(RuntimeError, match="jsonb"):
        CaptureManager(conn, table_regexp="^notes$").install()
    assert not any("CREATE TRIGGER" in s for s in conn._cur.executed)


def test_txn_assembler_exact_completion_unit(spark):
    """Pure-DataFrame unit coverage of the round-10 TxnAssembler (the
    live-PG tests drive it through read_batch_txn; this pins the
    assembler's own semantics without a server): an xid emits exactly
    when a row of it arrives flagged txn_complete; incomplete xids
    buffer across any number of batches (including empty ones — the
    round-9 flush-on-empty tore here); NULL xids emit immediately;
    pending_floor tracks the lowest held seq for the durable offset."""
    from datetime import datetime

    from pyspark.sql import types as T

    from pqstream_spark.sources.outbox_local import OUTBOX_BATCH_SCHEMA
    from pqstream_spark.sources.outbox_pg import TxnAssembler

    schema = T.StructType(
        OUTBOX_BATCH_SCHEMA.fields
        + [T.StructField("xid", T.LongType()),
           T.StructField("txn_complete", T.BooleanType())]
    )
    ts = datetime(2020, 1, 1)

    def row(seq, xid, complete):
        return (seq, ts, "public", "notes", "INSERT", str(seq),
                '{"id":%d}' % seq, None, xid, complete)

    def batch(*rows):
        return spark.createDataFrame(list(rows), schema)

    asm = TxnAssembler()
    # batch 1: xid 7 spans past the ceiling (incomplete), xid 8 is
    # self-contained (emits same-batch), NULL xid emits immediately
    e1 = asm.feed(batch(row(1, 7, False), row(2, 8, True),
                        (3, ts, "public", "notes", "INSERT", "3",
                         '{"id":3}', None, None, None)))
    assert sorted(r.seq for r in e1.collect()) == [2, 3]
    assert asm.pending_floor() == 1
    # empty batch: nothing flushes (the round-9 regression)
    assert asm.feed(batch()).count() == 0
    assert asm.pending_floor() == 1
    # batch 2: xid 7 completes -> buffered row 1 emits with rows 4-5;
    # xid 9 starts buffering
    e2 = asm.feed(batch(row(4, 7, True), row(5, 7, True),
                        row(6, 9, False)))
    assert sorted(r.seq for r in e2.collect()) == [1, 4, 5]
    assert asm.pending_floor() == 6
    # flush hands back the remainder (terminal drain only)
    assert [r.seq for r in asm.flush().collect()] == [6]
    assert asm.pending_floor() is None

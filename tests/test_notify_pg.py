"""Live NOTIFY transport (S1/S5 true parity): the reference's actual
fire-and-forget wire — trigger → pg_notify → LISTEN — against a real
PostgreSQL server, including the reference's P3 fallback (re-SELECT by
id) recovering tier-2-degraded payloads.

The contract pins are the POINT of this suite:
- envelopes received live parse into the shared RawEvent frame and the
  full pipeline (parse → redact → merge-patch) runs on them unchanged;
- delivery is AT-MOST-ONCE: events fired while no listener is
  connected are lost, and there is no cursor to resume from —
  exactly the reference's semantics (server.go:98-109), in contrast
  to the outbox backend's durable at-least-once (test_outbox_pg.py);
- a degraded envelope (8 KB tier 2: payload dropped, id kept) is
  re-enriched by pg_fetch_row_by_id with bytes identical to what the
  trigger would have emitted undegraded (row_to_json both sides).
"""

from __future__ import annotations

import pytest

from pqstream_spark.sources.notify_pg import (
    NotifyListener,
    parse_notify_envelope,
)
from pqstream_spark.sources.outbox_pg import (
    NOTIFY_TRIGGER_FUNCTION_SQL,
    NOTIFY_TRUNCATE_FUNCTION_SQL,
    PgCaptureManager,
    install_notify_trigger_sql,
    pg_available,
    pg_fetch_row_by_id,
)

PG_AVAILABLE = pg_available()
pytestmark = pytest.mark.skipif(
    not PG_AVAILABLE, reason="PostgreSQL server binaries not installed"
)

NOTES_DDL = "CREATE TABLE notes (id serial, created_at timestamp, note text)"


@pytest.fixture(scope="module")
def pg():
    from pqstream_spark.sources.outbox_pg import EphemeralPostgres

    srv = EphemeralPostgres.temp()
    srv.initdb()
    srv.start()
    yield srv
    srv.destroy()


def _notify_db(pg, name):
    r = pg.createdb(name)
    r.sql(NOTES_DDL + ";")
    r.sql(NOTIFY_TRIGGER_FUNCTION_SQL + ";")
    r.sql(NOTIFY_TRUNCATE_FUNCTION_SQL + ";")
    r.sql(install_notify_trigger_sql("notes") + ";")
    return r


def test_parse_notify_envelope_contract():
    env = parse_notify_envelope(
        '{"schema" : "public", "table" : "notes", "op" : "INSERT", '
        '"id" : "1", "payload" : {"id":1,"note":"x"}, "previous" : null}'
    )
    assert env["schema_name"] == "public" and env["op"] == "INSERT"
    assert env["payload_json"] == '{"id":1,"note":"x"}'
    assert env["previous_json"] is None
    # tier-2 envelope: no payload/previous keys at all
    env2 = parse_notify_envelope(
        '{"schema" : "public", "table" : "notes", "op" : "UPDATE", '
        '"id" : "7"}'
    )
    assert env2["payload_json"] is None and env2["id"] == "7"
    assert parse_notify_envelope("not json at all") is None
    assert parse_notify_envelope('"just a string"') is None


def test_live_listen_end_to_end_pipeline(pg, spark):
    """Writes on a live server reach a LISTENing session and run the
    full handled pipeline: INSERT/UPDATE/DELETE envelopes, merge-patch
    changes computed from previous, synthetic seqs monotone."""
    from pqstream_spark.pipeline import handle_events
    from pqstream_spark.sources.outbox_local import raw_events_from_outbox

    r = _notify_db(pg, "n_e2e")
    with NotifyListener(pg.conninfo("n_e2e")) as lis:
        r.sql(
            "INSERT INTO notes VALUES (1, '2020-01-02T03:04:05', 'one');"
            "INSERT INTO notes VALUES (2, '2020-01-02T03:04:06', 'two');"
            "UPDATE notes SET note = 'one-edited' WHERE id = 1;"
            "DELETE FROM notes WHERE id = 2;"
        )
        payloads = []
        import time as _time
        deadline = _time.time() + 15
        while len(payloads) < 4 and _time.time() < deadline:
            payloads += lis.poll(timeout=1.0)
        assert len(payloads) == 4, payloads
        batch = lis.batch_df(spark, payloads)
    rows = batch.orderBy("seq").collect()
    assert [r_["op"] for r_ in rows] == ["INSERT", "INSERT", "UPDATE", "DELETE"]
    assert [r_["seq"] for r_ in rows] == [1, 2, 3, 4]
    handled = handle_events(raw_events_from_outbox(batch),
                            typed_wire=True).orderBy("seq").collect()
    upd = handled[2]
    assert upd.op == "UPDATE" and upd.id == "1"
    # RFC-7386 merge patch NEW→OLD: only the changed field, old value
    assert dict(upd.changes) == {"note": "one"}
    dele = handled[3]
    assert dele.op == "DELETE" and dele.payload["note"] == "two"


def test_at_most_once_semantics_pinned(pg, spark):
    """The reference contract this transport reproduces: events fired
    while no listener is connected are LOST (no replay, no cursor) —
    and the outbox backend on the very same writes loses nothing."""
    r = _notify_db(pg, "n_amo")
    PgCaptureManager(r, table_regexp="notes").install()  # outbox too

    with NotifyListener(pg.conninfo("n_amo")) as lis:
        r.sql("INSERT INTO notes VALUES (1, now(), 'seen');")
        got = lis.poll(timeout=10.0)
        assert len(got) == 1
    # listener gone: these fire into the void
    r.sql(
        "INSERT INTO notes VALUES (2, now(), 'lost');"
        "INSERT INTO notes VALUES (3, now(), 'lost');"
    )
    with NotifyListener(pg.conninfo("n_amo")) as lis2:
        assert lis2.poll(timeout=1.0) == [], (
            "NOTIFY must not replay events fired before connect"
        )
    # the outbox captured all three — the durable upgrade, side by side
    n = r.scalar("SELECT count(*) FROM pqstream_outbox")
    assert n == "3"


def test_commit_order_delivery_under_concurrent_writers(pg, spark):
    """Round-8 ask #7: NOTIFY is delivered at COMMIT, in commit order —
    the reference's implicit guarantee (one commit-ordered notification
    stream, server.go:258-281). Writer A inserts FIRST but commits
    LAST; the wire must carry B's event before A's, and the listener's
    synthetic session seqs must stay monotone in that arrival order.
    (Contrast: the outbox orders by BIGSERIAL claim order — the exact
    divergence the poller's PgSeqFence exists to make safe.)"""
    import json

    from tests.test_outbox_pg import TxnSession

    r = _notify_db(pg, "n_commit_order")
    with NotifyListener(pg.conninfo("n_commit_order")) as lis:
        a = TxnSession(pg.conninfo("n_commit_order"))
        try:
            a.run("BEGIN;\nINSERT INTO notes VALUES "
                  "(1, now(), 'first started');")
            r.sql("INSERT INTO notes VALUES (2, now(), 'first committed');")
            got = lis.poll(timeout=10.0)
            # only B's event is on the wire while A's txn is open
            assert len(got) == 1
            assert json.loads(got[0])["payload"]["id"] == 2
            a.run("COMMIT;")
            got2 = lis.poll(timeout=10.0)
            assert len(got2) == 1
            assert json.loads(got2[0])["payload"]["id"] == 1
        finally:
            a.close()
        # synthetic seqs: monotone in ARRIVAL (commit) order
        df = lis.batch_df(spark, got + got2)
        rows = sorted(df.collect(), key=lambda x: x.seq)
        assert [x.id for x in rows] == ["2", "1"]


def test_degraded_envelope_fallback_reenrichment(pg, spark):
    """S2 + P3 composed on live PG, the reference's own flow
    (server.go:194-212): a tier-2 envelope (payload dropped, id kept)
    is re-enriched by pg_fetch_row_by_id, and the recovered JSON is
    byte-identical to row_to_json of the live row."""
    r = _notify_db(pg, "n_fallback")
    big = "x" * 8100  # tier 2: even without previous the envelope > 8000
    with NotifyListener(pg.conninfo("n_fallback")) as lis:
        r.sql(f"INSERT INTO notes VALUES (5, NULL, '{big}');")
        payloads = lis.poll(timeout=10.0)
    assert len(payloads) == 1
    env = parse_notify_envelope(payloads[0])
    assert env["payload_json"] is None and env["id"] == "5", (
        "tier-2 degradation must drop payload but keep id"
    )
    recovered = pg_fetch_row_by_id(r, env["table_name"], env["id"])
    assert recovered is not None and f'"note":"{big}"' in recovered
    want = r.scalar("SELECT row_to_json(r)::text FROM "
                    "(SELECT * FROM notes WHERE id = 5) r")
    assert recovered == want
    # DELETE rows are unrecoverable — same reference behavior
    r.sql("DELETE FROM notes WHERE id = 5;")
    assert pg_fetch_row_by_id(r, "notes", "5") is None


def _out_lines(out_dir):
    import os as _os

    lines = []
    if not _os.path.isdir(out_dir):
        return lines
    for name in sorted(_os.listdir(out_dir)):
        if name.endswith(".jsonl"):
            with open(_os.path.join(out_dir, name)) as f:
                lines += [l.strip() for l in f if l.strip()]
    return lines


def test_daemon_notify_transport_e2e(pg, tmp_path):
    """`--connect postgres: --transport notify`: the daemon running
    the reference's own data path — NOTIFY trigger installed by the
    daemon, LISTEN session, handled envelopes to jsonl. Writes fired
    while the daemon is DOWN are lost (at-most-once, pinned); durable
    flags are rejected up front."""
    import json as _json
    import os as _os
    import subprocess
    import sys as _sys
    import time as _time

    r = pg.createdb("n_daemon")
    r.sql(NOTES_DDL + ";")
    conninfo = pg.conninfo("n_daemon")
    out = str(tmp_path / "out")
    log = str(tmp_path / "daemon.log")
    _os.makedirs(out)
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    # durable-only flags are rejected for the lossy transport
    rc = subprocess.run(
        [_sys.executable, "-m", "pqstream_spark",
         "--connect", f"postgres:{conninfo}", "--transport", "notify",
         "--out", out, "--replay-from", "0"],
        cwd=repo, capture_output=True, text=True, timeout=120,
    ).returncode
    assert rc == 2

    env = {**_os.environ, "SPARK_GRAFT_CPUS": "8"}
    logf = open(log, "ab")
    daemon = subprocess.Popen(
        [_sys.executable, "-m", "pqstream_spark",
         "--connect", f"postgres:{conninfo}", "--transport", "notify",
         "--tables", "notes", "--out", out, "--poll-interval", "0.5"],
        cwd=repo, env=env, stdout=logf, stderr=logf,
    )
    try:
        # wait for the daemon's trigger install + LISTEN to be live:
        # the trigger existing is necessary but not sufficient — probe
        # with sentinel writes until one comes out the other end
        deadline = _time.time() + 240
        seeded = False
        while _time.time() < deadline and not seeded:
            r.sql("INSERT INTO notes VALUES (default, now(), 'probe');")
            _time.sleep(1.0)
            seeded = len(_out_lines(out)) > 0
        assert seeded, "daemon never delivered a probe event"
        r.sql(
            "INSERT INTO notes VALUES (500, now(), 'target');"
            "UPDATE notes SET note = 'target-edited' WHERE id = 500;"
        )
        deadline = _time.time() + 60
        while _time.time() < deadline:
            evs = [_json.loads(l) for l in _out_lines(out)]
            if any(e["op"] == "UPDATE" for e in evs):
                break
            _time.sleep(0.5)
        evs = [_json.loads(l) for l in _out_lines(out)]
        upd = [e for e in evs if e["op"] == "UPDATE"]
        assert upd and upd[0]["id"] == "500"
        assert upd[0]["changes"] == {"note": "target"}, (
            "merge patch must run on the notify path too"
        )
        # round 8: TRUNCATE rides the notify wire end to end — one
        # statement-level envelope, no row-scoped fields
        r.sql("TRUNCATE notes;")
        deadline = _time.time() + 60
        while _time.time() < deadline:
            evs = [_json.loads(l) for l in _out_lines(out)]
            if any(e["op"] == "TRUNCATE" for e in evs):
                break
            _time.sleep(0.5)
        trunc = [e for e in evs if e["op"] == "TRUNCATE"]
        assert len(trunc) == 1, f"want exactly one TRUNCATE event: {trunc}"
        assert trunc[0]["table"] == "notes"
        assert trunc[0].get("payload") is None
    finally:
        daemon.kill()
        daemon.wait(timeout=30)
        logf.close()

    n_before = len(_out_lines(out))
    # daemon down: these are lost — the reference's exact semantics
    r.sql("INSERT INTO notes VALUES (600, now(), 'fired into the void');")
    daemon2 = subprocess.Popen(
        [_sys.executable, "-m", "pqstream_spark",
         "--connect", f"postgres:{conninfo}", "--transport", "notify",
         "--tables", "notes", "--out", out, "--poll-interval", "0.5"],
        cwd=repo, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        # give the second daemon time to install + LISTEN, prove it
        # delivers NEW events but never the one fired while down
        deadline = _time.time() + 240
        while _time.time() < deadline:
            r.sql("INSERT INTO notes VALUES (default, now(), 'alive');")
            _time.sleep(1.0)
            if len(_out_lines(out)) > n_before:
                break
        evs = [_json.loads(l) for l in _out_lines(out)]
        assert len(evs) > n_before, "second daemon never delivered"
        assert not any(e.get("id") == "600" for e in evs), (
            "event fired while the daemon was down must be LOST "
            "(at-most-once) — if this fails, the transport grew a "
            "replay it must not have"
        )
    finally:
        daemon2.kill()
        daemon2.wait(timeout=30)


def test_transport_switch_removes_other_triggers(pg):
    """Review finding (r7): restarting the daemon with a different
    --transport must tear the OTHER transport's triggers down —
    an orphaned outbox trigger would fill pqstream_outbox forever with
    no consumer. Exercised at the manager level: each transport's
    startup removes both trigger sets (as the daemon does)."""
    from pqstream_spark.sources.outbox_pg import (
        PgNotifyCaptureManager,
        remove_notify_trigger_sql,
    )

    r = pg.createdb("n_switch")
    r.sql(NOTES_DDL + ";")
    # outbox transport was running...
    PgCaptureManager(r, table_regexp="notes").install()
    r.sql("INSERT INTO notes VALUES (1, now(), 'a');")
    assert r.scalar("SELECT count(*) FROM pqstream_outbox") == "1"
    # ...daemon restarted with --transport notify: both removals run
    PgNotifyCaptureManager(r, table_regexp="notes").remove()
    PgCaptureManager(r, table_regexp="notes").remove()
    PgNotifyCaptureManager(r, table_regexp="notes").install()
    r.sql("INSERT INTO notes VALUES (2, now(), 'b');")
    assert r.scalar("SELECT count(*) FROM pqstream_outbox") == "1", (
        "outbox trigger must be gone after switching to notify"
    )
    # sanity: the notify trigger is the one firing now
    with NotifyListener(pg.conninfo("n_switch")) as lis:
        r.sql("INSERT INTO notes VALUES (3, now(), 'c');")
        assert len(lis.poll(timeout=10.0)) == 1
    assert "DROP TRIGGER" in remove_notify_trigger_sql("notes")


def test_fetch_row_by_id_text_primary_key(pg):
    """Review finding (r7): TEXT primary keys arrive in the envelope
    WITH their JSON quotes ((payload -> 'id')::text); the fallback must
    strip them or every string-id lookup silently misses. (The
    reference hardcodes ::integer and simply cannot do this —
    documented upgrade.)"""
    r = pg.createdb("n_textid")
    r.sql("CREATE TABLE t2 (id text, note text);")
    r.sql(NOTIFY_TRIGGER_FUNCTION_SQL + ";")
    r.sql(NOTIFY_TRUNCATE_FUNCTION_SQL + ";")
    r.sql(install_notify_trigger_sql("t2") + ";")
    big = "y" * 8100
    with NotifyListener(pg.conninfo("n_textid")) as lis:
        r.sql(f"INSERT INTO t2 VALUES ('doc-abc', '{big}');")
        payloads = lis.poll(timeout=10.0)
    env = parse_notify_envelope(payloads[0])
    assert env["id"] == '"doc-abc"', "envelope id keeps JSON quotes"
    got = pg_fetch_row_by_id(r, "t2", env["id"], id_type="text")
    assert got is not None and '"id":"doc-abc"' in got


def test_daemon_notify_rejects_consumer_flag(pg, tmp_path):
    """--consumer implies a durable offset the notify transport does
    not have — rejected up front, not silently ignored."""
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    rc = subprocess.run(
        [_sys.executable, "-m", "pqstream_spark",
         "--connect", f"postgres:{pg.conninfo()}", "--transport", "notify",
         "--consumer", "analytics", "--out", str(tmp_path / "o")],
        cwd=repo, capture_output=True, text=True, timeout=120,
    )
    assert rc.returncode == 2 and "--consumer" in rc.stderr

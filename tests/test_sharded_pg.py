"""Horizontal capture scale-out (round 11 lead item, VERDICT r10 #1):
capture sharded across N pgoutput publications/slots, drained by N
parallel pollers, merged into one loss-free duplicate-free stream with
per-shard (hence per-table) commit order and replay-stable global
seqs. Reference anchor: generalizes S5's single listener
(server.go:98-109) the way the engine generalized F1's fan-out."""

from __future__ import annotations

import json

import pytest

from pqstream_spark.sources.outbox_pg import (
    EphemeralPostgres,
    PsqlRunner,
    pg_available,
)
from pqstream_spark.sources.sharded_pg import (
    ShardedPgOutputCapture,
    ShardedPgOutputPoller,
    shard_of,
)

pytestmark = pytest.mark.skipif(
    not pg_available(), reason="PostgreSQL server binaries not installed"
)

N = 4


@pytest.fixture(scope="module")
def pg():
    srv = EphemeralPostgres.temp("pq_shard_")
    srv.initdb()
    srv.start()
    yield srv
    srv.destroy()


def _tables_covering_all_shards(n: int) -> list[str]:
    """Pick n table names that land on n DISTINCT shards, so the tests
    exercise every shard (the hash is stable, so this search is too)."""
    chosen: dict[int, str] = {}
    i = 0
    while len(chosen) < n:
        name = f"tbl{i}"
        chosen.setdefault(shard_of(name, n), name)
        i += 1
    return [chosen[s] for s in range(n)]


TABLES = _tables_covering_all_shards(N)
DDL = ";\n".join(
    f"CREATE TABLE {t} (id int PRIMARY KEY, note text)" for t in TABLES
) + ";"


def test_shard_assignment_stable_and_in_range():
    assert shard_of("documents", 4) == shard_of("documents", 4)
    for t in ("a", "b", "lineitem", "orders", "documents"):
        for n in (1, 2, 4, 16):
            assert 0 <= shard_of(t, n) < n
    # n=1 degenerates to the single-slot path
    assert shard_of("anything", 1) == 0


def _setup(pg, name):
    r = pg.createdb(name)
    r.sql(DDL)
    cap = ShardedPgOutputCapture(
        r, n_shards=N, slot_prefix=f"sh_{name}",
        publication_prefix=f"shpub_{name}",
        table_regexp="^tbl")
    assignment = cap.install()
    # every shard got exactly its own table (the fixture picked names
    # covering all shards)
    assert assignment == {shard_of(t, N): [t] for t in TABLES}
    return r, cap


def _write_workload(r, rounds=5):
    """Interleaved writes across all tables: per round, one multi-row
    txn per table plus UPDATE/DELETE churn. Returns the expected
    per-table event list in commit order."""
    expected = {t: [] for t in TABLES}
    for rd in range(rounds):
        stmts = []
        for t in TABLES:
            base = rd * 10
            stmts.append(
                f"BEGIN;\n"
                f"INSERT INTO {t} VALUES ({base + 1}, 'a{rd}'), "
                f"({base + 2}, 'b{rd}');\n"
                f"UPDATE {t} SET note = 'u{rd}' WHERE id = {base + 1};\n"
                f"COMMIT;"
            )
            expected[t] += [("INSERT", str(base + 1)),
                            ("INSERT", str(base + 2)),
                            ("UPDATE", str(base + 1))]
        # interleave commit order across tables within the script
        r.sql("\n".join(stmts))
    for t in TABLES:
        r.sql(f"DELETE FROM {t} WHERE id = 1;")
        expected[t].append(("DELETE", "1"))
    return expected


def test_sharded_golden_multiset_and_per_table_order(pg, spark):
    """4 shards, interleaved multi-table workload: the merged stream is
    a loss-free duplicate-free multiset; per-table delivery follows
    commit order; every event of one table rides ONE shard (the seq
    encoding exposes the shard: (seq - 1) % n)."""
    r, cap = _setup(pg, "golden")
    expected = _write_workload(r)
    p = ShardedPgOutputPoller.open_durable(
        r.conninfo, n_shards=N, slot_prefix=cap.slot_prefix,
        publication_prefix=cap.publication_prefix, consumer="c")
    assert p.shard_ids == (0, 1, 2, 3)
    rows = p.read_batch(spark).collect()
    p.advance()

    # loss-free, duplicate-free
    got = sorted((x.table_name, x.op, x.id, x.seq) for x in rows)
    assert len(got) == len(set(got)) == sum(
        len(v) for v in expected.values())
    # per-table commit order (sort by global seq within the table)
    for t in TABLES:
        per_table = sorted(
            ((x.seq, x.op, x.id) for x in rows if x.table_name == t))
        assert [(op, i) for _, op, i in per_table] == expected[t], t
        # one shard per table, and it is the hash-assigned one
        shards_seen = {(s - 1) % N for s, _, _ in per_table}
        assert shards_seen == {shard_of(t, N)}, t
    # payloads are real envelopes (spot check)
    one = next(x for x in rows if x.op == "INSERT" and x.id == "2")
    assert json.loads(x.payload_json if (x := one) else "{}")["note"] == "b0"


def test_sharded_crash_restart_replay_stable(pg, spark):
    """Crash between sink and advance: a fresh sharded poller replays
    EVERY shard's unconfirmed window with identical global seqs; after
    advance, new writes get strictly fresh seqs — the union is
    loss-free and duplicate-free across the restart."""
    r, cap = _setup(pg, "crash")
    _write_workload(r, rounds=2)
    kw = dict(n_shards=N, slot_prefix=cap.slot_prefix,
              publication_prefix=cap.publication_prefix, consumer="c")
    p1 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    first = sorted((x.seq, x.table_name, x.op, x.id)
                   for x in p1.read_batch(spark).collect())
    assert first
    # no advance — replay must be byte-stable
    p2 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    replay = sorted((x.seq, x.table_name, x.op, x.id)
                    for x in p2.read_batch(spark).collect())
    assert replay == first
    p2.advance()
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (900, 'post');")
    p3 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    nxt = sorted((x.seq, x.table_name, x.op, x.id)
                 for x in p3.read_batch(spark).collect())
    p3.advance()
    assert len(nxt) == N and all(op == "INSERT" and i == "900"
                                 for _, _, op, i in nxt)
    # fresh seqs never collide with the sunk window's
    assert {s for s, *_ in nxt}.isdisjoint({s for s, *_ in first})


def test_sharded_partial_advance_crash_window(pg, spark):
    """Crash MIDWAY through the per-shard advance loop (some shards
    committed, some not): the re-read replays exactly the unadvanced
    shards' windows — sunk ∪ replay is loss-free and duplicate-free."""
    r, cap = _setup(pg, "partial")
    _write_workload(r, rounds=2)
    kw = dict(n_shards=N, slot_prefix=cap.slot_prefix,
              publication_prefix=cap.publication_prefix, consumer="c")
    p1 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    first = sorted((x.seq, x.table_name, x.op, x.id)
                   for x in p1.read_batch(spark).collect())
    # simulated crash: only shards 0 and 2 durably advanced
    p1._pollers[0].advance()
    p1._pollers[2].advance()
    p2 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    replay = sorted((x.seq, x.table_name, x.op, x.id)
                    for x in p2.read_batch(spark).collect())
    p2.advance()
    advanced = {s for s, *_ in first if (s - 1) % N in (0, 2)}
    assert {s for s, *_ in replay} == {
        s for s, *_ in first} - advanced
    # the idempotent-sink union equals the loss-free golden multiset
    assert sorted(set(first) | set(replay)) == first


def test_sharded_remove_cleans_all_shards(pg):
    r, cap = _setup(pg, "rm")
    cap.remove()
    left = r.query_csv(
        "SELECT slot_name FROM pg_replication_slots "
        "WHERE database = current_database()")
    assert left == []
    pubs = r.query_csv("SELECT pubname FROM pg_publication")
    assert pubs == []


def test_sharded_distributed_read_parity_and_advance(pg, spark):
    """read_batch_distributed (executor-side per-shard drain): row
    parity with the driver-side merge, no marker rows in the returned
    batch, marker-armed advance commits every shard, and a replayed
    (unadvanced) distributed read is byte-stable."""
    r, cap = _setup(pg, "dist")
    expected = _write_workload(r, rounds=2)
    n_expected = sum(len(v) for v in expected.values())
    kw = dict(n_shards=N, slot_prefix=cap.slot_prefix,
              publication_prefix=cap.publication_prefix, consumer="c")
    ref = sorted(
        (t[0], t[3], t[4], t[5]) for t in
        ShardedPgOutputPoller.open_durable(r.conninfo, **kw).read_rows())
    p = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    batch, n = p.read_batch_distributed(spark)
    got = sorted((x.seq, x.table_name, x.op, x.id)
                 for x in batch.collect())
    assert n == n_expected and got == ref
    assert all(op in ("INSERT", "UPDATE", "DELETE") for _, _, op, _ in got)
    # replay (no advance): a fresh poller's distributed read is stable
    p2 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    batch2, n2 = p2.read_batch_distributed(spark)
    assert sorted((x.seq, x.table_name, x.op, x.id)
                  for x in batch2.collect()) == got
    p2.advance()  # marker-armed per-shard commit
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (901, 'post-dist');")
    p3 = ShardedPgOutputPoller.open_durable(r.conninfo, **kw)
    batch3, n3 = p3.read_batch_distributed(spark)
    rows3 = batch3.collect()
    p3.advance()
    assert n3 == N == len(rows3)
    assert {x.id for x in rows3} == {"901"}
    assert {x.seq for x in rows3}.isdisjoint({s for s, *_ in got})


def test_daemon_sharded_capture(pg, tmp_path):
    """`--shards N` product surface: install N publications/slots,
    drain via the parallel executor-side pollers into jsonl, loss-free
    duplicate-free; flag validations; --remove cleans every shard."""
    import glob
    import json as _json
    import os

    from pqstream_spark.__main__ import main

    r = pg.createdb("daemon")
    r.sql(DDL)
    out = str(tmp_path / "out")
    os.makedirs(out)
    conninfo = pg.conninfo("daemon")
    base = ["--connect", f"postgres:{conninfo}", "--tables", "^tbl",
            "--out", out, "--once"]
    # validations
    assert main(base + ["--shards", "4"]) == 2  # outbox transport
    assert main(base + ["--transport", "logical", "--shards", "4"]) == 2
    assert main(base + ["--transport", "logical", "--plugin", "pgoutput",
                        "--shards", "0"]) == 2
    assert main(base + ["--transport", "logical", "--plugin", "pgoutput",
                        "--shards", "4", "--spool-mode"]) == 2  # no spill-dir

    argv = base + ["--transport", "logical", "--plugin", "pgoutput",
                   "--shards", "4", "--slot", "dmn", "--publication",
                   "dmnpub"]
    assert main(argv) == 0  # install + idle drain
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (1, 'x-' || '{t}'), (2, 'y');"
              f"UPDATE {t} SET note = 'z' WHERE id = 1;")
    assert main(argv) == 0
    lines = []
    for f in sorted(glob.glob(out + "/*.jsonl")):
        with open(f) as fh:
            lines += [_json.loads(l) for l in fh if l.strip()]
    got = sorted((e["table"], e["op"], e["payload"]["id"]) for e in lines)
    want = sorted((t, op, i) for t in TABLES
                  for op, i in (("INSERT", 1), ("INSERT", 2),
                                ("UPDATE", 1)))
    assert got == want, f"{len(got)} events"
    # UPDATE carries the reference's NEW->OLD merge-patch changes
    upd = next(e for e in lines if e["op"] == "UPDATE")
    assert upd["changes"] == {"note": f"x-{upd['table']}"}

    assert main(argv + ["--remove"]) == 0
    assert r.query_csv(
        "SELECT slot_name FROM pg_replication_slots "
        "WHERE database = current_database() "
        "AND slot_name LIKE 'dmn%'") == []


# -- round 11: sharding ∘ spool / bootstrap compositions --------------------


def test_sharded_spill_dir_giant_txn(spark, tmp_path):
    """spill_dir composes with sharding: a STREAMED transaction 4x
    max_peek on ONE shard escalates to that shard's binary spool
    INSIDE its executor task while the other shards ride the peek
    path; the marker-armed advance cleans the spool; the stream
    continues. (Needs streaming=on + small logical_decoding_work_mem:
    the SQL peek's upto_nchanges overruns to the end of a BUFFERED
    transaction, so only the streamed protocol's chunk boundaries can
    strand a peek mid-transaction — same setup as the single-slot
    giant-txn test.)"""
    import os

    srv = EphemeralPostgres.temp("pq_shspill_")
    srv.initdb()
    srv.start(extra_conf="-c logical_decoding_work_mem=64kB")
    try:
        r = srv.createdb("spill")
        r.sql(DDL)
        cap = ShardedPgOutputCapture(
            r, n_shards=N, slot_prefix="sh_spill",
            publication_prefix="shpub_spill", table_regexp="^tbl")
        cap.install()
        giant, others = TABLES[0], TABLES[1:]
        r.sql("BEGIN;\n"
              f"INSERT INTO {giant} SELECT g, 'v' || g || E'\\nml''x' "
              "FROM generate_series(1, 800) g;\n"
              "COMMIT;")
        for t in others:
            r.sql(f"INSERT INTO {t} VALUES (1, 'small');")
        spool = str(tmp_path / "spool")
        p = ShardedPgOutputPoller.open_durable(
            r.conninfo, n_shards=N, slot_prefix="sh_spill",
            publication_prefix="shpub_spill", consumer="c",
            max_changes=50, max_peek=200, streaming=True,
            spill_dir=spool)
        batch, n = p.read_batch_distributed(spark)
        rows = batch.collect()
        assert n == 803 == len(rows)
        g_rows = sorted((x.seq, x.id, x.payload_json)
                        for x in rows if x.table_name == giant)
        assert [int(i) for _, i, _ in g_rows] == list(range(1, 801))
        # multi-line values survive the shard's binary spool byte-exactly
        assert json.loads(g_rows[0][2])["note"] == "v1\nml'x"
        # the giant shard's spool exists (advance owns cleanup); the
        # marker handler armed the spool advance
        g_shard = shard_of(giant, N)
        g_poller = p._pollers[g_shard]
        assert os.path.isdir(g_poller._spool_dir())
        assert g_poller._pending_spool
        assert all(not p._pollers[s]._pending_spool
                   for s in p._pollers if s != g_shard)
        p.advance()
        assert not os.path.isdir(g_poller._spool_dir())
        # the stream continues on the peek path across every shard
        for t in TABLES:
            r.sql(f"INSERT INTO {t} VALUES (9001, 'post');")
        batch2, n2 = p.read_batch_distributed(spark)
        rows2 = batch2.collect()
        p.advance()
        assert n2 == N == len(rows2)
        assert {x.id for x in rows2} == {"9001"}
        assert {x.seq for x in rows2}.isdisjoint({x.seq for x in rows})
    finally:
        srv.destroy()


def test_sharded_spool_mode_parity_crash_and_continue(pg, spark, tmp_path):
    """Sharded continuous spool ingest: N parallel pg_recvlogical
    drains + ONE executor-side parse job is row-identical to the
    peek-path merge; an unadvanced re-read re-parses the SAME spools
    byte-identically (crash window); advance cleans every shard's
    spool; the next poll drains fresh writes with disjoint seqs."""
    import os

    r, cap = _setup(pg, "spoolm")
    expected = _write_workload(r, rounds=2)
    n_expected = sum(len(v) for v in expected.values())
    kw = dict(n_shards=N, slot_prefix=cap.slot_prefix,
              publication_prefix=cap.publication_prefix, consumer="c")
    # peek-path reference FIRST (the spool drain moves confirmed_flush)
    ref = sorted(
        (t[0], t[3], t[4], t[5]) for t in
        ShardedPgOutputPoller.open_durable(r.conninfo, **kw).read_rows())
    spool = str(tmp_path / "spool")
    p = ShardedPgOutputPoller.open_durable(
        r.conninfo, spill_dir=spool, **kw)
    df, n = p.read_batch_spool_distributed(spark)
    got = sorted((x.seq, x.table_name, x.op, x.id) for x in df.collect())
    assert n == n_expected and got == ref
    # crash window: a fresh sharded poller re-parses the same spools
    p2 = ShardedPgOutputPoller.open_durable(
        r.conninfo, spill_dir=spool, **kw)
    df2, n2 = p2.read_batch_spool_distributed(spark)
    assert sorted((x.seq, x.table_name, x.op, x.id)
                  for x in df2.collect()) == got
    p2.advance()
    for sp in p2._pollers.values():
        assert not os.path.isdir(sp._spool_dir())
    # spool-mode stream continues with fresh disjoint seqs
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (902, 'post-spool');")
    p3 = ShardedPgOutputPoller.open_durable(
        r.conninfo, spill_dir=spool, **kw)
    df3, n3 = p3.read_batch_spool_distributed(spark)
    rows3 = df3.collect()
    p3.advance()
    assert n3 == N == len(rows3)
    assert {x.id for x in rows3} == {"902"}
    assert {x.seq for x in rows3}.isdisjoint({s for s, *_ in got})


def test_daemon_sharded_bootstrap_exactly_once(pg, tmp_path):
    """--shards ∘ --bootstrap: per-shard exported-snapshot slots make
    snapshot ∪ changelog disjoint PER SHARD (shards are
    table-disjoint, so the union is globally exactly-once). Seed rows
    appear exactly once (snapshot only); post-install writes appear
    exactly once (changelog only); a second run does not re-snapshot."""
    import glob
    import json as _json
    import os

    from pqstream_spark.__main__ import main

    r = pg.createdb("boot")
    r.sql(DDL)
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (1, 'seed-{t}');")
    out = str(tmp_path / "out")
    os.makedirs(out)
    argv = ["--connect", f"postgres:{pg.conninfo('boot')}",
            "--tables", "^tbl", "--out", out, "--once",
            "--transport", "logical", "--plugin", "pgoutput",
            "--shards", "4", "--slot", "bsh", "--publication", "bshpub",
            "--bootstrap"]
    assert main(argv) == 0
    snap_files = sorted(glob.glob(out + "/batch--*.jsonl"))
    assert len(snap_files) == N  # one snapshot emit per shard

    def events():
        lines = []
        for f in sorted(glob.glob(out + "/*.jsonl")):
            with open(f) as fh:
                lines += [_json.loads(l) for l in fh if l.strip()]
        return lines

    got = sorted((e["table"], e["op"], e["payload"]["id"])
                 for e in events())
    assert got == sorted((t, "INSERT", 1) for t in TABLES)
    # post-install writes ride the changelog exactly once; the
    # second run re-snapshots NOTHING (per-shard sentinels)
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (2, 'post');"
              f"UPDATE {t} SET note = 'u' WHERE id = 1;")
    assert main(argv) == 0
    assert sorted(glob.glob(out + "/batch--*.jsonl")) == snap_files
    got2 = sorted((e["table"], e["op"], e["payload"]["id"])
                  for e in events())
    want = sorted([(t, "INSERT", 1) for t in TABLES]
                  + [(t, "INSERT", 2) for t in TABLES]
                  + [(t, "UPDATE", 1) for t in TABLES])
    assert got2 == want
    assert main(argv + ["--remove"]) == 0


def test_daemon_sharded_rebootstrap_recovers_lost_shards(tmp_path):
    """--shards ∘ --rebootstrap: shard slots invalidated by
    max_slot_wal_keep_size pressure (wal_status='lost') are dropped and
    re-created with per-shard exported snapshots; the recovered state
    includes rows whose changelog entries were destroyed with the WAL,
    and the recovered stream keeps draining. Healthy runs are no-ops."""
    import glob
    import json as _json
    import os

    from pqstream_spark.__main__ import main

    srv = EphemeralPostgres.temp("pq_shrebs_")
    srv.initdb(extra="--wal-segsize=1")
    srv.start(extra_conf="-c max_slot_wal_keep_size=1MB")
    try:
        r = srv.createdb("keep")
        # filler is OUTSIDE the capture regexp: churn on it creates
        # retention pressure without adding captured events
        r.sql(DDL + "\nCREATE TABLE zfiller (id int, pad text);")
        for t in TABLES:
            r.sql(f"INSERT INTO {t} VALUES (1, 'seed');")
        out = str(tmp_path / "out")
        os.makedirs(out)
        argv = ["--connect", f"postgres:{srv.conninfo('keep')}",
                "--tables", "^tbl", "--out", out, "--once",
                "--transport", "logical", "--plugin", "pgoutput",
                "--shards", "4", "--slot", "rsh",
                "--publication", "rshpub"]

        def state():
            rows = {}
            for f in sorted(glob.glob(out + "/*.jsonl")):
                with open(f) as fh:
                    for line in fh:
                        e = _json.loads(line)
                        rows[(e["table"], e["payload"]["id"])] = e["op"]
            return {k for k, op in rows.items() if op != "DELETE"}

        assert main(argv + ["--bootstrap"]) == 0
        assert state() == {(t, 1) for t in TABLES}
        # healthy slots: --rebootstrap is a no-op (no re-snapshot)
        snaps_before = sorted(glob.glob(out + "/batch--*.jsonl"))
        assert main(argv + ["--rebootstrap"]) == 0
        assert sorted(glob.glob(out + "/batch--*.jsonl")) == snaps_before

        # rows every shard's slot will LOSE with the WAL, then
        # retention churn until all four shard slots are invalidated
        for t in TABLES:
            r.sql(f"INSERT INTO {t} VALUES (2, 'lost-row');")
        for _ in range(14):
            r.sql("INSERT INTO zfiller SELECT g, repeat('x', 1000) "
                  "FROM generate_series(1, 2000) g;"
                  "SELECT pg_switch_wal();"
                  "CHECKPOINT;")
            statuses = {x["wal_status"] for x in r.query_csv(
                "SELECT wal_status FROM pg_replication_slots "
                "WHERE slot_name LIKE 'rsh_s%'")}
            if statuses == {"lost"}:
                break
        assert statuses == {"lost"}, statuses

        # recovery: every lost shard re-bootstraps; the fresh per-shard
        # snapshots contain the lost id=2 rows
        assert main(argv + ["--rebootstrap"]) == 0
        assert state() == {(t, i) for t in TABLES for i in (1, 2)}
        # the recovered stream is live
        for t in TABLES:
            r.sql(f"INSERT INTO {t} VALUES (3, 'post');")
        assert main(argv) == 0
        assert state() == {(t, i) for t in TABLES for i in (1, 2, 3)}
        assert main(argv + ["--remove"]) == 0
    finally:
        srv.destroy()


# -- sharded bootstrap sentinel vs outbox compaction (ADVICE r11 #1) ------


def test_shard_bootstrap_marker_excluded_from_compaction(pg):
    """The per-shard bootstrap sentinel must not pin the outbox
    low-water mark: compact() keys retention on MIN(last_seq) over
    plain consumer rows and excludes sentinels by suffix, so the marker
    must end with '#bootstrap'. The round-11 spelling
    ('daemon@logical#bootstrap#sN@shard') matched no exclusion and
    silently disabled compaction forever."""
    from pqstream_spark.sources.outbox_pg import (
        PG_OFFSET_TABLE,
        PgCaptureManager,
        PgOutboxPoller,
    )
    from pqstream_spark.sources.sharded_pg import shard_bootstrap_marker

    r = pg.createdb("t_marker_compact")
    r.sql("CREATE TABLE notes (id int PRIMARY KEY, note text);")
    PgCaptureManager(r, table_regexp="notes").install()
    r.sql("INSERT INTO notes SELECT g, 'n' || g "
          "FROM generate_series(1, 20) g;")
    p = PgOutboxPoller.open_durable(r, consumer="c1", max_rows=100)
    # the new-form sentinel ends with '#bootstrap'
    for i in range(4):
        assert shard_bootstrap_marker(i).endswith("#bootstrap")
        r.sql(f"INSERT INTO {PG_OFFSET_TABLE} (consumer, last_seq) "
              f"VALUES ('{shard_bootstrap_marker(i)}', 1) "
              "ON CONFLICT (consumer) DO NOTHING;")
    p.rewind(20)  # consumer c1 durably consumed all 20 rows
    # compaction prunes everything the one real consumer drained — the
    # last_seq=1 sentinels must NOT hold the low-water mark at 1
    assert p.compact() == 20
    assert r.scalar("SELECT count(*) FROM pqstream_outbox") == "0"


def test_legacy_shard_marker_migration(pg):
    """migrate_legacy_shard_markers renames round-11 sentinel rows to
    the compact()-excluded suffix form, drops collisions, and is
    idempotent."""
    from pqstream_spark.sources.outbox_pg import PG_OFFSET_TABLE
    from pqstream_spark.sources.sharded_pg import (
        migrate_legacy_shard_markers,
        shard_bootstrap_marker,
    )

    r = pg.createdb("t_marker_migrate")
    r.sql(f"CREATE TABLE {PG_OFFSET_TABLE} "
          "(consumer TEXT PRIMARY KEY, last_seq BIGINT NOT NULL);")
    # legacy rows for shards 0..2, plus a pre-existing NEW-form row for
    # shard 1 (collision: legacy row must be dropped, new row kept)
    for i in range(3):
        r.sql(f"INSERT INTO {PG_OFFSET_TABLE} VALUES "
              f"('daemon@logical#bootstrap#s{i}@shard', 1);")
    r.sql(f"INSERT INTO {PG_OFFSET_TABLE} VALUES "
          f"('{shard_bootstrap_marker(1)}', 1);")
    # an unrelated consumer row must ride through untouched
    r.sql(f"INSERT INTO {PG_OFFSET_TABLE} VALUES ('daemon', 42);")
    migrate_legacy_shard_markers(r)
    consumers = sorted(
        row["consumer"] for row in
        r.query_csv(f"SELECT consumer FROM {PG_OFFSET_TABLE}"))
    assert consumers == sorted(
        [shard_bootstrap_marker(i) for i in range(3)] + ["daemon"])
    # idempotent: a second run changes nothing
    migrate_legacy_shard_markers(r)
    again = sorted(row["consumer"] for row in
                   r.query_csv(f"SELECT consumer FROM {PG_OFFSET_TABLE}"))
    assert again == consumers


def test_sharded_lag_one_report(pg, capsys):
    """`--lag --transport logical --shards N` (round 12, VERDICT r11
    #6): ONE JSON object with per-shard backlog/health rows and an
    unhealthy count — a missing shard slot counts as unhealthy (the
    worst lag state), not as absence of data."""
    from pqstream_spark.__main__ import main

    r, cap = _setup(pg, "lagrep")
    for t in TABLES:
        r.sql(f"INSERT INTO {t} VALUES (1, 'x');")
    argv = ["--connect", f"postgres:{pg.conninfo('lagrep')}",
            "--transport", "logical", "--plugin", "pgoutput",
            "--lag", "--shards", str(N), "--slot", cap.slot_prefix]
    assert main(argv) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_shards"] == N and rep["unhealthy"] == 0
    assert [s["shard"] for s in rep["shards"]] == list(range(N))
    for s in rep["shards"]:
        assert s["slot"] == f"{cap.slot_prefix}_s{s['shard']}"
        assert s["wal_bytes_pending"] > 0  # undrained insert
        assert s["wal_status"] in (None, "reserved", "extended")
    # drop one shard's slot: the report must flag it missing+unhealthy
    r.sql(f"SELECT pg_drop_replication_slot('{cap.slot_prefix}_s2');")
    assert main(argv) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["unhealthy"] == 1
    assert rep2["shards"][2] == {
        "shard": 2, "slot": f"{cap.slot_prefix}_s2", "missing": True}


def test_legacy_marker_migration_error_handling(pg):
    """ADVICE r12 low: the migration tolerates ONLY the expected
    failure (offset table absent — first-ever run) and surfaces real
    failures instead of swallowing them with check=False."""
    from pqstream_spark.sources.outbox_pg import PG_OFFSET_TABLE, PsqlError
    from pqstream_spark.sources.sharded_pg import (
        migrate_legacy_shard_markers,
    )

    # no offset table at all: a silent no-op, not an error
    r = pg.createdb("t_marker_err")
    migrate_legacy_shard_markers(r)
    # a REAL failure during the rename must raise, not vanish
    r.sql(f"CREATE TABLE {PG_OFFSET_TABLE} "
          "(consumer TEXT PRIMARY KEY, last_seq BIGINT NOT NULL);"
          f"INSERT INTO {PG_OFFSET_TABLE} VALUES "
          "('daemon@logical#bootstrap#s0@shard', 1);"
          "CREATE FUNCTION t_marker_block() RETURNS TRIGGER AS $$ "
          "BEGIN RAISE EXCEPTION 'simulated failure'; END $$ "
          "LANGUAGE plpgsql;"
          f"CREATE TRIGGER t_block BEFORE UPDATE ON {PG_OFFSET_TABLE} "
          "FOR EACH ROW EXECUTE FUNCTION t_marker_block();")
    with pytest.raises(PsqlError, match="simulated failure"):
        migrate_legacy_shard_markers(r)

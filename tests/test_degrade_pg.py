"""8 KB degradation + NOTIFY envelope parity on live PostgreSQL.

The reference's richest integration coverage is the NOTIFY-cap boundary
sweep (`server_test.go:211-222`): payload sizes 7870..7900 step 10 for
inserts (crossing tier 2), 3890..4000 step 10 for updates (crossing
tier 1, where the doubled payload+previous envelope passes 8000). These
tests run those sweeps against a REAL Postgres trigger carrying the
two-tier `length(notification::text) >= 8000` logic
(outbox_pg.NOTIFY_TRIGGER_FUNCTION_SQL, our rendering of
queries.go:26-47) and pin, per event:

1. the tier the live trigger chose (which keys survive in the NOTIFY
   JSON), against the S2 operator's tier decision
   (operators/degrade.degrade_payload) computed by Spark from the
   outbox capture of the SAME writes;
2. the NOTIFY payload TEXT, byte-for-byte, against the S2 operator's
   envelope reconstruction (degrade._envelope_text) — proving the
   engine's derived `json_build_object` rendering model ({"k" : v,
   spacing, escaped text args, verbatim row_to_json payloads, omitted
   keys per tier) equals what a live server actually emits.

Byte-parity closes S1/S2 at the wire level, not just DDL text — the
round-5/6 gap of "the Postgres DDL has never been executed".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pqstream_spark.operators.degrade import _envelope_text, degrade_payload
from pqstream_spark.sources.outbox_pg import (
    EphemeralPostgres,
    NOTIFY_TRIGGER_FUNCTION_SQL,
    NOTIFY_TRUNCATE_FUNCTION_SQL,
    PgCaptureManager,
    PgOutboxPoller,
    capture_notifications,
    install_notify_trigger_sql,
    pg_available,
)

PG_AVAILABLE = pg_available()
pytestmark = pytest.mark.skipif(
    not PG_AVAILABLE, reason="PostgreSQL server binaries not installed"
)

NOTES_DDL = "CREATE TABLE notes (id serial, created_at timestamp, note text)"


@pytest.fixture(scope="module")
def pg():
    srv = EphemeralPostgres.temp()
    srv.initdb()
    srv.start()
    yield srv
    srv.destroy()


def _db_with_both_triggers(pg, name):
    """notes + the outbox capture trigger + the NOTIFY parity trigger —
    both fire on every write (alphabetical trigger-name order), so each
    event yields one outbox row AND one NOTIFY payload to compare."""
    r = pg.createdb(name)
    r.sql(NOTES_DDL + ";")
    PgCaptureManager(r, table_regexp="notes").install()
    r.sql(NOTIFY_TRIGGER_FUNCTION_SQL + ";")
    r.sql(NOTIFY_TRUNCATE_FUNCTION_SQL + ";")
    r.sql(install_notify_trigger_sql("notes") + ";")
    return r


def _spark_envelopes(spark, r):
    """Outbox rows → the S2 operator's tier + reconstructed envelope
    text per event, ordered by seq."""
    df = PgOutboxPoller(r, max_rows=100_000).read_batch(spark)
    # degrade_payload also degrades the map-typed payload/previous
    # columns of the full RawEvent shape; the outbox batch only carries
    # the *_json texts, so satisfy the contract with null stand-ins
    tiers = degrade_payload(
        df.withColumn("payload", F.lit(None).cast("string"))
        .withColumn("previous", F.lit(None).cast("string"))
    ).select("seq", "degraded_tier")
    env = (
        F.when(F.col("degraded_tier") == 2, _envelope_text(False, False))
        .when(F.col("degraded_tier") == 1, _envelope_text(True, False))
        .otherwise(_envelope_text(True, True))
    )
    # envelope text must be built from the UNdegraded columns — join the
    # tier decision back onto the raw frame
    raw = df.select("seq", "schema_name", "table_name", "op", "id",
                    "payload_json", "previous_json")
    joined = raw.join(tiers, "seq").withColumn("envelope", env)
    out = joined.select("seq", "op", "degraded_tier", "envelope").orderBy("seq")
    return [row.asDict() for row in out.collect()]


def _tier_of_notify(payload_text: str) -> int:
    has_payload = '"payload" : ' in payload_text
    has_previous = '"previous" : ' in payload_text
    if has_payload and has_previous:
        return 0
    if has_payload:
        return 1
    return 2


def test_insert_boundary_sweep_7870_7900(pg, spark):
    """server_test.go:211-213 — inserts crossing the 8k boundary. The
    full INSERT envelope carries `previous : null`, so tier 1 (drop
    previous) can fire on size alone; near 7900 the envelope straddles
    8000. Live trigger tier == S2 operator tier, and the NOTIFY text
    == the operator's reconstruction, byte-for-byte, at every size."""
    r = _db_with_both_triggers(pg, "deg_ins")
    sizes = list(range(7870, 7901, 10))
    script = "".join(
        f"INSERT INTO notes VALUES (default, default, '{'.' * n}');\n"
        for n in sizes
    )
    notifies = capture_notifications(r, script)
    assert len(notifies) == len(sizes)
    got = _spark_envelopes(spark, r)
    assert len(got) == len(sizes)
    tiers_seen = set()
    for row, notify in zip(got, notifies):
        assert _tier_of_notify(notify) == row["degraded_tier"], (
            f"tier mismatch at seq {row['seq']}"
        )
        assert notify == row["envelope"], (
            f"envelope bytes diverged at seq {row['seq']} "
            f"(tier {row['degraded_tier']}):\n pg: {notify[:200]}…\n "
            f"spark: {row['envelope'][:200]}…"
        )
        tiers_seen.add(row["degraded_tier"])
    assert len(tiers_seen) >= 2, (
        f"sweep must cross a degradation boundary, saw tiers {tiers_seen}"
    )


def test_update_boundary_sweep_3890_4000(pg, spark):
    """server_test.go:215-217 — updates where payload+previous together
    cross 8000 (tier 1: previous dropped, payload kept)."""
    r = _db_with_both_triggers(pg, "deg_upd")
    sizes = list(range(3890, 4001, 10))
    script = "INSERT INTO notes VALUES (1, default, 'seed');\n" + "".join(
        f"UPDATE notes SET note = 'i{'-' * n}' WHERE id = 1;\n" for n in sizes
    )
    notifies = capture_notifications(r, script)
    assert len(notifies) == len(sizes) + 1
    got = _spark_envelopes(spark, r)
    updates = [g for g in got if g["op"] == "UPDATE"]
    upd_notifies = [n for n in notifies if '"op" : "UPDATE"' in n]
    assert len(updates) == len(sizes)
    tiers_seen = set()
    for row, notify in zip(updates, upd_notifies):
        assert _tier_of_notify(notify) == row["degraded_tier"]
        assert notify == row["envelope"]
        tiers_seen.add(row["degraded_tier"])
    assert {0, 1} <= tiers_seen, (
        f"update sweep must cross tier 0→1, saw {tiers_seen}"
    )


def test_update_boundary_sweep_7870_7900_drops_payload(pg, spark):
    """server_test.go:219-221 — updates big enough that even the
    previous-less envelope passes 8000: tier 2 keeps only the 4-field
    envelope {schema, table, op, id}."""
    r = _db_with_both_triggers(pg, "deg_upd2")
    sizes = list(range(7870, 7901, 10))
    script = "INSERT INTO notes VALUES (1, default, 'seed');\n" + "".join(
        f"UPDATE notes SET note = 'i{'-' * n}' WHERE id = 1;\n" for n in sizes
    )
    notifies = capture_notifications(r, script)
    got = _spark_envelopes(spark, r)
    updates = [g for g in got if g["op"] == "UPDATE"]
    upd_notifies = [n for n in notifies if '"op" : "UPDATE"' in n]
    tiers_seen = set()
    for row, notify in zip(updates, upd_notifies):
        assert _tier_of_notify(notify) == row["degraded_tier"]
        assert notify == row["envelope"]
        tiers_seen.add(row["degraded_tier"])
    assert 2 in tiers_seen, f"sweep must reach tier 2, saw {tiers_seen}"
    tier2 = [n for n in upd_notifies if _tier_of_notify(n) == 2]
    assert all(
        sorted(k for k in ("schema", "table", "op", "id", "payload", "previous")
               if f'"{k}" : ' in n) == ["id", "op", "schema", "table"]
        for n in tier2
    )


def test_notify_envelope_golden_bytes(pg, spark):
    """One fully deterministic write → the exact NOTIFY wire bytes,
    golden-pinned: json_build_object's `"k" : v` spacing, row_to_json's
    compact column-ordered payload, previous as json null on INSERT."""
    r = _db_with_both_triggers(pg, "deg_golden")
    notifies = capture_notifications(
        r,
        "INSERT INTO notes VALUES "
        "(1, '2020-01-02T03:04:05', 'here is a sample note');",
    )
    assert notifies == [
        '{"schema" : "public", "table" : "notes", "op" : "INSERT", '
        '"id" : "1", "payload" : '
        '{"id":1,"created_at":"2020-01-02T03:04:05",'
        '"note":"here is a sample note"}, "previous" : null}'
    ]
    # and the S2 reconstruction reproduces those bytes from the outbox
    got = _spark_envelopes(spark, r)
    assert got[0]["envelope"] == notifies[0]
    assert got[0]["degraded_tier"] == 0

"""End-to-end envelope chain on the synthetic changelog (SURVEY §7 M0)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pqstream_spark.operators.degrade import degrade_payload
from pqstream_spark.operators.fallback import fallback_lookup
from pqstream_spark.operators.filters import filter_tables, compile_or_raise
from pqstream_spark.pipeline import handle_events
from pqstream_spark.sources.changelog import build_changelog

import pytest


def test_changelog_shape(spark, sf_dir):
    raw = build_changelog(spark, sf_dir)
    assert raw.count() > 0
    ops = {r["op"] for r in raw.select("op").distinct().collect()}
    assert ops == {"INSERT", "UPDATE", "DELETE"}
    upd = raw.filter("op = 'UPDATE'").first()
    assert upd["previous"] is not None
    ins = raw.filter("op = 'INSERT'").first()
    assert ins["previous"] is None


def test_update_changes_carry_old_values(spark, sf_dir):
    ev = handle_events(build_changelog(spark, sf_dir))
    rows = ev.filter("op = 'UPDATE'").collect()
    assert rows
    raw = {r["seq"]: r for r in build_changelog(spark, sf_dir).filter("op='UPDATE'").collect()}
    for r in rows[:50]:
        prev = raw[r["seq"]]["previous"]
        new = raw[r["seq"]]["payload"]
        expected = {k: v for k, v in prev.items() if new.get(k) != v}
        assert dict(r["changes"]) == expected


def test_non_update_changes_null(spark, sf_dir):
    ev = handle_events(build_changelog(spark, sf_dir))
    assert ev.filter("op != 'UPDATE' AND changes IS NOT NULL").count() == 0


def test_table_filter(spark, sf_dir):
    raw = build_changelog(spark, sf_dir)
    only = filter_tables(raw, "^users$")
    assert only.select("table_name").distinct().collect() == [("users",)] or [
        r["table_name"] for r in only.select("table_name").distinct().collect()
    ] == ["users"]
    with pytest.raises(Exception):
        compile_or_raise("([unclosed")


def test_degrade_tiers(spark):
    big = "x" * 9000
    rows = [
        (1, None, "public", "t", "UPDATE", "1", {"a": "small"}, {"a": "small2"},
         '{"a":"small"}', '{"a":"small2"}'),
        (2, None, "public", "t", "UPDATE", "2", {"a": "ok"}, {"a": big},
         '{"a":"ok"}', json.dumps({"a": big})),
        (3, None, "public", "t", "UPDATE", "3", {"a": big}, {"a": big},
         json.dumps({"a": big}), json.dumps({"a": big})),
    ]
    from pqstream_spark.model import RAW_EVENT_SCHEMA

    df = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    out = {r["seq"]: r for r in degrade_payload(df).collect()}
    assert out[1]["degraded_tier"] == 0 and out[1]["previous"] is not None
    assert out[2]["degraded_tier"] == 1 and out[2]["previous"] is None
    assert out[2]["payload"] is not None
    assert out[3]["degraded_tier"] == 2 and out[3]["payload"] is None


def test_fallback_lookup(spark):
    from pqstream_spark.model import RAW_EVENT_SCHEMA

    rows = [
        (1, None, "public", "t", "INSERT", "10", None, None, None, None),
        (2, None, "public", "t", "DELETE", "11", None, None, None, None),
        (3, None, "public", "t", "INSERT", "12", {"a": "kept"}, None, '{"a":"kept"}', None),
    ]
    df = spark.createDataFrame(rows, RAW_EVENT_SCHEMA)
    lookup = spark.createDataFrame([(10, "alice"), (11, "bob")], "id int, name string")
    out = {r["seq"]: r for r in fallback_lookup(df, lookup).collect()}
    assert out[1]["payload"] == {"name": "alice"}          # recovered
    assert out[2]["payload"] is None                        # DELETE unrecoverable
    assert out[3]["payload"] == {"a": "kept"}               # untouched


def test_redaction_applies_before_patch(spark, sf_dir):
    cfg = {"public": {"notes": ["note"]}}
    ev = handle_events(build_changelog(spark, sf_dir), redactions=cfg)
    upd = ev.filter("op = 'UPDATE' AND table_name = 'notes'").collect()
    assert upd
    for r in upd:
        assert "note" not in (r["payload"] or {})
        assert "note" not in (r["changes"] or {})


def _pg_notification_text(
    schema: str, table: str, op: str, id_: str | None,
    payload_json: str | None, previous_json: str | None,
    with_payload: bool = True, with_previous: bool = True,
) -> str:
    """Independent Python reconstruction of the trigger's
    `notification::text` (queries.go:26-47): json_build_object renders
    `{"k" : v, ...}`, text args as JSON strings, json args verbatim,
    SQL NULL as null; the tier-1 rebuild omits the previous key."""
    def jstr(s):
        if s is None:
            return "null"
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'

    pairs = [
        ("schema", jstr(schema)), ("table", jstr(table)),
        ("op", jstr(op)), ("id", jstr(id_)),
    ]
    if with_payload:
        pairs.append(("payload", payload_json if payload_json is not None else "null"))
    if with_previous:
        pairs.append(("previous", previous_json if previous_json is not None else "null"))
    return "{" + ", ".join(f'"{k}" : {v}' for k, v in pairs) + "}"


def test_degrade_boundary_sweep(spark):
    """Parity with the reference's 8 KB boundary sweeps
    (server_test.go:211-222: payload sizes stepped across the cap in
    10-byte increments): the tier must flip at EXACTLY the threshold
    the trigger's own length check would produce — expected values are
    derived from an independent reconstruction of the trigger's
    notification text, not from the engine's formula."""
    from pqstream_spark.operators.degrade import _envelope_text, degrade_payload
    from pyspark.sql import functions as F

    rows = []
    sizes = list(range(3890, 4001, 10)) + list(range(7870, 7901, 10))
    for i, size in enumerate(sizes):
        body = "x" * size
        rows.append((i, size, "public", "notes", "UPDATE", "7",
                     {"v": body}, {"v": body}, body, body))
    df = spark.createDataFrame(
        rows,
        "seq long, size int, schema_name string, table_name string, "
        "op string, id string, payload map<string,string>, "
        "previous map<string,string>, payload_json string, previous_json string",
    )

    # byte-level agreement: the engine's reconstructed envelope text is
    # identical to the trigger's, character for character
    env = {
        r["seq"]: (r["full"], r["noprev"])
        for r in df.select(
            "seq",
            _envelope_text(True, True).alias("full"),
            _envelope_text(True, False).alias("noprev"),
        ).collect()
    }
    for i, size in enumerate(sizes):
        body = "x" * size
        assert env[i][0] == _pg_notification_text(
            "public", "notes", "UPDATE", "7", body, body
        ), f"full envelope text diverges at size {size}"
        assert env[i][1] == _pg_notification_text(
            "public", "notes", "UPDATE", "7", body, body, with_previous=False
        ), f"tier-1 envelope text diverges at size {size}"

    out = {r["seq"]: r for r in degrade_payload(df).collect()}
    for i, size in enumerate(sizes):
        body = "x" * size
        both = len(_pg_notification_text("public", "notes", "UPDATE", "7", body, body))
        one = len(_pg_notification_text("public", "notes", "UPDATE", "7", body, body,
                                        with_previous=False))
        if both >= 8000 and one >= 8000:
            expect = 2
        elif both >= 8000:
            expect = 1
        else:
            expect = 0
        got = out[i]
        assert got["degraded_tier"] == expect, (size, expect, got["degraded_tier"])
        assert (got["previous"] is None) == (expect >= 1)
        assert (got["payload"] is None) == (expect == 2)

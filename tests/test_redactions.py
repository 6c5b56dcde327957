"""Redaction unit table — mirrors /root/reference/redactions_test.go:11-152
(apply + decode) on the users fixture from FIXTURES.md §1.2."""

from __future__ import annotations

import json

import pytest

from pqstream_spark.model import RAW_EVENT_SCHEMA
from pqstream_spark.operators.redact import decode_redactions, redact_fields

USERS_ROW = {
    "first_name": "jane",
    "last_name": "doe",
    "password": "hunter2",
    "email": "jane@example.com",
}


def mk_event(spark, schema_name="public", table="users", payload=None, previous=None):
    row = (
        1,
        None,
        schema_name,
        table,
        "UPDATE" if previous is not None else "INSERT",
        "1",
        payload,
        previous,
        json.dumps(payload) if payload else None,
        json.dumps(previous) if previous else None,
    )
    return spark.createDataFrame([row], RAW_EVENT_SCHEMA)


CFG = {"public": {"users": ["password", "email"]}}


def test_redacts_payload_and_previous(spark):
    df = mk_event(spark, payload=dict(USERS_ROW), previous=dict(USERS_ROW))
    out = redact_fields(df, CFG).first()
    assert set(out["payload"].keys()) == {"first_name", "last_name"}
    assert set(out["previous"].keys()) == {"first_name", "last_name"}
    # json projections stay consistent with the scrubbed maps
    assert set(json.loads(out["payload_json"]).keys()) == {"first_name", "last_name"}


def test_non_matching_table_passthrough(spark):
    df = mk_event(spark, table="notes", payload=dict(USERS_ROW))
    out = redact_fields(df, CFG).first()
    assert set(out["payload"].keys()) == set(USERS_ROW)


def test_non_matching_schema_passthrough(spark):
    df = mk_event(spark, schema_name="other", payload=dict(USERS_ROW))
    out = redact_fields(df, CFG).first()
    assert set(out["payload"].keys()) == set(USERS_ROW)


def test_nil_payload_passthrough(spark):
    df = mk_event(spark, payload=None, previous=None)
    out = redact_fields(df, CFG).first()
    assert out["payload"] is None


def test_empty_config_noop(spark):
    df = mk_event(spark, payload=dict(USERS_ROW))
    out = redact_fields(df, {}).first()
    assert set(out["payload"].keys()) == set(USERS_ROW)


def test_decode_roundtrip():
    # redactions_test.go:116-152
    s = '{"public":{"users":["first_name","last_name","email"]}}'
    assert decode_redactions(s) == {
        "public": {"users": ["first_name", "last_name", "email"]}
    }
    with pytest.raises((ValueError, TypeError)):
        decode_redactions("[1,2]")
    with pytest.raises(Exception):
        decode_redactions("not json")

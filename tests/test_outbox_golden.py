"""Golden pins for the generated Postgres DDL against the reference
trigger semantics (/root/reference/queries.go:10-63). No Postgres or
PL/pgSQL parser exists in this container (sqlglot absent), so the pins
are structural: each asserts a SEMANTIC clause of the reference —
OLD/NEW payload selection, previous-only-on-UPDATE, id extraction from
the payload's `id` field as text, discovery scoped to public BASE
TABLEs, the install/remove trigger shape — so any drift in the
generator's semantics (not just formatting) fails a named assertion.

The one documented divergence is pinned too: the 8000-char two-tier
degradation lives in the S2 operator (operators/degrade.py) instead of
the trigger, because the outbox INSERT has no NOTIFY size cap. The S2
threshold must stay the reference's 8000 (queries.go:33,41).
"""

from __future__ import annotations

import re

from pqstream_spark.model import PAYLOAD_SIZE_CAP
from pqstream_spark.sources.outbox import (
    CREATE_OUTBOX_SQL,
    DISCOVER_TABLES_SQL,
    TRIGGER_FUNCTION_SQL,
    install_trigger_sql,
    remove_trigger_sql,
)


def _branch(body: str, cond: str) -> str:
    """Text of the IF <cond> THEN ... branch (up to ELSE/END IF)."""
    m = re.search(
        rf"IF\s+{re.escape(cond)}\s+THEN(.*?)(?:ELSE|END IF)",
        body,
        re.S,
    )
    assert m, f"missing branch: IF {cond}"
    return m.group(1)


def test_payload_old_new_selection():
    """queries.go:17-21 — DELETE serializes OLD, everything else NEW.
    to_json (not to_jsonb): the json type matches the reference's
    row_to_json rendering byte-for-byte (compact, column-ordered);
    jsonb would reorder keys and re-space."""
    delete_branch = _branch(TRIGGER_FUNCTION_SQL, "TG_OP = 'DELETE'")
    assert "to_json(OLD)" in delete_branch
    assert "NEW" not in delete_branch
    m = re.search(r"ELSE(.*?)END IF", TRIGGER_FUNCTION_SQL, re.S)
    assert "to_json(NEW)" in m.group(1)
    assert "to_jsonb" not in TRIGGER_FUNCTION_SQL, (
        "jsonb reorders keys / re-spaces — breaks row_to_json parity"
    )


def test_previous_only_on_update():
    """queries.go:22-24 — previous is OLD for UPDATE and absent (SQL
    NULL) otherwise; only the UPDATE branch assigns it."""
    update_branch = _branch(TRIGGER_FUNCTION_SQL, "TG_OP = 'UPDATE'")
    assert "to_json(OLD)" in update_branch
    assignments = re.findall(r"prev_json\s*:=", TRIGGER_FUNCTION_SQL)
    assert len(assignments) == 1, "previous must be assigned in exactly one branch"


def test_id_extracted_from_payload_as_text():
    """queries.go:30 — id is json_extract_path(payload,'id')::text; the
    jsonb equivalent is row_json ->> 'id' (text-returning extraction
    from the SELECTED payload, so DELETE rows carry OLD's id)."""
    assert "row_json ->> 'id'" in TRIGGER_FUNCTION_SQL


def test_envelope_fields_reach_outbox():
    """The INSERT carries every notification envelope field the
    reference builds (queries.go:26-32): schema, table, op, id,
    payload, previous."""
    m = re.search(
        r"INSERT INTO \S+ \(([^)]*)\)\s*VALUES\s*\(([^;]*)\)",
        TRIGGER_FUNCTION_SQL,
        re.S,
    )
    cols = [c.strip() for c in m.group(1).split(",")]
    assert cols == ["schema_name", "table_name", "op", "id", "payload", "previous"]
    vals = m.group(2)
    for v in ("TG_TABLE_SCHEMA", "TG_TABLE_NAME", "TG_OP"):
        assert v in vals


def test_discovery_scope_matches_reference():
    """queries.go:4-9 — public schema, BASE TABLEs only."""
    sql = " ".join(DISCOVER_TABLES_SQL.split())
    assert "information_schema.tables" in sql
    assert "table_schema = 'public'" in sql
    assert "table_type = 'BASE TABLE'" in sql


def test_install_remove_trigger_shape():
    """queries.go:54-63 — install is AFTER INSERT OR UPDATE OR DELETE,
    FOR EACH ROW, EXECUTE PROCEDURE; remove is DROP TRIGGER IF EXISTS;
    both target exactly the named table, identifier-checked."""
    ins = install_trigger_sql("users")
    assert 'AFTER INSERT OR UPDATE OR DELETE ON "users"' in ins
    assert "FOR EACH ROW EXECUTE PROCEDURE" in ins
    assert ins.startswith('DROP TRIGGER IF EXISTS')  # idempotent reinstall
    assert remove_trigger_sql("users").startswith(
        'DROP TRIGGER IF EXISTS pqstream_outbox_trigger ON "users"'
    )
    # round 8: the statement-level TRUNCATE companion (the reference's
    # Operation.TRUNCATE=4, pqstream.proto:23, which its row-level
    # trigger can never fire, queries.go:58-60) installs and removes
    # alongside the row trigger
    assert 'AFTER TRUNCATE ON "users"' in ins
    assert "FOR EACH STATEMENT EXECUTE PROCEDURE pqstream_outbox_truncate()" in ins
    assert "pqstream_outbox_truncate_trigger" in remove_trigger_sql("users")
    for bad in ("users; DROP TABLE x", 'u"sers', "1users"):
        try:
            install_trigger_sql(bad)
            assert False, f"identifier not rejected: {bad!r}"
        except ValueError:
            pass


def test_outbox_ddl_carries_ordering_and_op_domain():
    """The at-least-once upgrade needs a monotonic seq and the
    reference's FULL proto op domain (pqstream.proto:18-24 —
    including TRUNCATE, which round 8 made fireable via the
    statement-level trigger)."""
    assert "seq" in CREATE_OUTBOX_SQL and "BIGSERIAL" in CREATE_OUTBOX_SQL
    assert (
        "CHECK (op IN ('INSERT', 'UPDATE', 'DELETE', 'TRUNCATE'))"
        in CREATE_OUTBOX_SQL
    )


def test_degradation_threshold_is_reference_8000():
    """queries.go:33,41 — both degradation tiers fire at >= 8000 chars;
    ours lives in the S2 operator (documented divergence: the outbox
    INSERT has no NOTIFY cap), but the threshold must stay pinned."""
    assert PAYLOAD_SIZE_CAP == 8000


def test_trigger_function_is_balanced_plpgsql():
    """Cheap structural parse: $$-quoted body, balanced IF/END IF,
    DECLARE before BEGIN, RETURN NULL (AFTER trigger), LANGUAGE
    plpgsql."""
    body = TRIGGER_FUNCTION_SQL
    assert body.count("$$") == 2
    assert len(re.findall(r"\bIF\b(?!\s+EXISTS)", body)) >= 2
    n_if = len(re.findall(r"(?<!END )\bIF\b(?!\s+EXISTS)", body))
    assert body.count("END IF") == n_if
    assert body.index("DECLARE") < body.index("BEGIN")
    assert "RETURN NULL" in body
    assert body.rstrip().endswith("LANGUAGE plpgsql")

"""Wire-format parity: replay the reference README's psql transcript
(/root/reference/README.md:40-59) through the sqlite capture backend
and assert our printed events match the reference's `pqs` output
byte-for-byte (modulo the schema label: sqlite's default schema is
`main` where Postgres's is `public`)."""

from __future__ import annotations

import sqlite3

from pqstream_spark.pipeline import handle_events
from pqstream_spark.sources.outbox_local import (
    LocalCaptureManager,
    LocalOutboxPoller,
    raw_events_from_outbox,
)
from pqstream_spark.streaming.sinks import event_to_json_line

# README.md:53-59, with public → main (see module docstring)
EXPECTED_LINES = [
    '{"schema":"main","table":"notes","op":"INSERT","id":"1","payload":{"created_at":null,"id":1,"note":"here is a sample note"}}',
    '{"schema":"main","table":"notes","op":"INSERT","id":"2","payload":{"created_at":null,"id":2,"note":"here is a sample note"}}',
    '{"schema":"main","table":"notes","op":"UPDATE","id":"1","payload":{"created_at":null,"id":1,"note":"here is an updated note"},"changes":{"note":"here is a sample note"}}',
    '{"schema":"main","table":"notes","op":"DELETE","id":"1","payload":{"created_at":null,"id":1,"note":"here is an updated note"}}',
]


def test_readme_transcript_byte_parity(spark):
    conn = sqlite3.connect(":memory:")
    # the reference's table: create table notes (id serial, created_at
    # timestamp, note text) — server_test.go:26
    conn.execute(
        "CREATE TABLE notes (id INTEGER PRIMARY KEY, created_at TEXT, note TEXT)"
    )
    LocalCaptureManager(conn).install()

    # README.md:41-49 transcript (defaults → NULL/autoincrement)
    conn.execute("INSERT INTO notes VALUES (NULL, NULL, 'here is a sample note')")
    conn.execute("INSERT INTO notes VALUES (NULL, NULL, 'here is a sample note')")
    conn.execute("UPDATE notes SET note = 'here is an updated note' WHERE id = 1")
    conn.execute("DELETE FROM notes WHERE id = 1")
    conn.commit()

    batch = LocalOutboxPoller(conn).read_batch(spark)
    events = handle_events(raw_events_from_outbox(batch), typed_wire=True)
    lines = [
        event_to_json_line(r.asDict()) for r in events.orderBy("seq").collect()
    ]
    assert lines == EXPECTED_LINES
    conn.close()

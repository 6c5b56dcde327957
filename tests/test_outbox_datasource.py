"""The pqstream_outbox Python DataSource: a genuine Structured
Streaming source over the sqlite outbox — engine-tracked offsets,
bounded batches, checkpoint replay (the Spark-native S5)."""

from __future__ import annotations

import os
import sqlite3

import pytest

from pqstream_spark.sources.outbox_datasource import OutboxDataSource
from pqstream_spark.sources.outbox_local import LocalCaptureManager


@pytest.fixture()
def db_path(tmp_path):
    path = str(tmp_path / "app.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE notes (id INTEGER PRIMARY KEY, note TEXT)")
    LocalCaptureManager(conn).install()
    conn.commit()
    conn.close()
    return path


def _insert(db, lo, n):
    conn = sqlite3.connect(db)
    for i in range(lo, lo + n):
        conn.execute(f"INSERT INTO notes VALUES ({i}, 'n{i}')")
    conn.commit()
    conn.close()


def test_stream_reads_live_writes(spark, db_path, tmp_path):
    spark.dataSource.register(OutboxDataSource)
    _insert(db_path, 0, 5)

    stream = (
        spark.readStream.format("pqstream_outbox")
        .option("url", f"sqlite:{db_path}")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("outbox_ds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("select seq, op, id from outbox_ds").collect()
        assert len(first) == 5
        assert {r["op"] for r in first} == {"INSERT"}

        _insert(db_path, 10, 3)  # writes AFTER the stream started
        q.processAllAvailable()
        rows = spark.sql("select seq from outbox_ds order by seq").collect()
        assert [r["seq"] for r in rows] == list(range(1, 9))
    finally:
        q.stop()


def test_checkpoint_restart_resumes_at_offset(spark, db_path, tmp_path):
    spark.dataSource.register(OutboxDataSource)
    ckpt = str(tmp_path / "ckpt")
    _insert(db_path, 0, 4)

    def run_query():
        stream = (
            spark.readStream.format("pqstream_outbox")
            .option("url", f"sqlite:{db_path}")
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _insert(db_path, 10, 2)  # arrives while the query is down
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    seqs = sorted(r["seq"] for r in out.collect())
    # exactly-once into the file sink: no re-read of batch 1 after restart
    assert seqs == list(range(1, 7))


def test_batch_read_backfill(spark, db_path):
    """spark.read.format("pqstream_outbox") — the bounded backfill
    scan: full outbox by default, sinceSeq/untilSeq select a window,
    partitioned without overlap."""
    spark.dataSource.register(OutboxDataSource)
    _insert(db_path, 0, 12)
    df = (
        spark.read.format("pqstream_outbox")
        .option("url", f"sqlite:{db_path}")
        .option("numPartitions", "3")
        .load()
    )
    assert sorted(r["seq"] for r in df.collect()) == list(range(1, 13))
    windowed = (
        spark.read.format("pqstream_outbox")
        .option("url", f"sqlite:{db_path}")
        .option("sinceSeq", "4")
        .option("untilSeq", "9")
        .load()
    )
    assert sorted(r["seq"] for r in windowed.collect()) == list(range(5, 10))


def test_max_rows_per_batch_bounds_each_microbatch(spark, db_path, tmp_path):
    """Backlog arriving while the query runs drains in capped batches
    (rate limiting advances the reported offset, never skips rows)."""
    spark.dataSource.register(OutboxDataSource)
    stream = (
        spark.readStream.format("pqstream_outbox")
        .option("url", f"sqlite:{db_path}")
        .option("maxRowsPerBatch", "4")
        .load()
    )
    batches: list[int] = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: batches.append(df.count())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # cap base established on empty outbox
        _insert(db_path, 0, 10)
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(batches) == 10
    assert max(b for b in batches if b) <= 4, f"rate cap violated: {batches}"


def test_consumer_key_collision_detected(db_path):
    """VERDICT r8 #3: two LIVE readers sharing one consumer key share
    the retention row (the faster query's commit could let compact()
    prune rows the slower one hasn't checkpointed), and the engine
    hands the reader no query-stable identity to auto-derive distinct
    defaults from — so the lease guard must fail the collision loudly
    at the next offset write."""
    from pqstream_spark.sources.outbox_datasource import OutboxStreamReader

    _insert(db_path, 1, 3)
    a = OutboxStreamReader({"url": f"sqlite:{db_path}"})
    b = OutboxStreamReader({"url": f"sqlite:{db_path}"})  # takeover stamp: tolerated
    with pytest.raises(RuntimeError, match="distinct") :
        for _ in range(4):  # both alive and advancing → alternation trips
            a.commit({"seq": 1})
            b.commit({"seq": 1})


def test_consumer_key_restart_and_distinct_keys_ok(db_path):
    """The lease tolerates exactly the legitimate cases: a restart
    (crashed predecessor's stamp = one-shot takeover) and distinct
    consumer keys."""
    from pqstream_spark.sources.outbox_datasource import OutboxStreamReader

    _insert(db_path, 1, 3)
    a = OutboxStreamReader({"url": f"sqlite:{db_path}"})
    a.commit({"seq": 1})
    # "crash" a; a restart with the same (default) key must not raise
    a2 = OutboxStreamReader({"url": f"sqlite:{db_path}"})
    for _ in range(4):
        a2.commit({"seq": 2})
    # distinct keys: two live queries coexist indefinitely
    c = OutboxStreamReader({"url": f"sqlite:{db_path}", "consumer": "c1"})
    d = OutboxStreamReader({"url": f"sqlite:{db_path}", "consumer": "c2"})
    for _ in range(4):
        c.commit({"seq": 3})
        d.commit({"seq": 3})


def test_stream_reader_holds_compaction_until_commit(db_path):
    """Retention contract (mirrors the PG reader): constructing the
    stream reader registers its delivered consumer at 0, so a durable
    poller's compact() on the same outbox cannot prune rows the query
    has not committed; commit() advances the delivered offset and
    releases them."""
    from pqstream_spark.sources.outbox_datasource import OutboxStreamReader
    from pqstream_spark.sources.outbox_local import (
        LOCAL_OUTBOX_TABLE,
        LocalOutboxPoller,
    )

    _insert(db_path, 1, 5)
    reader = OutboxStreamReader({"url": f"sqlite:{db_path}"})
    assert int(reader.latestOffset()["seq"]) == 5

    conn = sqlite3.connect(db_path)
    try:
        poller = LocalOutboxPoller.open_durable(conn, consumer="worker")
        poller.rewind(5)  # worker fully caught up

        def remaining():
            return conn.execute(
                f"SELECT count(*) FROM {LOCAL_OUTBOX_TABLE}"
            ).fetchone()[0]

        # the stream has reported but not committed: nothing prunes
        assert poller.compact() == 0 and remaining() == 5
        reader.commit({"seq": 5})
        assert poller.compact() == 5 and remaining() == 0
    finally:
        conn.close()

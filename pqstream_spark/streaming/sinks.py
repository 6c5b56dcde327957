"""K1/K2/F3 — sinks (SURVEY.md §2.1).

K1 (stdout one-JSON-per-line, `/root/reference/cmd/pqs/main.go:66-76`)
becomes a foreachBatch writer emitting JSON-lines files in `seq` order;
K2 (STOMP forwarder, `contrib/cmd/pqsamq/main.go:69-94`) and the gRPC
bridge (F3) are `foreach`-style callback sinks — the transport client
is injected, and import-gated stubs stand in for libraries this
container doesn't ship (stomp.py / grpcio).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_to_json_line(row: dict) -> str:
    """Render one Event the way the pqs CLI prints it (jsonpb-ish:
    envelope fields + payload/changes objects, no nulls for absent)."""
    out: dict = {
        "schema": row.get("schema_name"),
        "table": row.get("table_name"),
        "op": row.get("op"),
        "id": row.get("id"),
    }
    if row.get("payload") is not None:
        out["payload"] = row["payload"]
    if row.get("changes") is not None:
        out["changes"] = row["changes"]
    return json.dumps(out, separators=(",", ":"), sort_keys=True)


def jsonl_dir_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: one .jsonl file per micro-batch, rows in seq
    order. Global order across a micro-batch needs a single partition —
    acceptable ONLY at the final sink hop (SURVEY.md §3.4); everything
    upstream stays parallel."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        rows = [r.asDict() for r in batch_df.orderBy("seq").collect()]
        if not rows:
            return
        path = os.path.join(out_dir, f"batch-{epoch_id:08d}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(event_to_json_line(r) + "\n")

    return write


def callback_sink(cb: Callable[[dict], bool]) -> Callable[[DataFrame, int], None]:
    """F3-style bridge: invoke a callback per event (in seq order).
    Returning False unsubscribes logically — parity with
    subscription.fn (server.go:30-33); here it just stops forwarding
    the rest of the batch."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        for r in batch_df.orderBy("seq").toLocalIterator():
            if not cb(r.asDict()):
                break

    return write


class StompForwarder:
    """K2 parity (pqsamq). Usable with any object exposing
    .send(destination, body); the real STOMP client is optional."""

    def __init__(self, queue: str, client=None, addr: str | None = None):
        self.queue = queue
        if client is None:
            try:  # pragma: no cover - stomp.py not in this container
                import stomp  # type: ignore

                client = stomp.Connection([(addr or "localhost", 61613)])
                client.connect(wait=True)
            except ImportError as exc:
                raise NotImplementedError(
                    "stomp.py not installed; inject a client with "
                    ".send(destination, body)"
                ) from exc
        self.client = client

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        def write(batch_df: DataFrame, epoch_id: int) -> None:
            for r in batch_df.orderBy("seq").toLocalIterator():
                self.client.send(self.queue, event_to_json_line(r.asDict()))

        return write


def upsert_parquet_sink(out_dir: str, keys: list[str]) -> Callable[[DataFrame, int], None]:
    """Streaming materialized view: merge each update-mode micro-batch
    into a parquet table by key (rows in the batch REPLACE rows with the
    same key — update-mode aggregates are cumulative, so last write
    wins).

    This is MERGE-INTO maintenance without a table format: new batch ∪
    (old table anti-join batch keys), written to a temp dir and swapped
    in. At production scale the swap becomes a Delta/Iceberg MERGE and
    the anti-join a key-range rewrite; the dataflow is identical.
    """
    import shutil

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint()  # detach from the stream plan
        if os.path.isdir(out_dir):
            old = spark.read.parquet(out_dir)
            merged = old.join(batch.select(*keys), keys, "left_anti").unionByName(
                batch
            )
        else:
            merged = batch
        tmp = out_dir.rstrip("/") + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)

    return write


def kafka_writer(df: DataFrame, topic: str, servers: str):
    """Idiomatic K2/F3 replacement at scale: key by table for per-table
    order, value = JSON event. Needs the spark-sql-kafka package on the
    classpath (not in this container — plan-only here)."""
    out = df.select(
        F.col("table_name").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
    )

"""Deterministic CDC changelog synthesized from the `events` table.

The reference's source is a Postgres trigger emitting one JSON envelope
per row mutation (`/root/reference/queries.go:10-53`). The driver's
testdata has no live Postgres, so we derive an equivalent change-log
from `events.parquet` with a pure, SQL-expressible mapping — the SAME
mapping is written once here for Spark and once as a DuckDB CTE
(`ORACLE_CHANGELOG_CTE`) so the oracle compare is apples-to-apples.

Mapping (seed data → CDC envelope):
- seq        = event_id                       (monotonic commit order)
- ts         = ts                             (capture time)
- schema     = 'public'
- table      = users|notes|orders by user_id % 3
- op         = signup/purchase→INSERT, click/view→UPDATE, error→DELETE
  (mirrors the reference's produced domain: INSERT/UPDATE/DELETE only,
  queries.go:58-60)
- id         = CAST(user_id AS STRING)        (text id, queries.go:30)
- row fields = id, note ('note-'||k from props JSON), val (value as
  DECIMAL(10,2) string — decimal so Spark and DuckDB render identically)
- previous (UPDATE only): note differs unless k%3=0, val differs when
  k%2=0 — gives the merge-patch operator real changed/unchanged/empty
  cases.

DELETE carries the OLD row as payload (queries.go:17-18); previous is
NULL for non-UPDATE ops (queries.go:22-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# DuckDB CTE computing the same changelog. Keep in lockstep with
# build_changelog() below — every expression has a 1:1 counterpart.
ORACLE_CHANGELOG_CTE = """
changelog AS (
  SELECT
    event_id AS seq,
    ts,
    'public' AS schema_name,
    CASE user_id % 3 WHEN 0 THEN 'users' WHEN 1 THEN 'notes' ELSE 'orders' END AS table_name,
    CASE event_type
      WHEN 'signup' THEN 'INSERT' WHEN 'purchase' THEN 'INSERT'
      WHEN 'click' THEN 'UPDATE' WHEN 'view' THEN 'UPDATE'
      ELSE 'DELETE' END AS op,
    CAST(user_id AS VARCHAR) AS id,
    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
    CAST(value AS DECIMAL(10,2)) AS val
  FROM events
),
changelog_rows AS (
  SELECT
    seq, ts, schema_name, table_name, op, id, k,
    CAST(val AS VARCHAR) AS new_val,
    'note-' || CAST(k AS VARCHAR) AS new_note,
    CASE WHEN k % 3 = 0 THEN 'note-' || CAST(k AS VARCHAR)
         ELSE 'note-' || CAST(k + 1 AS VARCHAR) END AS prev_note,
    CASE WHEN k % 2 = 0 THEN CAST(val + CAST('1.00' AS DECIMAL(3,2)) AS VARCHAR)
         ELSE CAST(val AS VARCHAR) END AS prev_val
  FROM changelog
)
"""


def build_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → RawEvent-shaped DataFrame (see model.RAW_EVENT_SCHEMA).

    Narrow (no shuffle): one projection over the scan, so at 100 TB this
    is embarrassingly parallel and whole-stage-codegen'd end to end.
    """
    return changelog_from_events(load_table(spark, sf_dir, "events"))


def changelog_from_events(ev: DataFrame) -> DataFrame:
    """The pure transform — works identically on a batch DataFrame and a
    Structured Streaming one (batch/stream unification: the streaming
    wrapper in streaming/source.py feeds this the readStream frame)."""
    # try_cast, not cast: under ANSI mode (Spark 4 default) a single
    # malformed props value would fail the whole job — poison rows must
    # degrade to NULL instead (the oracle CTE is unaffected: DuckDB's
    # CAST only ever sees the well-formed synthetic data)
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    val = F.expr("try_cast(value AS DECIMAL(10,2))")

    base = ev.select(
        F.col("event_id").alias("seq"),
        F.col("ts"),
        F.lit("public").alias("schema_name"),
        F.element_at(
            F.array(F.lit("users"), F.lit("notes"), F.lit("orders")),
            (F.col("user_id") % 3 + 1).cast("int"),
        ).alias("table_name"),
        F.when(F.col("event_type").isin("signup", "purchase"), F.lit("INSERT"))
        .when(F.col("event_type").isin("click", "view"), F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
        .alias("op"),
        F.col("user_id").cast("string").alias("id"),
        k.alias("k"),
        val.alias("val"),
    )

    new_note = F.concat(F.lit("note-"), F.col("k").cast("string"))
    prev_note = F.when(F.col("k") % 3 == 0, new_note).otherwise(
        F.concat(F.lit("note-"), (F.col("k") + 1).cast("string"))
    )
    new_val = F.col("val").cast("string")
    prev_val = F.when(
        F.col("k") % 2 == 0,
        (F.col("val") + F.lit("1.00").cast("decimal(3,2)")).cast("string"),
    ).otherwise(new_val)

    payload = F.create_map(
        F.lit("id"), F.col("id"),
        F.lit("note"), new_note,
        F.lit("val"), new_val,
    )
    previous = F.when(
        F.col("op") == "UPDATE",
        F.create_map(
            F.lit("id"), F.col("id"),
            F.lit("note"), prev_note,
            F.lit("val"), prev_val,
        ),
    )

    return base.select(
        "seq",
        "ts",
        "schema_name",
        "table_name",
        "op",
        "id",
        payload.alias("payload"),
        previous.alias("previous"),
        F.to_json(payload).alias("payload_json"),
        F.when(F.col("op") == "UPDATE", F.to_json(previous)).alias("previous_json"),
    )

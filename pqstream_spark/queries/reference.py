"""Reference-parity queries — one per operator row in SURVEY.md §2.1.

Every query here has a DuckDB oracle built on the same changelog CTE
(`ORACLE_CHANGELOG_CTE`) so the comparison exercises OUR operator
implementations against an independent SQL formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.degrade import degrade_payload
from ..operators.fallback import fallback_lookup
from ..operators.filters import filter_tables
from ..operators.merge_patch import with_changes
from ..operators.redact import redact_fields
from ..sources.changelog import ORACLE_CHANGELOG_CTE, build_changelog
from ..sources.tables import TABLE_NAMES, load_table

WITH_CHANGELOG = "WITH " + ORACLE_CHANGELOG_CTE


# --- P1: deserialize/parse (server.go:219-222) -------------------------------

def q_p1_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = build_changelog(spark, sf_dir)
    return raw.select(
        "seq",
        "ts",
        "schema_name",
        "table_name",
        "op",
        "id",
        F.element_at("payload", "note").alias("note"),
        F.element_at("payload", "val").alias("val"),
    )


ORACLE_P1 = WITH_CHANGELOG + """
SELECT seq, ts, schema_name, table_name, op, id,
       new_note AS note, new_val AS val
FROM changelog_rows
"""


# --- P2: UPDATE merge patch (patch.go:11-40, server.go:235-241) ---------------

def q_p2_merge_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = with_changes(build_changelog(spark, sf_dir))
    return ev.filter(F.col("op") == "UPDATE").select(
        "seq",
        "id",
        F.element_at("changes", "note").alias("old_note"),
        F.element_at("changes", "val").alias("old_val"),
        F.size("changes").alias("n_changed"),
    )


ORACLE_P2 = WITH_CHANGELOG + """
SELECT seq, id,
       CASE WHEN prev_note <> new_note THEN prev_note END AS old_note,
       CASE WHEN prev_val <> new_val THEN prev_val END AS old_val,
       (CASE WHEN prev_note <> new_note THEN 1 ELSE 0 END
        + CASE WHEN prev_val <> new_val THEN 1 ELSE 0 END) AS n_changed
FROM changelog_rows WHERE op = 'UPDATE'
"""


# --- R1: field redaction (redactions.go:33-52) --------------------------------

REDACT_CFG = {"public": {"users": ["note"], "orders": ["val"]}}


def q_r1_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = redact_fields(build_changelog(spark, sf_dir), REDACT_CFG)
    return raw.select(
        "seq",
        "table_name",
        "op",
        F.element_at("payload", "note").alias("note"),
        F.element_at("payload", "val").alias("val"),
        F.element_at("previous", "note").alias("prev_note"),
    )


ORACLE_R1 = WITH_CHANGELOG + """
SELECT seq, table_name, op,
       CASE WHEN table_name <> 'users' THEN new_note END AS note,
       CASE WHEN table_name <> 'orders' THEN new_val END AS val,
       CASE WHEN op = 'UPDATE' AND table_name <> 'users' THEN prev_note END AS prev_note
FROM changelog_rows
"""


# --- S2: payload degradation (queries.go:33-47) -------------------------------
# The synthetic changelog payloads are tiny, so the degradation tiers are
# exercised on a documents-derived raw stream whose payload_json spans the
# 8 KB cap (repeat(text, doc_id % 30)).

def _degrade_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload_json = F.repeat(F.col("text"), (F.col("doc_id") % 30).cast("int"))
    return docs.select(
        F.col("doc_id").alias("seq"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("public").alias("schema_name"),
        F.col("source").alias("table_name"),
        F.lit("UPDATE").alias("op"),
        F.col("doc_id").cast("string").alias("id"),
        F.create_map(F.lit("text"), F.col("text")).alias("payload"),
        F.create_map(F.lit("text"), F.col("text")).alias("previous"),
        payload_json.alias("payload_json"),
        payload_json.alias("previous_json"),
    )


def q_s2_degrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = degrade_payload(_degrade_input(spark, sf_dir))
    return out.select(
        "seq",
        "degraded_tier",
        F.col("payload").isNotNull().alias("has_payload"),
        F.col("previous").isNotNull().alias("has_previous"),
    )


# Derived from the reference trigger, independently of the engine:
# reconstruct the exact `notification::text` Postgres renders for
# json_build_object (`{"k" : v, ...}` — space around colons, ", "
# between pairs, text args quoted, json args verbatim) and apply the
# two cascading `length(...) >= 8000` checks (queries.go:26-47).
ORACLE_S2 = """
WITH raw AS (
  SELECT doc_id AS seq,
         '{"schema" : "public", "table" : "' || source ||
         '", "op" : "UPDATE", "id" : "' || CAST(doc_id AS VARCHAR) || '"' AS head,
         repeat(text, CAST(doc_id % 30 AS INTEGER)) AS body
  FROM documents
), lens AS (
  SELECT seq,
         length(head || ', "payload" : ' || body || ', "previous" : ' || body || '}') AS len_full,
         length(head || ', "payload" : ' || body || '}') AS len_no_prev
  FROM raw
)
SELECT seq,
       CASE WHEN len_full >= 8000 AND len_no_prev >= 8000 THEN 2
            WHEN len_full >= 8000 THEN 1
            ELSE 0 END AS degraded_tier,
       NOT (len_full >= 8000 AND len_no_prev >= 8000) AS has_payload,
       len_full < 8000 AS has_previous
FROM lens
"""


# --- P3: fallback point lookup (server.go:194-212) ----------------------------
# Simulate S2-dropped payloads: user_id % 7 = 0 events lose their payload,
# then recover it from `customer` by id (DELETEs stay unrecoverable).

def q_p3_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = build_changelog(spark, sf_dir)
    dropped = raw.withColumn(
        "payload",
        F.when(F.col("id").cast("long") % 7 == 0, F.lit(None)).otherwise(
            F.col("payload")
        ),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), "c_name", "c_mktsegment"
    )
    out = fallback_lookup(dropped, cust)
    return out.select(
        "seq",
        "op",
        F.element_at("payload", "c_name").alias("recovered_name"),
        F.element_at("payload", "note").alias("note"),
    )


ORACLE_P3 = WITH_CHANGELOG + """
SELECT seq, op,
       CASE WHEN CAST(id AS BIGINT) % 7 = 0 AND op <> 'DELETE'
            THEN (SELECT c_name FROM customer c WHERE c.c_custkey = CAST(r.id AS BIGINT))
       END AS recovered_name,
       CASE WHEN CAST(id AS BIGINT) % 7 <> 0 THEN new_note END AS note
FROM changelog_rows r
"""


# --- F2: per-client table filter (server.go:284-302) --------------------------

def q_f2_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = filter_tables(build_changelog(spark, sf_dir), "^(users|notes)$")
    return ev.groupBy("table_name", "op").agg(F.count("*").alias("n"))


ORACLE_F2 = WITH_CHANGELOG + """
SELECT table_name, op, count(*) AS n
FROM changelog_rows
WHERE regexp_matches(table_name, '^(users|notes)$')
GROUP BY table_name, op
"""


# --- S3: source discovery + table regexp (queries.go:4-9, server.go:149-166)
# merged with the file-format layer check (sources/formats.py): the
# engine's landing formats (CSV interchange, hive-partitioned parquet)
# are exercised by writing the events table out and reading it back
# through the format readers — the oracle computes the same aggregates
# from the ORIGINAL parquet, so any roundtrip loss (timestamp precision,
# double rendering, partition column re-typing) breaks the value hash.
# The pruned variant filters on the hive partition column, so the read
# plans a partition-pruned scan (pinned in tests/test_plans.py).

PRUNE_TYPES = ("click", "purchase")


def q_s3_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..sources import formats

    catalog = spark.createDataFrame(
        [(n,) for n in TABLE_NAMES], "table_name string"
    )
    discovery = filter_tables(catalog, "^(part|orders|lineitem|events)$").select(
        F.lit("discovery").alias("variant"),
        F.col("table_name").alias("name"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("double").alias("sum_val"),
        F.lit(None).cast("timestamp").alias("max_ts"),
    )

    ev = load_table(spark, sf_dir, "events")
    # per-process landing dir: two concurrent evaluators of this entry
    # (pytest + check_oracle, say) must not overwrite files the other's
    # lazily-evaluated scan is still reading
    base = os.path.join(
        tempfile.gettempdir(),
        "pqstream_formats_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + f"_{os.getpid()}",
    )
    csv_dir, part_dir = os.path.join(base, "csv"), os.path.join(base, "part")
    formats.write_events(ev, csv_dir, "csv")
    formats.partitioned_parquet_writer(ev, part_dir, by="event_type")

    def agg(df: DataFrame, variant: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_val"),
            F.max("ts").alias("max_ts"),
        ).select(
            F.lit(variant).alias("variant"),
            F.col("event_type").alias("name"),
            "n",
            "sum_val",
            "max_ts",
        )

    csv_back = agg(formats.read_events_csv(spark, csv_dir), "csv_roundtrip")
    pruned = agg(
        spark.read.parquet(part_dir).filter(F.col("event_type").isin(*PRUNE_TYPES)),
        "parquet_pruned",
    )
    return discovery.unionAll(csv_back).unionAll(pruned)


ORACLE_S3 = (
    "SELECT 'discovery' AS variant, table_name AS name, CAST(NULL AS BIGINT) AS n, "
    "CAST(NULL AS DOUBLE) AS sum_val, CAST(NULL AS TIMESTAMP) AS max_ts "
    "FROM (VALUES "
    + ", ".join(f"('{n}')" for n in TABLE_NAMES)
    + ") AS t(table_name) WHERE regexp_matches(table_name, '^(part|orders|lineitem|events)$')"
    + """
UNION ALL
SELECT 'csv_roundtrip' AS variant, event_type AS name, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
       max(ts) AS max_ts
FROM events GROUP BY event_type
UNION ALL
SELECT 'parquet_pruned' AS variant, event_type AS name, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
       max(ts) AS max_ts
FROM events WHERE event_type IN ('click', 'purchase') GROUP BY event_type
"""
)


# --- K1: one-JSON-per-line sink rendering (cmd/pqs/main.go:66-76) --------------

def q_k1_jsonline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = with_changes(build_changelog(spark, sf_dir))
    line = F.concat(
        F.lit('{"schema":"'), "schema_name",
        F.lit('","table":"'), "table_name",
        F.lit('","op":"'), "op",
        F.lit('","id":"'), "id",
        F.lit('","payload":'), F.coalesce(F.to_json("payload"), F.lit("null")),
        F.when(
            F.col("op") == "UPDATE",
            F.concat(F.lit(',"changes":'), F.to_json("changes")),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    return ev.select("seq", line.alias("line"))


# to_json of the changes map renders keys in (note, val) construction
# order with only changed keys present; replicate with concat.
ORACLE_K1 = WITH_CHANGELOG + """
SELECT seq,
  '{"schema":"' || schema_name || '","table":"' || table_name ||
  '","op":"' || op || '","id":"' || id ||
  '","payload":{"id":"' || id || '","note":"' || new_note || '","val":"' || new_val || '"}' ||
  CASE WHEN op = 'UPDATE' THEN
    ',"changes":{' ||
    CASE WHEN prev_note <> new_note THEN '"note":"' || prev_note || '"' ELSE '' END ||
    CASE WHEN prev_note <> new_note AND prev_val <> new_val THEN ',' ELSE '' END ||
    CASE WHEN prev_val <> new_val THEN '"val":"' || prev_val || '"' ELSE '' END ||
    '}'
  ELSE '' END || '}' AS line
FROM changelog_rows
"""


# --- CDC materialization: changelog → current state (operators/materialize.py) -

def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.materialize import materialize_current_state

    return materialize_current_state(build_changelog(spark, sf_dir))


ORACLE_MATERIALIZE = WITH_CHANGELOG + """
SELECT table_name, id, seq, op, payload_json FROM (
  SELECT table_name, id, seq, op,
         '{"id":"' || id || '","note":"' || new_note || '","val":"' || new_val || '"}' AS payload_json,
         ROW_NUMBER() OVER (PARTITION BY table_name, id ORDER BY seq DESC) AS rn
  FROM changelog_rows
) latest WHERE rn = 1 AND op <> 'DELETE'
"""


def register(queries: dict, oracles: dict) -> None:
    queries["cdc_materialize_state"] = q_cdc_materialize
    oracles["cdc_materialize_state"] = ORACLE_MATERIALIZE
    queries["p1_parse_envelope"] = q_p1_parse
    oracles["p1_parse_envelope"] = ORACLE_P1
    queries["p2_merge_patch"] = q_p2_merge_patch
    oracles["p2_merge_patch"] = ORACLE_P2
    queries["r1_redact"] = q_r1_redact
    oracles["r1_redact"] = ORACLE_R1
    queries["s2_degrade"] = q_s2_degrade
    oracles["s2_degrade"] = ORACLE_S2
    queries["p3_fallback_lookup"] = q_p3_fallback
    oracles["p3_fallback_lookup"] = ORACLE_P3
    queries["f2_table_filter"] = q_f2_table_filter
    oracles["f2_table_filter"] = ORACLE_F2
    queries["s3_source_discovery"] = q_s3_discovery
    oracles["s3_source_discovery"] = ORACLE_S3
    queries["k1_jsonline_sink"] = q_k1_jsonline
    oracles["k1_jsonline_sink"] = ORACLE_K1

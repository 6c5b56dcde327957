"""R1 — field redaction (projection-negation).

Reference: `/root/reference/redactions.go:33-52` deletes configured
fields from `payload` and `previous` before anything downstream; config
shape `{schema: {table: [fields]}}` (`redactions.go:10-12`), decoded
from a JSON string (`redactions.go:15-22`).

Spark-first design: the config becomes a tiny DataFrame
(schema_name, table_name, redacted_fields array) broadcast-joined to
the stream, then `map_filter` drops matching keys JVM-side — no Python
in the hot path, and the join stays a broadcast at any stream scale
because the config is O(tables), not O(events).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# type alias matching redactions.go:12 FieldRedactions
FieldRedactions = dict[str, dict[str, list[str]]]


def decode_redactions(s: str) -> FieldRedactions:
    """JSON flag text → config; mirrors DecodeRedactions (redactions.go:15-22)."""
    cfg = json.loads(s)
    if not isinstance(cfg, dict):
        raise ValueError("redactions config must be a JSON object")
    return cfg


def redactions_df(spark: SparkSession, cfg: FieldRedactions) -> DataFrame:
    rows = [
        (schema, table, list(fields))
        for schema, tables in cfg.items()
        for table, fields in tables.items()
    ]
    return spark.createDataFrame(
        rows, "schema_name string, table_name string, redacted_fields array<string>"
    )


def redact_fields(df: DataFrame, cfg: FieldRedactions) -> DataFrame:
    """Drop redacted keys from payload and previous.

    Non-matching (schema, table) pass through unchanged, including
    events with NULL payloads — parity with redactions.go:33-48.
    """
    spark = df.sparkSession
    if not cfg:
        return df
    conf = redactions_df(spark, cfg).withColumnRenamed("schema_name", "_r_schema")
    joined = df.join(
        F.broadcast(conf),
        (df["schema_name"] == conf["_r_schema"])
        & (df["table_name"] == conf["table_name"]),
        "left",
    ).drop("_r_schema").drop(conf["table_name"])

    def scrub(col_name: str):
        col = F.col(col_name)
        return (
            F.when(F.col("redacted_fields").isNull() | col.isNull(), col)
            .otherwise(
                F.map_filter(
                    col, lambda k, _v: ~F.array_contains(F.col("redacted_fields"), k)
                )
            )
            .alias(col_name)
        )

    out_cols = [
        scrub(c) if c in ("payload", "previous") else F.col(c)
        for c in df.columns
    ]
    out = joined.select(*out_cols, F.col("redacted_fields"))
    # Keep the JSON projections consistent with the scrubbed maps — but
    # ONLY on rows of a redacted (schema, table) whose map was actually
    # scrubbed. Rebuilding unconditionally would replace the original
    # JSON (which preserves nested/typed fidelity — see model.py) with a
    # flat map rendering for every row, and null the JSON on rows whose
    # map is NULL but whose json text was not.
    for map_col, json_col in (("payload", "payload_json"), ("previous", "previous_json")):
        if json_col in out.columns:
            out = out.withColumn(
                json_col,
                F.when(
                    F.col("redacted_fields").isNotNull()
                    & F.col(map_col).isNotNull(),
                    F.to_json(F.col(map_col)),
                ).otherwise(F.col(json_col)),
            )
    return out.drop("redacted_fields")

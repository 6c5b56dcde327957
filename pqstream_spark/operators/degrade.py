"""S2 — payload degradation (8 KB NOTIFY cap parity).

Reference: the trigger builds `json_build_object('schema', …, 'table',
…, 'op', …, 'id', …, 'payload', payload, 'previous', previous)` and
checks `length(notification::text) >= 8000`; if over, it rebuilds
without `previous`, and if STILL over, keeps only the 4-field envelope
(`/root/reference/queries.go:26-47`). An outbox/Kafka source has no
such cap, so in our engine this is an *optional* wire-compat transform
(SURVEY.md §2 S2) — pure `when()` expressions, no UDF.

The size checks here are DERIVED from the trigger, not approximated:
`_envelope_text` reconstructs the exact text Postgres renders for that
json_build_object — `{"k" : v, "k2" : v2}` (the json type prints a
space around each colon and after each comma), text args as escaped
JSON strings, json args embedded verbatim (`row_to_json` output is
compact), SQL NULLs as `null`, and the tier-1 rebuild OMITS the
previous key entirely rather than nulling it. `length()` in the
trigger is character count (not octets) — matched by `F.length`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import PAYLOAD_SIZE_CAP


def _json_str(c: Column) -> Column:
    """Postgres rendering of a TEXT arg inside json_build_object:
    quoted + escaped JSON string, or `null` for SQL NULL."""
    esc = F.regexp_replace(
        F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"'
    )
    return F.when(c.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('"'), esc, F.lit('"'))
    )


def _envelope_text(with_payload: bool, with_previous: bool) -> Column:
    """The exact `notification::text` the trigger measures, per tier."""
    pairs = [
        ("schema", _json_str(F.col("schema_name"))),
        ("table", _json_str(F.col("table_name"))),
        ("op", _json_str(F.col("op"))),
        ("id", _json_str(F.col("id"))),
    ]
    if with_payload:
        pairs.append(("payload", F.coalesce(F.col("payload_json"), F.lit("null"))))
    if with_previous:
        pairs.append(("previous", F.coalesce(F.col("previous_json"), F.lit("null"))))
    inner = F.concat_ws(
        ", ", *[F.concat(F.lit(f'"{k}" : '), v) for k, v in pairs]
    )
    return F.concat(F.lit("{"), inner, F.lit("}"))


def degrade_payload(df: DataFrame, cap: int = PAYLOAD_SIZE_CAP) -> DataFrame:
    """Two cascading size checks, exactly the trigger's tiers.

    Tier 1 (full envelope >= cap): drop `previous` (queries.go:33-39).
    Tier 2 (still >= cap without previous): drop `payload` too, keeping
    only the envelope {schema, table, op, id} (queries.go:41-46).
    """
    tier1 = F.length(_envelope_text(True, True)) >= cap
    tier2 = F.length(_envelope_text(True, False)) >= cap

    def tiered(col: str, drop_on_tier1: bool):
        c = F.col(col)
        if drop_on_tier1:
            return F.when(tier1, F.lit(None)).otherwise(c)
        return F.when(tier1 & tier2, F.lit(None)).otherwise(c)

    return (
        df.withColumn("degraded_tier",
                      F.when(tier1 & tier2, F.lit(2))
                       .when(tier1, F.lit(1))
                       .otherwise(F.lit(0)))
        .withColumn("previous", tiered("previous", True))
        .withColumn("previous_json", tiered("previous_json", True))
        .withColumn("payload", tiered("payload", False))
        .withColumn("payload_json", tiered("payload_json", False))
    )

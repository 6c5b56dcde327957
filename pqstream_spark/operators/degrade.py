"""S2 — payload degradation (8 KB NOTIFY cap parity).

Reference: the trigger re-builds the envelope without `previous` when
it reaches 8000 bytes, and drops `payload` too if still over
(`/root/reference/queries.go:33-47`). An outbox/Kafka source has no
such cap, so in our engine this is an *optional* wire-compat transform
(SURVEY.md §2 S2) — pure `when()` expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import PAYLOAD_SIZE_CAP


def _envelope_len(with_previous: bool, with_payload: bool) -> F.Column:
    # approximate the trigger's octet_length(jsonb_build_object(...)::text)
    # with the JSON text lengths we already carry
    parts = [
        F.length(F.concat_ws("", "schema_name", "table_name", "op", "id")) + F.lit(64)
    ]
    if with_payload:
        parts.append(F.coalesce(F.length("payload_json"), F.lit(0)))
    if with_previous:
        parts.append(F.coalesce(F.length("previous_json"), F.lit(0)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def degrade_payload(df: DataFrame, cap: int = PAYLOAD_SIZE_CAP) -> DataFrame:
    """Two cascading size checks, exactly the trigger's tiers.

    Tier 1 (>= cap with previous): drop `previous`.
    Tier 2 (still >= cap): drop `payload` too, keeping only the
    envelope {schema, table, op, id} — queries.go:41-46.
    """
    tier1 = _envelope_len(True, True) >= cap
    tier2 = _envelope_len(False, True) >= cap

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

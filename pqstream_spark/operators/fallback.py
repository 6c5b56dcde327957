"""P3 — fallback enrichment (point lookup for degraded events).

Reference: when S2 dropped the payload but kept the id, the server
re-SELECTs the row by primary key from the live table
(`/root/reference/server.go:194-212`, SQL at `queries.go:62-64`).
DELETEd rows are unrecoverable (the row is gone).

Spark-first: instead of a per-event synchronous round-trip (a driver-
side loop — the anti-pattern at scale), this is a stream-static LEFT
JOIN against the current table snapshot, keyed by id. Only events that
actually lost their payload join (pre-filter keeps the join input
small); the lookup side is a keyed dimension read that AQE will
broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fallback_lookup(
    events: DataFrame,
    lookup: DataFrame,
    id_col: str = "id",
    payload_expr: Column | None = None,
) -> DataFrame:
    """Recover dropped payloads by joining `lookup` on its `id` column.

    `lookup` must expose: id (string-castable) plus the row columns; the
    recovered payload is a map of all non-id lookup columns (or a custom
    `payload_expr`). Rows with op == DELETE stay NULL — unrecoverable,
    parity with server.go:205-209.
    """
    needs = events.filter(F.col("payload").isNull() & F.col("id").isNotNull())
    ok = events.filter(~(F.col("payload").isNull() & F.col("id").isNotNull()))

    if payload_expr is None:
        cols = [c for c in lookup.columns if c != id_col]
        kv = []
        for c in cols:
            kv.extend([F.lit(c), F.col(c).cast("string")])
        payload_expr = F.create_map(*kv)

    side = lookup.select(
        F.col(id_col).cast("string").alias("_fb_id"),
        payload_expr.alias("_fb_payload"),
    )
    recovered = (
        needs.join(side, needs["id"] == side["_fb_id"], "left")
        .withColumn(
            "payload",
            F.when(F.col("op") == "DELETE", F.lit(None)).otherwise(F.col("_fb_payload")),
        )
        .withColumn(
            "payload_json",
            F.when(F.col("payload").isNotNull(), F.to_json(F.col("payload"))),
        )
        .drop("_fb_id", "_fb_payload")
    )
    return ok.unionByName(recovered)

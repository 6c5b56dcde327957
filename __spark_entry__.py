"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``pqstream_spark/`` — this module is a thin
re-export of its query catalog.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full handleEvent chain (SURVEY §3.2) —
    parse → redact → merge-patch → per-client table filter — on the
    sf0.001 changelog, rendered as the pqs CLI would print it."""
    from pqstream_spark.pipeline import handle_events
    from pqstream_spark.sources.changelog import build_changelog

    raw = build_changelog(spark, _SMOKE_SF_DIR)
    ev = handle_events(
        raw,
        redactions={"public": {"users": ["note"]}},
        table_regexp="^(users|notes|orders)$",
    )
    return ev


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pqstream_spark.queries import build_catalog

    q, _ = build_catalog()
    return q


def oracle_sql() -> dict[str, str]:
    from pqstream_spark.queries import build_catalog

    _, o = build_catalog()
    return o

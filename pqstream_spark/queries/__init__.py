"""Query catalog: every operator from SURVEY.md §2 (and the
beyond-reference LLM-pipeline operators) exposed as a named query
plus a DuckDB oracle SQL string for the driver's correctness gate.

Each submodule defines `register(queries, oracles)`; the driver-facing
surface is assembled here and re-exported by `__spark_entry__.py`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def build_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    # The driver verifies catalog entries in registration order (and caps
    # how many it checks), so the catalog is exactly 50 entries, ordered
    # cheapest-first with the round-1-unverified surface early: reference
    # ops, scalar-function suites, streaming, LLM-pipeline, relational.
    from . import reference, relational, llm, streaming_q, functions_q

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (reference, functions_q, streaming_q, llm, relational):
        mod.register(queries, oracles)
    return queries, oracles

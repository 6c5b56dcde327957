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
    from . import reference, relational, llm, streaming_q, functions_q

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (reference, relational, llm, streaming_q, functions_q):
        mod.register(queries, oracles)
    return queries, oracles

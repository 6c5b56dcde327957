"""F2 / S3 — regexp table filters.

Reference: per-client `Listen(table_regexp)` filters events by table
name (`/root/reference/server.go:284-302`), and the server-level
`-tables` regexp decides which tables are captured at all
(`server.go:149-166`). Both are plain predicates here; Catalyst pushes
them below everything else (including into the parquet scan when the
column is a partition key).

Regex dialect note: the reference compiles Go RE2; Spark `rlike` is
Java regex. The common syntax (literals, classes, anchors, `|`, `*`,
`+`, `?`) matches; Go's `(?P<name>)` named groups are `(?<name>)` in
Java — documented divergence, same as SURVEY.md §2 F2.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compile_or_raise(pattern: str) -> str:
    """Reject bad patterns up front — parity with server.go:287-290
    (bad regexp rejects the RPC instead of silently matching nothing)."""
    re.compile(pattern)
    return pattern


def filter_tables(df: DataFrame, table_regexp: str) -> DataFrame:
    """Keep events whose table_name matches (unanchored, like Go's
    re.MatchString — a partial match anywhere counts)."""
    pattern = compile_or_raise(table_regexp)
    return df.filter(F.col("table_name").rlike(pattern))

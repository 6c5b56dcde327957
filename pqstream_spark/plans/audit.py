"""Plan auditing: extract the scale-relevant facts from a physical plan.

`audit(df)` answers the questions that decide whether a plan survives a
100× scale-up — are filters pushed to the scan, which columns are read,
how many exchanges (shuffles) does it take, are the joins broadcast or
shuffle, is it codegen'd — as data, so tests can assert on them and
`python -m pqstream_spark.plans.audit` can dump them for every catalog
query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class PlanAudit:
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_shuffle_joins: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    codegen: bool = False
    plan: str = ""


def audit(df, execute: bool = False) -> PlanAudit:
    """execute=True runs the query once (JVM-side, nothing collected)
    so AQE finalizes: codegen markers and RUNTIME join strategy appear
    only in the final adaptive plan — an unexecuted AdaptiveSparkPlan
    reports the static planner's guesses and no codegen spans."""
    qe = df._jdf.queryExecution()
    if execute:
        qe.toRdd().count()
    plan = qe.executedPlan().toString()
    out = PlanAudit(plan=plan)
    out.n_exchanges = len(re.findall(r"\bExchange\b", plan))
    out.n_broadcast_joins = plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    out.n_shuffle_joins = plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1):
            out.pushed_filters.append(m.group(1))
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        if m.group(1):
            out.partition_filters.append(m.group(1))
    for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan):
        out.read_schemas.append(m.group(1))
    out.codegen = bool(re.search(r"\*\(\d+\)", plan))
    return out


def main() -> None:  # pragma: no cover - CLI convenience
    import os
    import sys

    sys.path.insert(0, os.getcwd())
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan_audit")
    queries, _ = build_catalog()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue  # streaming plans finalize only at runtime
        a = audit(fn(spark, sf_dir))
        print(
            f"{name}: exchanges={a.n_exchanges} bcast={a.n_broadcast_joins} "
            f"shuffle_joins={a.n_shuffle_joins} "
            f"pushed={sum(len(p.split(',')) for p in a.pushed_filters)}"
        )


if __name__ == "__main__":  # pragma: no cover
    main()

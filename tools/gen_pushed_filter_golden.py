"""Regenerate tests/golden_pushed_filters.json (VERDICT r14 #8).

With spark.sql.constraintPropagation.enabled=false as the library
default (session.py, round 14), only *inferred* IsNotNull pushdowns
disappear — every value-bearing pushdown comes from an explicit
predicate. This golden pins that claim: for each catalog entry that
pushes at least one value-bearing filter (anything but
IsNotNull/IsNull) into a scan, the set of (operator, column) tokens is
committed, and tests/test_pushed_filter_pin.py fails if any committed
token ever disappears from the entry's plan — i.e. the constraint-prop
default (or any future change) can never silently drop a load-bearing
pushdown.

Run: python tools/gen_pushed_filter_golden.py   (commit the JSON diff)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
OUT = REPO / "tests" / "golden_pushed_filters.json"


def value_bearing_tokens(plan: str) -> set[str]:
    """(operator, column) tokens of every value-bearing pushed filter
    in `plan`, e.g. 'GreaterThanOrEqual(l_shipdate)'. Null checks are
    excluded — they are exactly what the constraint-prop default is
    allowed to drop. Literal values are excluded from the token so the
    pin survives formatting changes but still catches a lost
    pushdown."""
    import re

    toks: set[str] = set()
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1)
        # split top-level commas (In(col, [a,b]) carries nested commas
        # but those sit inside parens/brackets)
        depth = 0
        parts, cur = [], []
        for ch in body:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            parts.append("".join(cur))
        for p in (p.strip() for p in parts):
            if not p or p.startswith(("IsNotNull", "IsNull")) or p == "...":
                continue
            mm = re.match(r"(\w+)\(([^,)]+)", p)
            if mm:
                toks.add(f"{mm.group(1)}({mm.group(2).strip()})")
    return toks


def main() -> None:
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="gen_pushed_filter_golden")
    queries, _ = build_catalog()
    golden: dict[str, list[str]] = {}
    for name, fn in queries.items():
        if name.startswith("stream_"):
            continue  # streaming plans finalize only at runtime
        plan = fn(spark, SF_DIR)._jdf.queryExecution()  # noqa: SLF001
        toks = value_bearing_tokens(plan.executedPlan().toString())
        if toks:
            golden[name] = sorted(toks)
        print(f"{name}: {len(toks)} value-bearing pushed tokens")
    with open(OUT, "w") as fh:
        json.dump(golden, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT} ({len(golden)} entries)")


if __name__ == "__main__":
    main()

"""Pushed-filter regression pin (round 15, VERDICT r14 #8).

session.py disables spark.sql.constraintPropagation by default — safe
for this catalog because only inferred IsNotNull pushdowns vanish. This
pin makes that trade-off PERMANENTLY visible: every value-bearing
pushed filter each entry's plan carried when the golden was generated
(tests/golden_pushed_filters.json, tools/gen_pushed_filter_golden.py)
must still be pushed. If a future optimizer change, conf default, or
query restructure silently drops a load-bearing pushdown, this fails
naming the lost (operator, column) token. Gaining new pushdowns is
fine; losing one is not.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pqstream_spark.queries import build_catalog

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_PATH = Path(__file__).parent / "golden_pushed_filters.json"


with open(GOLDEN_PATH) as fh:
    GOLDEN: dict[str, list[str]] = json.load(fh)


@pytest.fixture(scope="module")
def catalog():
    q, _ = build_catalog()
    return q


@pytest.fixture(scope="module", autouse=True)
def _pristine_plans(spark):
    """A cache entry leaked by an earlier test makes CacheManager swap
    InMemoryRelation into these plans, hiding parquet PushedFilters and
    failing the pin for the wrong reason. Pin plans must come from real
    scans."""
    spark.catalog.clearCache()


@pytest.mark.parametrize("entry", sorted(GOLDEN))
def test_value_bearing_pushed_filters_survive(spark, catalog, entry):
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.gen_pushed_filter_golden import value_bearing_tokens

    plan = (
        catalog[entry](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    now = value_bearing_tokens(plan)
    lost = set(GOLDEN[entry]) - now
    assert not lost, (
        f"{entry}: value-bearing pushed filters LOST vs golden "
        f"(regenerate tools/gen_pushed_filter_golden.py only if the "
        f"loss is intended and justified): {sorted(lost)}"
    )

"""Connected-components: min-label propagation vs star contraction.

The near-dup cluster resolver has two interchangeable engines:
propagate_min_labels (O(diameter) rounds — right for shallow near-dup
graphs) and connected_components_star (large-star/small-star, proven
O(log² n) rounds, diameter-independent — right when the diameter is
unknown/adversarial). These tests
pin that (a) star contraction converges on a long chain where naive
propagation's default round budget cannot, (b) both engines agree on
an arbitrary multi-component graph, (c) the propagation engine warns
rather than silently returning split clusters when its budget runs out.
"""

from __future__ import annotations

import warnings

import pytest


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a: long, doc_b: long")


def _labels(df):
    return {r["doc_id"]: r["label"] for r in df.collect()}


def test_star_converges_on_long_chain(spark):
    # chain 0-1-2-...-120: diameter 120, far beyond propagate's default
    # 10-round budget; star contraction needs only O(log n) rounds
    from pqstream_spark.queries.llm import connected_components_star

    chain = _pairs(spark, [(i, i + 1) for i in range(120)])
    labels = _labels(connected_components_star(chain, max_rounds=12))
    assert len(labels) == 121
    assert set(labels.values()) == {0}


def test_propagation_warns_when_budget_exhausted(spark):
    from pqstream_spark.queries.llm import propagate_min_labels

    chain = _pairs(spark, [(i, i + 1) for i in range(120)])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        propagate_min_labels(chain, max_rounds=3).collect()
    assert any("max_rounds" in str(w.message) for w in caught)


@pytest.mark.parametrize("seed", [7, 23])
def test_star_and_propagation_agree(spark, seed):
    import random

    from pqstream_spark.queries.llm import (
        connected_components_star,
        propagate_min_labels,
    )

    rng = random.Random(seed)
    # several dense-ish components + isolated pairs, ids shuffled so
    # component minima are not positionally obvious
    ids = list(range(0, 400, 3))
    rng.shuffle(ids)
    edges = []
    k = 0
    while k + 10 <= len(ids):
        comp = ids[k : k + 10]
        for i in range(1, len(comp)):
            edges.append((comp[i - 1], comp[i]))
        for _ in range(4):
            edges.append((rng.choice(comp), rng.choice(comp)))
        k += 10
    pairs = _pairs(spark, [e for e in edges if e[0] != e[1]])
    star = _labels(connected_components_star(pairs, max_rounds=15))
    prop = _labels(propagate_min_labels(pairs, max_rounds=30))
    assert star == prop


def test_star_warns_when_budget_exhausted(spark):
    """Star contraction must carry the same exhausted-budget safety
    contract as propagate_min_labels: warn, never silently return a
    possibly-split labelling."""
    from pqstream_spark.queries.llm import connected_components_star

    chain = _pairs(spark, [(i, i + 1) for i in range(120)])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components_star(chain, max_rounds=1).collect()
    assert any(
        "max_rounds" in str(w.message)
        and issubclass(w.category, RuntimeWarning)
        for w in caught
    )

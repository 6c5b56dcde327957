"""Property-based tests for RFC-7386 merge patch.

The table-driven tests (test_merge_patch.py) mirror the reference's
patch_test.go cases; these pin the LAW the reference relies on:
apply(a, patch(a→b)) == b for arbitrary inputs — hypothesis finds the
edge cases a table never lists (nested empties, key type collisions,
unicode, deletion chains).
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from pqstream_spark.operators.merge_patch import _merge_patch_obj

# JSON-safe scalars, no None (RFC-7386 cannot express a literal null
# target value — null IS the delete marker)
scalars = st.one_of(
    st.text(max_size=8),
    st.integers(min_value=-(10**6), max_value=10**6),
    st.booleans(),
)
json_objects = st.recursive(
    st.dictionaries(st.text(max_size=5), scalars, max_size=5),
    lambda children: st.dictionaries(
        st.text(max_size=5), st.one_of(scalars, children), max_size=4
    ),
    max_leaves=20,
)


def apply_patch(target, patch):
    """RFC-7386 §2 application algorithm."""
    if not isinstance(patch, dict):
        return patch
    if not isinstance(target, dict):
        target = {}
    out = dict(target)
    for k, v in patch.items():
        if v is None:
            out.pop(k, None)
        elif isinstance(v, dict):
            out[k] = apply_patch(out.get(k), v)
        else:
            out[k] = v
    return out


@settings(max_examples=300, deadline=None)
@given(a=json_objects, b=json_objects)
def test_patch_then_apply_recovers_target(a, b):
    patch = _merge_patch_obj(a, b)
    assert apply_patch(a, patch) == b


@settings(max_examples=200, deadline=None)
@given(a=json_objects)
def test_identity_patch_is_empty(a):
    assert _merge_patch_obj(a, a) == {}


@settings(max_examples=200, deadline=None)
@given(a=json_objects, b=json_objects)
def test_patch_is_json_serializable(a, b):
    # the engine ships patches as JSON text (to_json / jsonpb parity)
    patch = _merge_patch_obj(a, b)
    assert json.loads(json.dumps(patch)) == patch


def test_spark_map_patch_matches_python_reference(spark):
    """The JVM-side map formulation (merge_patch_map) must agree with
    the recursive Python reference on a batch of generated flat rows."""
    import itertools
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    keys = ["a", "b", "c", "d"]
    rows = []
    for i in range(300):
        a = {k: str(rng.randint(0, 3)) for k in keys if rng.random() < 0.7}
        b = {k: str(rng.randint(0, 3)) for k in keys if rng.random() < 0.7}
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "i int, a map<string,string>, b map<string,string>")
    from pqstream_spark.operators.merge_patch import merge_patch_map

    got = {
        r["i"]: (dict(r["p"]) if r["p"] is not None else None)
        for r in df.select("i", merge_patch_map(F.col("a"), F.col("b")).alias("p")).collect()
    }
    for i, a, b in rows:
        expected = _merge_patch_obj(a, b)
        assert got[i] == expected, f"row {i}: {a} -> {b}: {got[i]} != {expected}"

"""Seeded-fuzz tests for the cross-engine determinism claims.

The oracle gate proves Spark == DuckDB on the driver corpus; these
tests prove the same invariants on ADVERSARIAL inputs the corpus never
exercises — boundary-adjacent classifier signals, unicode/degenerate
documents, zero/negative vectors. Seeded RNG sweeps rather than
hypothesis: one Spark job over thousands of generated rows per test
buys far more coverage per second than per-example job launches, and
failures replay exactly.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest


def _duck(con, sql):
    return con.sql(sql).fetchall()


def test_clf_margin_cross_engine_fuzz(spark):
    """The linear classifier margin must be bit-identical between
    engines for ANY 6-dp signals — including values adjacent to the
    .5e-6 rounding boundaries that broke the float formulation."""
    from pqstream_spark.queries.llm import CLF_MARGIN_EXPR

    rng = random.Random(20260814)
    rows = []
    for i in range(20000):
        q = round(rng.uniform(0, 1), 6)
        a = round(rng.uniform(0, 3), 6)
        n = rng.randrange(0, 400)
        rows.append((i, q, a, n))
    # adversarial tail: margins that land exactly on micro-unit
    # half-steps (odd numerators / 2e6)
    for i, (qi, ai, n) in enumerate(
        [(300000, 400001, 10), (999999, 0, 0), (0, 1, 200), (1, 1, 399)]
    ):
        rows.append((20000 + i, qi / 1e6, ai / 1e6, n))
    pdf = pd.DataFrame(rows, columns=["i", "quality_score", "alpha_ratio", "n_tokens"])

    con = duckdb.connect()
    con.register("sig", pdf)
    want = _duck(con, f"SELECT i, {CLF_MARGIN_EXPR} AS m FROM sig ORDER BY i")

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_fuzz_sig")
    got = [
        (r[0], r[1])
        for r in spark.sql(
            f"SELECT i, {CLF_MARGIN_EXPR} AS m FROM _fuzz_sig ORDER BY i"
        ).collect()
    ]
    spark.catalog.dropTempView("_fuzz_sig")
    assert len(got) == len(want)
    for (ia, ma), (ib, mb) in zip(got, want):
        assert ia == ib and ma == mb, (ia, ma, mb)


def test_hyperplane_bucket_cross_engine_fuzz(spark):
    """The 8-bit hyperplane LSH signature (integer-valued planes, exact
    in doubles) must bucket every vector identically in both engines —
    zero vectors, negatives, tiny magnitudes, mixed dims included."""
    from pqstream_spark.queries.llm import (
        _hyperplane_sig_duck,
        _hyperplane_sig_spark,
    )

    rng = random.Random(42)
    rows = []
    for i in range(2000):
        dim = rng.choice([4, 16, 64])
        vec = [
            rng.choice([0.0, 1e-12, -1e-12, rng.uniform(-5, 5)])
            for _ in range(dim)
        ]
        rows.append((i, vec))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])

    con = duckdb.connect()
    con.register("vecs", pdf)
    want = dict(
        _duck(con, f"SELECT vec_id, {_hyperplane_sig_duck()} AS b FROM vecs")
    )

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_fuzz_vecs")
    got = dict(
        (r[0], r[1])
        for r in spark.sql(
            f"SELECT vec_id, {_hyperplane_sig_spark()} AS b FROM _fuzz_vecs"
        ).collect()
    )
    spark.catalog.dropTempView("_fuzz_vecs")
    assert got == want


def test_minhash_narrow_equals_aggregate_fuzz(spark):
    """The per-row (stream-safe) MinHash band formulation and the
    hash-aggregate (batch) formulation must produce identical band
    keys for arbitrary text — empties, whitespace-only, unicode,
    punctuation soup, single-token docs."""
    from pqstream_spark.queries.llm import (
        _minhash_signatures,
        minhash_bands_narrow,
    )

    rng = random.Random(7)
    alphabets = [
        "abcdefghij ",
        "äöüßéñ中文字 ",
        "!@#$%^&*() ",
        "the a and of is cat dog fish ",
    ]
    texts = ["", " ", "\t\n", "one", "  padded  "]
    for _ in range(200):
        alpha = rng.choice(alphabets)
        texts.append(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 120)))
        )
    pdf = pd.DataFrame(
        [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]
    )
    df = spark.createDataFrame(pdf)

    cols = ["doc_id", "b0", "b1", "b2", "b3"]
    agg = {tuple(r) for r in _minhash_signatures(df).select(cols).collect()}
    nar = {tuple(r) for r in minhash_bands_narrow(df).select(cols).collect()}
    assert agg == nar

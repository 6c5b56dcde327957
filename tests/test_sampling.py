"""The shared hash-sample idiom (functions/sampling.py): overflow- and
sign-safe under Spark 4's default ANSI mode, identical across both SQL
dialects and the Python twin, and unchanged for the small non-negative
ids every oracle expectation was built on."""

from __future__ import annotations

import duckdb

from pqstream_spark.functions.sampling import (
    A, B, M, DEFAULT_THRESHOLD, sample_key, sample_pred, sort_and_cap,
)


def test_ansi_safe_for_hashed_and_negative_ids(spark):
    """xxhash64-derived doc_ids (huge, often negative — what curate.py
    produces when input lacks doc_id) must not overflow the predicate
    under ANSI, and the admitted fraction must stay ~threshold/M for
    negative ids too (a signed % admitted ~62% instead of ~25%)."""
    ids = spark.range(5000).selectExpr(
        "xxhash64(CAST(id AS STRING)) AS doc_id"
    )
    n = ids.count()
    kept = ids.where(sample_pred("doc_id")).count()
    frac = kept / n
    assert 0.15 < frac < 0.35, f"sample fraction off: {frac}"
    # plenty of the hashed ids are negative — the point of the test
    assert ids.where("doc_id < 0").count() > 1000


def test_dialect_and_python_agreement(spark):
    """Spark expr == DuckDB expr == Python key, including negative and
    huge-magnitude ids."""
    vals = [0, 1, 2047, 8191, -1, -8191, 2**62, -(2**62), 1234567890123]
    py = [sample_key(v) for v in vals]
    sp = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "doc_id long")
        .selectExpr(
            sample_pred("doc_id").replace(f" < {DEFAULT_THRESHOLD}", "")
            + " AS k"
        )
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    dk = [
        r[0]
        for r in con.execute(
            "SELECT "
            + sample_pred("doc_id", spark=False).replace(
                f" < {DEFAULT_THRESHOLD}", ""
            )
            + " FROM t"
        ).fetchall()
    ]
    assert sp == py == dk, (sp, py, dk)
    assert all(0 <= k < M for k in py)


def test_unchanged_for_small_nonnegative_ids():
    """The oracle data's ids are small and non-negative; the reduce-
    before-multiply predicate is provably identical to the original
    (id*A + B) % M there — pinned so the refactor can never shift an
    oracle-certified sample."""
    for i in range(0, 3000):
        assert sample_key(i) == (i * A + B) % M


def test_sort_and_cap_membership_deterministic():
    rows = [{"doc_id": i} for i in range(100, 0, -1)]
    a = sort_and_cap(list(rows), "doc_id", 10)
    b = sort_and_cap(list(reversed(rows)), "doc_id", 10)
    assert a == b and len(a) == 10

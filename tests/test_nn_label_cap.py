"""Per-label embedding-NN width cap: a mega-label (wider than
NN_LABEL_CAP) must NOT be paired all-pairs — O(w²) per label is the
same 100 TB explosion LSH_BUCKET_CAP kills for shingle buckets. Wide
labels route to the random-hyperplane-LSH path, where pairing
equi-joins on (label, bucket) so the bucket is part of the shuffle key.
Small labels keep the exact all-pairs NN, and the DuckDB oracle runs
the identical routed semantics.
"""

from __future__ import annotations

import math

import pytest

from pqstream_spark.queries.llm import (
    NN_LABEL_CAP,
    _hyperplane_sig_spark,
    _nn_label_sql,
)

DIM = 8


def _vec(seed: int) -> list[float]:
    # deterministic, exactly representable components
    return [float(((seed * 31 + i * 17) % 13) - 6) for i in range(DIM)]


def _rows():
    rows = [(i, "mega", _vec(i)) for i in range(NN_LABEL_CAP + 20)]
    rows += [(10_000 + i, "small", _vec(i)) for i in range(5)]
    return rows


@pytest.fixture(scope="module")
def nn_result(spark):
    df = spark.createDataFrame(
        _rows(), "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>"
    )
    df.createOrReplaceTempView("embeddings")
    out = spark.sql(_nn_label_sql(spark=True))
    rows = out.collect()
    sig = {
        r["vec_id"]: r["bucket"]
        for r in spark.sql(
            f"SELECT vec_id, {_hyperplane_sig_spark()} AS bucket FROM embeddings"
        ).collect()
    }
    spark.catalog.dropTempView("embeddings")
    return rows, sig


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return round(dot / (na * nb), 6)


def test_small_label_exact_nn(nn_result):
    """Labels under the cap keep the exact all-pairs nearest neighbour."""
    rows, _ = nn_result
    vecs = {vid: emb for vid, lbl, emb in _rows() if lbl == "small"}
    got = {r["vec_id"]: r["nn_vec_id"] for r in rows if r["label"] == "small"}
    assert set(got) == set(vecs)
    for vid, nn in got.items():
        best = max(
            ((o, _cos(vecs[vid], vecs[o])) for o in vecs if o != vid),
            key=lambda t: (t[1], -t[0]),
        )
        assert nn == best[0]


def test_mega_label_routed_to_buckets(nn_result):
    """Every NN returned for the over-cap label shares the vector's
    hyperplane bucket — proof the pairing ran on (label, bucket), not
    all-pairs within label."""
    rows, sig = nn_result
    mega = [r for r in rows if r["label"] == "mega"]
    assert mega, "mega label produced no rows at all"
    for r in mega:
        assert sig[r["vec_id"]] == sig[r["nn_vec_id"]]
    # and the routing genuinely restricts: not every vector's global
    # best neighbour lands in its own bucket
    assert len({sig[r["vec_id"]] for r in mega}) > 1


def test_oracle_runs_identical_routed_semantics(spark, nn_result):
    """The DuckDB dialect of the routed NN produces the identical result
    set — the correctness gate verifies capped semantics, not an
    uncapped lookalike."""
    import duckdb

    rows, _ = nn_result
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, label VARCHAR, embedding DOUBLE[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?, ?)", [list(r) for r in _rows()]
    )
    duck_rows = con.execute(_nn_label_sql(spark=False)).fetchall()
    con.close()
    spark_set = {
        (r["vec_id"], r["label"], r["nn_vec_id"], r["nn_cos"], r["near_dup"])
        for r in rows
    }
    assert spark_set == set(map(tuple, duck_rows))


def test_cap_text_present_in_both_dialects():
    """Both dialects carry the width predicate so the driver's oracle
    compare exercises the same cap."""
    for dialect in (_nn_label_sql(spark=True), _nn_label_sql(spark=False)):
        assert f"lw.w <= {NN_LABEL_CAP}" in dialect
        assert f"lw.w > {NN_LABEL_CAP}" in dialect

"""LSH bucket-width cap: a pathological template bucket (many docs
sharing a band bucket — boilerplate, licence headers, empty templates)
must be DROPPED before pair generation. Uncapped, one 10⁶-member bucket
at 100 TB is an executor OOM on the collect plus an O(k²) pair
explosion; capped, it costs one counted-and-discarded group.
"""

from __future__ import annotations

from pqstream_spark.queries.llm import (
    LSH_BUCKET_CAP,
    _minhash_signatures,
    band_pairs,
)

TEMPLATE = (
    "this is the exact same boilerplate licence header text repeated "
    "verbatim across every generated file in the tree"
)


def _corpus(spark, n_template: int, extra: list[str] = ()):
    rows = [(i, TEMPLATE) for i in range(n_template)]
    rows += [(1000 + j, t) for j, t in enumerate(extra)]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_template_bucket_dropped(spark):
    """60 identical docs > cap=50 → every band bucket is over-width →
    zero candidate pairs survive."""
    sig = _minhash_signatures(_corpus(spark, 60))
    assert band_pairs(sig, bucket_cap=LSH_BUCKET_CAP).count() == 0


def test_uncapped_explodes_quadratically(spark):
    """The same corpus uncapped generates all 60·59/2 pairs — the
    explosion the cap exists to prevent."""
    sig = _minhash_signatures(_corpus(spark, 60))
    assert band_pairs(sig, bucket_cap=None).count() == 60 * 59 // 2


def test_small_buckets_survive_cap(spark):
    """Genuine near-dup groups far below the cap still pair up."""
    near_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    near_b = near_a[:-6]  # tail-truncated near-copy
    sig = _minhash_signatures(_corpus(spark, 0, extra=[near_a, near_b]))
    pairs = band_pairs(sig, bucket_cap=LSH_BUCKET_CAP).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1000, 1001)}


def test_oracle_mirrors_cap():
    """The DuckDB oracles for minhash/cluster/pipeline entries carry the
    same width cap, so the correctness gate verifies the capped
    semantics, not an uncapped lookalike."""
    from pqstream_spark.queries.llm import SQL_MINHASH_DUCK, _pipeline_oracle_sql

    assert f"bw <= {LSH_BUCKET_CAP}" in SQL_MINHASH_DUCK
    assert f"bw <= {LSH_BUCKET_CAP}" in _pipeline_oracle_sql()

"""register_views caching contract: repeat calls are near-free, and the
cache invalidates on sf_dir change or view tampering — a stale cached
view silently serving the wrong data would poison every catalog query.
"""

from __future__ import annotations

from pqstream_spark.sources.tables import TABLE_NAMES, register_views

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_repeat_registration_is_cached(spark):
    register_views(spark, SF_A)
    a1 = spark.table("region").count()
    dfs = register_views(spark, SF_A)
    assert set(dfs) == set(TABLE_NAMES)
    assert spark.table("region").count() == a1


def test_sf_dir_change_invalidates(spark):
    register_views(spark, SF_A)
    n_a = spark.table("orders").count()
    register_views(spark, SF_B)
    n_b = spark.table("orders").count()
    assert n_b > n_a  # sf0.01 is 10x sf0.001
    register_views(spark, SF_A)
    assert spark.table("orders").count() == n_a


def test_dropped_view_forces_reregistration(spark):
    register_views(spark, SF_A)
    spark.catalog.dropTempView("embeddings")
    register_views(spark, SF_A)
    assert spark.table("embeddings").count() > 0

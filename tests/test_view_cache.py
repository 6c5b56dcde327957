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


def test_approx_sketch_certification_holds_at_smallest_sf(spark, duck):
    """The sketch tolerance booleans must hold on sf0.001's tiny groups
    (~200 rows/event_type) — the regime where an interpolated exact
    twin or a loose sketch rsd breaks certification (the driver's gate
    only runs sf0.01, so this is the regression net for small groups)."""
    import __spark_entry__ as e

    sdf = e.queries()["agg_approx_sketch"](spark, SF_A)
    rows = {r["event_type"]: r.asDict() for r in sdf.collect()}
    assert rows, "no groups"
    for et, r in rows.items():
        for flag in ("approx_users_ok", "hll_users_ok", "q50_ok", "q95_ok", "q99_ok"):
            assert r[flag] is True, f"{et}.{flag} failed certification"
    drows = {
        r[0]: r
        for r in duck.execute(e.oracle_sql()["agg_approx_sketch"]).fetchall()
    }
    assert set(drows) == set(rows)
    for et, r in rows.items():
        assert (r["exact_users"], r["q50_exact"], r["q95_exact"], r["q99_exact"]) == (
            drows[et][1], drows[et][2], drows[et][3], drows[et][4],
        )

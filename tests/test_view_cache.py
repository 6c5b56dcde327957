"""register_views caching contract: repeat calls are near-free, and the
cache invalidates on sf_dir change or view tampering — a stale cached
view silently serving the wrong data would poison every catalog query.
A shadow left behind by raw createOrReplaceTempView (the old foot-gun)
is now detected via Catalyst sameResult and healed on the next call;
sanctioned shadowing goes through shadow_views.
"""

from __future__ import annotations

import pytest

from pqstream_spark.sources.tables import (
    TABLE_NAMES,
    invalidate_view_cache,
    register_views,
    shadow_views,
)

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


def test_shadow_without_drop_is_healed(spark):
    """The former foot-gun: a raw createOrReplaceTempView shadow that is
    never dropped. The next register_views must DETECT it (sameResult
    mismatch) and re-register the real table, not serve the shadow."""
    register_views(spark, SF_A)
    real = spark.table("documents").count()
    spark.createDataFrame(
        [(1, "en", "ghost")], "doc_id LONG, lang STRING, text STRING"
    ).createOrReplaceTempView("documents")  # deliberately no drop
    register_views(spark, SF_A)
    assert spark.table("documents").count() == real


def test_shadow_views_serves_shadow_then_restores(spark):
    """Sanctioned shadowing: the shadow survives a nested register_views
    (every catalog query makes one) and is restored + invalidated on
    exit, exception or not."""
    register_views(spark, SF_A)
    real = spark.table("documents").count()
    fake = spark.createDataFrame(
        [(1, "en", "shadow-doc")], "doc_id LONG, lang STRING, text STRING"
    )
    with shadow_views(spark, documents=fake):
        dfs = register_views(spark, SF_A)  # nested call: must NOT heal
        assert spark.table("documents").count() == 1
        assert dfs["documents"].count() == 1
    register_views(spark, SF_A)
    assert spark.table("documents").count() == real

    with pytest.raises(RuntimeError, match="boom"), shadow_views(
        spark, documents=fake
    ):
        raise RuntimeError("boom")
    register_views(spark, SF_A)
    assert spark.table("documents").count() == real


def test_shadow_views_without_prior_registration_fails_loudly(spark):
    invalidate_view_cache(spark)
    fake = spark.createDataFrame(
        [(1, "en", "x")], "doc_id LONG, lang STRING, text STRING"
    )
    with pytest.raises(ValueError, match="register_views"):
        with shadow_views(spark, documents=fake):
            pass
    register_views(spark, SF_A)  # leave the session usable for later tests


def test_invalidate_view_cache_forces_fresh_registration(spark):
    register_views(spark, SF_A)
    invalidate_view_cache(spark)
    dfs = register_views(spark, SF_A)
    assert set(dfs) == set(TABLE_NAMES)
    assert spark.table("orders").count() > 0


def test_cache_hit_repins_engine_confs(spark):
    """A conf mutated between calls must not drift timestamp semantics:
    the cached path re-pins engine confs (ADVICE r4)."""
    register_views(spark, SF_A)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    register_views(spark, SF_A)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


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

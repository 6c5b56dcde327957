"""Bucketed co-located joins: pre-partition both sides on the join key
at write time → the join runs with ZERO exchanges. At 100 TB this is
the difference between shuffling two fact tables per query and never
shuffling them again after landing."""

from __future__ import annotations

import pytest

from pqstream_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed(spark):
    # bucketed tables must be catalog-managed; they land in the session
    # warehouse dir and are dropped (data included) on teardown
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    for name, df, key in [
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
    )
    # disable broadcast so the co-location (not size) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout satisfies distribution

    # and it's still correct
    n = joined.count()
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    assert n == lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()

"""Salted aggregation / join must equal their unsalted counterparts
exactly — salting changes the shuffle layout, never the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pqstream_spark.operators.skew import salted_aggregate, salted_join
from pqstream_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """events with an artificial hot key: 80% of rows on user_id 1."""
    ev = load_table(spark, SF_DIR, "events")
    df = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 != 0, F.lit(1)).otherwise(F.col("user_id")),
    ).cache()
    yield df
    df.unpersist()


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        r["user_id"]: (r["n"], round(r["total"], 2), r["mx"])
        for r in skewed.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], round(r["total"], 2), r["mx"])
        for r in salted_aggregate(
            skewed.withColumn("value_dec", F.col("value").cast("decimal(18,2)")),
            keys=["user_id"],
            aggs=[
                ("event_id", "count", "n"),
                ("value_dec", "sum", "total_dec"),
                ("value", "max", "mx"),
            ],
            salt=8,
            salt_from=["event_id"],
        )
        .withColumn("total", F.col("total_dec").cast("double"))
        .collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(skewed, ["user_id"], [("value", "avg", "a")])


def test_salted_join_matches_plain(spark, skewed):
    dim = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod("user_id", F.lit(4)))
    )
    plain = sorted(
        (r["event_id"], r["segment"])
        for r in skewed.join(dim, "user_id").select("event_id", "segment").collect()
    )
    salted = sorted(
        (r["event_id"], r["segment"])
        for r in salted_join(skewed, dim, key="user_id", salt=8)
        .select("event_id", "segment")
        .collect()
    )
    assert salted == plain

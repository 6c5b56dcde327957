"""File-format round-trips: parquet → csv/json/orc → identical rows,
plus partition pruning on the hive-partitioned landing layout."""

from __future__ import annotations

import pytest

from pqstream_spark.sources.formats import (
    partitioned_parquet_writer,
    read_events_csv,
    read_events_json,
    read_events_orc,
    write_events,
)
from pqstream_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    # MUST unpersist on teardown: a leaked cache entry makes Spark's
    # CacheManager substitute InMemoryRelation for this exact subtree in
    # every LATER test's plan (session-wide), hiding parquet pushdowns.
    df = load_table(spark, SF_DIR, "events").cache()
    yield df
    df.unpersist()


def _as_dicts(df):
    return sorted(
        (r.asDict() for r in df.collect()), key=lambda d: d["event_id"]
    )


@pytest.mark.parametrize("fmt,reader", [
    ("csv", read_events_csv),
    ("json", read_events_json),
    ("orc", read_events_orc),
])
def test_roundtrip(spark, events, tmp_path_factory, fmt, reader):
    path = str(tmp_path_factory.mktemp(fmt) / f"events_{fmt}")
    write_events(events, path, fmt)
    back = reader(spark, path)
    assert _as_dicts(back) == _as_dicts(events)


def test_partitioned_layout_prunes(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_type")
    partitioned_parquet_writer(events, path, by="event_type")
    scan = spark.read.parquet(path).filter("event_type = 'purchase'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the filter must become a PartitionFilter (directory pruning), not a
    # row-level parquet filter over all partitions
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf
    n = scan.count()
    assert n == events.filter("event_type = 'purchase'").count()
    assert 0 < n < events.count()

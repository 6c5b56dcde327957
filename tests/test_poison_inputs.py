"""Poison-input tolerance: at 100 TB there WILL be malformed rows; the
pipeline must degrade per-row (NULLs), never fail the job."""

from __future__ import annotations

from pyspark.sql import functions as F

from pqstream_spark.operators.merge_patch import merge_patch_json
from pqstream_spark.sources.changelog import changelog_from_events


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_changelog_survives_malformed_props(spark):
    from datetime import datetime

    ts = datetime(2024, 1, 1)
    rows = [
        (1, ts, 10, "click", 1.0, '{"k": 5}'),          # good
        (2, ts, 11, "view", 2.0, "not json at all"),     # poison
        (3, ts, 12, "signup", 3.0, None),                # null props
        (4, ts, 13, "purchase", 4.0, '{"k": "zzz"}'),    # wrong type
        (5, ts, 14, "error", None, '{"k": 7}'),          # null value
    ]
    out = {r["seq"]: r for r in changelog_from_events(_events(spark, rows)).collect()}
    assert len(out) == 5  # nothing dropped, nothing crashed
    assert out[1]["payload"]["note"] == "note-5"
    # malformed/missing/wrong-typed props → NULL k → note-NULL rendering,
    # envelope intact
    for seq in (2, 3, 4):
        assert out[seq]["table_name"] is not None
        assert out[seq]["op"] is not None
        assert out[seq]["payload"]["note"] is None
    assert out[5]["payload"]["val"] is None  # null value survives


def test_merge_patch_json_udf_poison(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1}', '{"a": 2}'),
            (2, "{broken", '{"a": 2}'),      # bad a-side
            (3, '{"a": 1}', "ALSO BROKEN"),  # bad b-side
            (4, None, None),
        ],
        "i int, a string, b string",
    )
    out = {
        r["i"]: r["p"]
        for r in df.select(
            "i", merge_patch_json(F.col("a"), F.col("b")).alias("p")
        ).collect()
    }
    assert out[1] == '{"a":2}'
    # parity with server.go:237-240: patch error → event still flows,
    # changes just absent (NULL)
    assert out[2] is None and out[3] is None
    assert out[4] == "{}"

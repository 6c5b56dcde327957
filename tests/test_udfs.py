"""UDF family surface: UDTF fan-out and grouped-agg pandas UDF
(the scalar pandas UDF is covered by merge-patch tests)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pqstream_spark.functions.udfs import split_sentences, weighted_mean_udaf


def test_udtf_sentence_split(spark):
    df = spark.createDataFrame(
        [
            (1, "First one. Second two! Third? Yes."),
            (2, "single sentence no terminator"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = split_sentences(df).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    assert [s for _, s in sorted(by_doc[1])] == [
        "First one.", "Second two!", "Third?", "Yes.",
    ]
    assert by_doc[2] == [(0, "single sentence no terminator")]
    assert 3 not in by_doc and 4 not in by_doc  # empty/NULL → zero rows


def test_udtf_on_real_documents(spark):
    from pqstream_spark.sources.tables import load_table

    # doc_id filter, not limit(50): limit without order re-samples per
    # action, and the UDTF view + expectation must see the same rows
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 50"
    )
    out = split_sentences(docs)
    n_docs_with_text = docs.filter("length(trim(text)) > 0").count()
    assert out.select("doc_id").distinct().count() == n_docs_with_text
    # python reference on one doc
    row = docs.filter("length(text) > 20").first()
    expected = [
        s.strip()
        for s in re.split(r"(?<=[.!?])\s+", row["text"].strip())
        if s.strip()
    ]
    got = [
        r["sentence"]
        for r in sorted(
            out.filter(F.col("doc_id") == row["doc_id"]).collect(),
            key=lambda r: r["sent_idx"],
        )
    ]
    assert got == expected


def test_grouped_agg_weighted_mean(spark):
    df = spark.createDataFrame(
        [
            ("a", 10.0, 1.0),
            ("a", 20.0, 3.0),
            ("b", 5.0, 2.0),
            ("b", None, 4.0),   # NULL value ignored
            ("c", 7.0, None),   # NULL weight ignored → group empty
        ],
        "k string, v double, w double",
    )
    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean_udaf()("v", "w").alias("wm")).collect()
    }
    assert abs(got["a"] - (10 * 1 + 20 * 3) / 4) < 1e-12
    assert abs(got["b"] - 5.0) < 1e-12
    assert got["c"] is None

"""Round-6 asks #4 and #7: decontamination against an EXTERNAL
benchmark frame (`decontaminate()` + `curate --decontaminate`), and
the streaming daemon's optional within-batch near-dup pass
(`--batch-selfdedup`)."""

from __future__ import annotations

import io
import json
import os


def _docs(spark):
    from pqstream_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents") \
        .selectExpr("doc_id", "lang", "text")


def test_decontaminate_library(spark):
    """A training doc that embeds a benchmark item verbatim is flagged
    with near-total containment (the 120-char cut truncates the last
    token, so its tail shingles are novel — exactly the denominator
    semantics the sweep documents); unrelated docs are not."""
    from pqstream_spark.queries.llm import decontaminate

    docs = _docs(spark)
    bench_text = (docs.where("doc_id = 3").collect()[0]["text"])[:120]
    bench = spark.createDataFrame(
        [(900, bench_text),
         (901, "a benchmark question nothing in the corpus contains "
               "about seventeen purple antiquarks meeting for lunch "
               "under the zeta reactor on a rainy tuesday afternoon")],
        "test_id long, text string",
    )
    hits = decontaminate(docs.select("doc_id", "text"), bench).collect()
    flagged = {(r["doc_a"], r["doc_b"]): r["containment"] for r in hits}
    assert (3, 900) in flagged and flagged[(3, 900)] >= 0.9
    assert all(t != 901 for _, t in flagged), flagged


def test_curate_cli_decontaminate(spark, tmp_path):
    """`curate --decontaminate bench.parquet`: the planted
    contaminated doc is rejected and the stats line reports the
    cause."""
    from pqstream_spark.curate import main

    docs = _docs(spark)
    inp = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(inp)

    bench_text = (docs.where("doc_id = 11").collect()[0]["text"])[:150]
    bench = spark.createDataFrame([(bench_text,)], "text string")
    bp = str(tmp_path / "bench.parquet")
    bench.coalesce(1).write.mode("overwrite").parquet(bp)

    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", inp, "--out", out_dir,
                 "--decontaminate", bp], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["rejected"]["contaminated"] >= 1, stats
    assert stats["kept"] + sum(stats["rejected"].values()) == stats["docs"]
    audit = spark.read.parquet(f"{out_dir}/audit")
    row = audit.where("doc_id = 11").collect()[0]
    assert row["contaminated"] and not row["final_keep"]
    assert row["contaminated_by"] is not None
    # the curated corpus does not contain the contaminated doc
    corpus = spark.read.parquet(f"{out_dir}/corpus")
    assert corpus.where("doc_id = 11").count() == 0


def test_stream_batch_selfdedup(spark, tmp_path):
    """Two near-copies in the SAME input file: default daemon admits
    both (documented trade); --batch-selfdedup admits exactly one."""
    from pqstream_spark.curate import curate_stream

    docs = _docs(spark)
    # doc 1 and its truncation both pass plain curation standalone, so
    # any count difference below is the self-dedup pass alone
    base = docs.where("doc_id = 1").collect()[0]
    batch = spark.createDataFrame(
        [(1, base["lang"], base["text"]),
         (600001, base["lang"], base["text"][:-6])],  # near-copy
        "doc_id long, lang string, text string",
    )

    import shutil

    stage = str(tmp_path / "stage")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]

    for selfdedup, want in ((False, 2), (True, 1)):
        in_dir = str(tmp_path / f"in_{selfdedup}")
        out_dir = str(tmp_path / f"out_{selfdedup}")
        os.makedirs(in_dir, exist_ok=True)
        shutil.copy(os.path.join(stage, part),
                    os.path.join(in_dir, "batch0.parquet"))
        q = curate_stream(spark, in_dir, out_dir,
                          batch_selfdedup=selfdedup)
        q.processAllAvailable()
        q.stop()
        import glob

        parts = glob.glob(os.path.join(out_dir, "corpus", "batch-*"))
        got = spark.read.parquet(*parts).count() if parts else 0
        assert got == want, (selfdedup, got)


def test_stream_decontaminate(spark, tmp_path):
    """Stream mode honors --decontaminate: a contaminated doc in a
    micro-batch is rejected at ingest (the benchmark frame is read on
    the batch's cloned session — outer-session views are invisible
    inside foreachBatch)."""
    import glob
    import shutil

    from pqstream_spark.curate import curate_stream

    docs = _docs(spark)
    keep_doc = docs.where("doc_id = 1").collect()[0]
    dirty_doc = docs.where("doc_id = 2").collect()[0]
    batch = spark.createDataFrame(
        [(1, keep_doc["lang"], keep_doc["text"]),
         (2, dirty_doc["lang"], dirty_doc["text"])],
        "doc_id long, lang string, text string",
    )
    bench = spark.createDataFrame([(dirty_doc["text"][:150],)],
                                  "text string")
    bp = str(tmp_path / "bench.parquet")
    bench.coalesce(1).write.mode("overwrite").parquet(bp)

    stage = str(tmp_path / "stage")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    shutil.copy(os.path.join(stage, part),
                os.path.join(in_dir, "b0.parquet"))

    q = curate_stream(spark, in_dir, out_dir, decontaminate_path=bp)
    q.processAllAvailable()
    q.stop()

    parts = glob.glob(os.path.join(out_dir, "corpus", "batch-*"))
    accepted = {r["doc_id"]
                for r in spark.read.parquet(*parts).collect()} if parts else set()
    assert 1 in accepted and 2 not in accepted, accepted
    audit = spark.read.parquet(*glob.glob(
        os.path.join(out_dir, "audit", "batch-*")))
    row = audit.where("doc_id = 2").collect()[0]
    assert row["contaminated"] and not row["final_keep"]

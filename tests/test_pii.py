"""PII detection/scrubbing (functions/pii.py): engine-portable
patterns (oracle-certified through text_annotations' n_pii_hits
column), placeholder scrubbing order, and the curate --scrub-pii
surface."""

from __future__ import annotations

import io
import json


def test_pii_patterns_cross_engine(spark, duck):
    """Counts and scrubbed text agree between Spark (Java regex) and
    DuckDB (RE2) on adversarial rows — the portability the certified
    column rests on."""
    from pqstream_spark.functions.pii import pii_count_expr, scrub_pii_expr

    cases = [
        "contact john.doe+spam@example.co.uk or call 555-123-4567",
        "server 192.168.0.1 ssn 123-45-6789",
        "no pii here just words 12345",
        "a@b.io then 10.0.0.255 then 999.999.999.999",
        "email UPPER@CASE.COM phone 123.456.7890",
        "",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "id long, text string")
    df.createOrReplaceTempView("_pii_t")
    s = spark.sql(
        f"SELECT id, {pii_count_expr(True)} AS n, "
        f"{scrub_pii_expr(True)} AS scrubbed FROM _pii_t ORDER BY id"
    ).collect()
    duck.execute("CREATE OR REPLACE TABLE _pii_t AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{c}')" for i, c in enumerate(cases))
                 + ") v(id, text)")
    d = duck.execute(
        f"SELECT id, {pii_count_expr(False)} AS n, "
        f"{scrub_pii_expr(False)} AS scrubbed FROM _pii_t ORDER BY id"
    ).fetchall()
    assert [(r["id"], r["n"], r["scrubbed"]) for r in s] == d
    spark.catalog.dropTempView("_pii_t")

    by_id = {r["id"]: r for r in s}
    assert by_id[0]["n"] == 2
    assert "<EMAIL>" in by_id[0]["scrubbed"]
    assert "<PHONE>" in by_id[0]["scrubbed"]
    assert "john.doe" not in by_id[0]["scrubbed"]
    # ssn scrubbed BEFORE the phone pattern could eat its digit run
    assert "<SSN>" in by_id[1]["scrubbed"] and "<IP>" in by_id[1]["scrubbed"]
    assert by_id[2]["scrubbed"] == cases[2]  # clean rows untouched
    assert by_id[5]["n"] == 0


def test_curate_scrub_pii(spark, tmp_path):
    """--scrub-pii: corpus text carries placeholders, audit keeps the
    original, stats report the scrub volume."""
    from pqstream_spark.curate import main
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .selectExpr("doc_id", "lang", "text").where("doc_id < 100")
    # plant PII into doc 1 (known to pass curation)
    docs = docs.selectExpr(
        "doc_id", "lang",
        "CASE WHEN doc_id = 1 THEN concat(text, "
        "' reach me at jane@corp.example.com or 555-867-5309') "
        "ELSE text END AS text",
    )
    inp = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(inp)
    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", inp, "--out", out_dir, "--scrub-pii",
                 "--cpus", "4"], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["pii_matches_scrubbed"] >= 2, stats

    corpus_row = spark.read.parquet(f"{out_dir}/corpus") \
        .where("doc_id = 1").collect()[0]
    assert "<EMAIL>" in corpus_row["text"]
    assert "<PHONE>" in corpus_row["text"]
    assert "jane@corp.example.com" not in corpus_row["text"]
    audit_row = spark.read.parquet(f"{out_dir}/audit") \
        .where("doc_id = 1").collect()[0]
    assert audit_row["n_pii"] == 2
    # the audit records the count and the scrubbed form; the original
    # text lives only in the input (never duplicated)
    assert "jane@corp.example.com" not in str(audit_row.asDict())


def test_stream_scrub_pii(spark, tmp_path):
    """Stream parity for --scrub-pii: accepted batch rows carry
    placeholder text and the n_pii count."""
    import glob
    import os
    import shutil

    from pqstream_spark.curate import curate_stream
    from pqstream_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .selectExpr("doc_id", "lang", "text").where("doc_id = 1") \
        .collect()[0]
    batch = spark.createDataFrame(
        [(1, base["lang"],
          base["text"] + " ping admin@internal.example.org now")],
        "doc_id long, lang string, text string",
    )
    stage = str(tmp_path / "stage")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    shutil.copy(os.path.join(stage, part),
                os.path.join(in_dir, "b0.parquet"))

    q = curate_stream(spark, in_dir, out_dir, scrub_pii=True)
    q.processAllAvailable()
    q.stop()
    parts = glob.glob(os.path.join(out_dir, "corpus", "batch-*"))
    row = spark.read.parquet(*parts).where("doc_id = 1").collect()[0]
    assert "<EMAIL>" in row["text"]
    assert "admin@internal.example.org" not in row["text"]
    assert row["n_pii"] == 1


def test_curate_new_flags_poison_tolerant(spark, tmp_path):
    """NULL/empty/whitespace texts flow through --scrub-pii +
    --decontaminate + --build-index without failing the job; the
    stats line still balances."""
    import io
    import json

    from pqstream_spark.curate import main

    rows = [(1, "en", "a healthy document with plenty of words to "
                      "keep around and score normally " * 3),
            (2, "en", None),
            (3, "en", ""),
            (4, "en", "   \n  \n "),
            (5, None, "reach me at x@y.example.org or 555-123-4567 "
                      "plus enough other words to pass the floors "
                      "and the classifier margin easily " * 2)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    src = str(tmp_path / "p.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    bench = spark.createDataFrame([("benchmark question unrelated",)],
                                  "text string")
    bp = str(tmp_path / "b.parquet")
    bench.coalesce(1).write.mode("overwrite").parquet(bp)

    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", src, "--out", out_dir, "--scrub-pii",
                 "--decontaminate", bp, "--build-index",
                 "--cpus", "4"], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["docs"] == 5
    assert stats["kept"] + sum(stats["rejected"].values()) == 5
    audit = spark.read.parquet(f"{out_dir}/audit")
    assert audit.count() == 5
    # the PII doc was scrubbed wherever it survived
    r5 = audit.where("doc_id = 5").collect()[0]
    assert r5["n_pii"] == 4  # the doubled text repeats email + phone


def test_pii_overlap_counts_equal_replacements(spark, duck):
    """An SSN-shaped digit run inside an email must count ONCE (the
    email scrub consumes it): n_pii equals the number of placeholders
    in the scrubbed text, in both engines."""
    from pqstream_spark.functions.pii import pii_count_expr, scrub_pii_expr

    cases = ["write 123-45-6789@example.com today",
             "ssn 123-45-6789 and mail 123-45-6789@example.com"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "id long, text string")
    df.createOrReplaceTempView("_pii_o")
    rows = spark.sql(
        f"SELECT id, {pii_count_expr(True)} AS n, "
        f"{scrub_pii_expr(True)} AS s FROM _pii_o ORDER BY id").collect()
    duck.execute("CREATE OR REPLACE TABLE _pii_o AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, '{c}')" for i, c in enumerate(cases))
                 + ") v(id, text)")
    drows = duck.execute(
        f"SELECT id, {pii_count_expr(False)} AS n, "
        f"{scrub_pii_expr(False)} AS s FROM _pii_o ORDER BY id").fetchall()
    assert [(r["id"], r["n"], r["s"]) for r in rows] == drows
    for r in rows:
        n_placeholders = sum(r["s"].count(p) for p in
                             ("<EMAIL>", "<SSN>", "<PHONE>", "<IP>"))
        assert r["n"] == n_placeholders, (r["s"], r["n"])
    assert rows[0]["n"] == 1   # the email consumed the SSN-shaped run
    assert rows[1]["n"] == 2
    spark.catalog.dropTempView("_pii_o")


def test_pii_fuzz_cross_engine(spark, duck):
    """Seeded fuzz: random texts mixing digits, dots, dashes, @ signs
    and words — counts and scrubbed strings identical between Java
    regex (Spark) and RE2 (DuckDB) on every case."""
    import random

    from pqstream_spark.functions.pii import pii_count_expr, scrub_pii_expr

    rng = random.Random(7117)
    frags = ["word", "42", "a.b", "x@y.zz", "555-123-4567", "1.2.3.4",
             "123-45-6789", "..", "@", "-", " ", "q9", "no",
             "user.name+tag@sub.example.org", "999.999.999.999",
             "12.34", "tel 555.987.6543"]
    cases = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
             for _ in range(80)]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "id long, text string")
    df.createOrReplaceTempView("_pii_f")
    s = [(r["id"], r["n"], r["s"]) for r in spark.sql(
        f"SELECT id, {pii_count_expr(True)} AS n, "
        f"{scrub_pii_expr(True)} AS s FROM _pii_f ORDER BY id").collect()]
    duck.execute(
        "CREATE OR REPLACE TABLE _pii_f (id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO _pii_f VALUES (?, ?)",
                     list(enumerate(cases)))
    d = duck.execute(
        f"SELECT id, {pii_count_expr(False)} AS n, "
        f"{scrub_pii_expr(False)} AS s FROM _pii_f ORDER BY id").fetchall()
    assert s == d
    spark.catalog.dropTempView("_pii_f")

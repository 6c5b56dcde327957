"""Round-6 hardening: the four ADVICE findings plus the in-engine
sample-cap rework (VERDICT ask #3).

- `index add` on a --pq index PQ-encodes the additions (previously the
  cells dir got mixed schemas and added vectors were invisible to ADC).
- `curate --bpe` tolerates duplicate doc_ids (k² join-row blowup).
- resize_images degrades a zero-dim FIMG poison blob to NULL instead of
  raising ZeroDivisionError inside the task.
- train_pq_codebooks raises a clear ValueError on an empty sample
  (previously returned [] → pq_encode_expr emitted invalid SQL).
- PQ/BPE trainer caps run IN-ENGINE as a sorted LIMIT
  (TakeOrderedAndProject) and select bit-identical rows to the old
  collect-then-cap path.
"""

from __future__ import annotations

import io
import json


def test_index_add_pq_encodes_additions(spark, tmp_path):
    from pqstream_spark.index import main
    from pqstream_spark.sources.tables import load_table

    def write(where, name):
        df = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
            .selectExpr("vec_id", "embedding").where(where)
        p = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(p)
        return p

    base = write("vec_id >= 50", "base.parquet")
    more = write("vec_id < 50", "more.parquet")
    idx = str(tmp_path / "idx")

    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx, "--pq"],
                out=buf) == 0
    assert json.loads(buf.getvalue())["pq"] is True

    buf = io.StringIO()
    assert main(["add", "--index", idx, "--embeddings", more], out=buf) == 0
    assert json.loads(buf.getvalue())["added"] == 50

    # every stored row (built AND added) carries a non-null PQ code —
    # one schema across the cells directory
    cells = spark.read.parquet(f"{idx}/cells")
    assert "code" in cells.columns
    assert cells.where("code IS NULL").count() == 0
    assert cells.count() == 500

    # an ADC search that probes all cells can retrieve an ADDED vector:
    # perturb vec_id 7 (an addition) and expect it as the top hit
    probe = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id = 7").selectExpr(
            "900007 AS vec_id",
            "transform(embedding, x -> CAST(x AS DOUBLE) * 1.001) AS embedding",
        )
    qp = str(tmp_path / "probe.parquet")
    probe.coalesce(1).write.mode("overwrite").parquet(qp)
    with open(f"{idx}/codebook.json") as f:
        ncells = len(json.load(f)["codebook"])
    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qp, "--k", "3",
                 "--adc", "--nprobe", str(ncells)], out=buf) == 0
    hits = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert hits and min(hits, key=lambda h: h["rn"])["c_id"] == 7, hits


def test_curate_bpe_duplicate_doc_ids(spark, tmp_path):
    """Exact-dup texts derive the SAME xxhash64 doc_id; the --bpe join
    must not square those rows: docs == input row count, and every
    audit doc_id appears exactly as often as in the input."""
    from pqstream_spark.curate import main

    rows = [("alpha beta gamma delta " * 10,)] * 3 + [
        ("unique document text number %d with some words" % i,)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "text string")
    src = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(src)

    out_dir = str(tmp_path / "out")
    buf = io.StringIO()
    assert main(["--documents", src, "--out", out_dir, "--bpe",
                 "--cpus", "4"], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["docs"] == 23, stats
    audit = spark.read.parquet(f"{out_dir}/audit")
    assert audit.count() == 23
    assert "n_bpe_tokens" in audit.columns
    # the three exact-dup rows share one id and all three survive the
    # join exactly once each
    dup = audit.groupBy("doc_id").count().where("count > 1").collect()
    assert len(dup) == 1 and dup[0]["count"] == 3


def test_resize_zero_dim_fimg_degrades_to_null(spark):
    from pqstream_spark.functions.multimodal import (
        encode_fake_image,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, encode_fake_image(1, 0, 0)),     # poison: zero dims
         (2, encode_fake_image(2, 40, 20))],  # healthy fake
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in resize_images(df, 16).collect()}
    assert rows[1]["width"] is None and rows[1]["content"] is None
    assert rows[2]["width"] == 16 and rows[2]["height"] == 8


def test_pq_empty_sample_raises(spark):
    import pytest

    from pqstream_spark.functions.pq import pq_encode_expr, train_pq_codebooks

    # only zero vectors → the n2 > 0 guard empties the sample
    zeros = spark.createDataFrame(
        [(i, [0.0] * 64) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="empty training sample"):
        train_pq_codebooks(zeros)
    with pytest.raises(ValueError, match="empty codebook"):
        pq_encode_expr([])


def test_trainer_caps_run_in_engine(spark):
    """The sorted-LIMIT sample cap plans as TakeOrderedAndProject (a
    distributed top-k, never a full-sample collect) and picks exactly
    the rows the old driver-side sort_and_cap picked."""
    from pqstream_spark.functions.sampling import (
        capped_sample_df,
        sample_pred,
        sort_and_cap,
    )
    from pqstream_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .select("vec_id").where(sample_pred("vec_id"))
    capped = capped_sample_df(emb, "vec_id", 10)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    engine = [r["vec_id"] for r in capped.collect()]
    driver = [r["vec_id"]
              for r in sort_and_cap(emb.collect(), "vec_id", 10)]
    assert engine == driver

    # the trained artifacts themselves stay deterministic through the
    # new path (bit-identity with the r5 artifacts is implied: same
    # selected rows, same math — pinned by the equality above plus the
    # existing determinism tests)
    from pqstream_spark.functions.bpe import train_bpe_from

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    assert train_bpe_from(docs, n_merges=30) == \
        train_bpe_from(docs, n_merges=30)


def test_arrow_search_query_collect_is_bounded(spark):
    """Round-7 ask #4: search_ivf_index_arrow must never materialize
    an unbounded query frame on the driver — the collect runs through
    an in-engine LIMIT, and exceeding max_queries raises a clear error
    steering to the zero-collect expression path."""
    import pytest

    from pqstream_spark.queries.llm import (
        search_ivf_index_arrow,
        train_ivf_codebook,
    )
    from pqstream_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
    )
    cb = train_ivf_codebook(spark, SF_SMOKE)
    from pqstream_spark.queries.llm import assign_ivf_cells

    index = assign_ivf_cells(emb, cb)
    queries = emb.selectExpr("vec_id AS q_id", "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        search_ivf_index_arrow(index, queries, cb, k=3, max_queries=100)
    # within the bound it works unchanged
    small = queries.where("q_id < 5")
    assert search_ivf_index_arrow(index, small, cb, k=3,
                                  max_queries=100).count() == 15

"""The index CLI (`python -m pqstream_spark.index`): build / add /
search drive the same library code as the oracle-checked entry; this
exercises the on-disk lifecycle — codebook.json + cell-partitioned
parquet, appends landing in the right cells, search reading only
probed cells."""

from __future__ import annotations

import io
import json
import os


def _emb_parquet(spark, tmp_path, name, where):
    from pqstream_spark.sources.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "embeddings").selectExpr(
        "vec_id", "embedding"
    ).where(where)
    p = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_index_build_add_search(spark, tmp_path):
    from pqstream_spark.index import main

    base = _emb_parquet(spark, tmp_path, "base.parquet", "vec_id >= 20")
    more = _emb_parquet(spark, tmp_path, "more.parquet", "vec_id < 20")
    qs = _emb_parquet(spark, tmp_path, "qs.parquet", "vec_id IN (3, 7)")
    idx = str(tmp_path / "idx")

    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["indexed"] == 480 and 1 <= stats["cells"] <= 8
    assert os.path.exists(os.path.join(idx, "codebook.json"))
    cells_dir = os.path.join(idx, "cells")
    assert any(d.startswith("cell=") for d in os.listdir(cells_dir))

    buf = io.StringIO()
    assert main(["add", "--index", idx, "--embeddings", more], out=buf) == 0
    assert json.loads(buf.getvalue())["added"] == 20
    assert spark.read.parquet(cells_dir).count() == 500

    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qs, "--k", "3"],
                out=buf) == 0
    hits = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert {h["q_id"] for h in hits} == {3, 7}
    for q in (3, 7):
        qh = [h for h in hits if h["q_id"] == q]
        assert [h["rn"] for h in qh] == list(range(1, len(qh) + 1))
        assert all(h["c_id"] != q for h in qh), "self excluded by default"
        cos = [h["cos"] for h in qh]
        assert cos == sorted(cos, reverse=True)

    # parity with the library search over the same frames
    from pqstream_spark.queries.llm import search_ivf_index

    cb = json.load(open(os.path.join(idx, "codebook.json")))["codebook"]
    lib = search_ivf_index(
        spark.read.parquet(cells_dir),
        spark.read.parquet(qs).withColumnRenamed("vec_id", "q_id"),
        cb, k=3,
    ).collect()
    assert {(r["q_id"], r["c_id"], r["rn"]) for r in lib} == {
        (h["q_id"], h["c_id"], h["rn"]) for h in hits
    }


def test_index_pq_build_and_adc_search(spark, tmp_path):
    """--pq stores an 8-byte packed code per vector alongside the cell;
    search --adc ranks candidates from the codes alone (asymmetric
    distance) and still retrieves a perturbed vector's original."""
    import io
    import json as _json

    from pqstream_spark.index import main
    from pqstream_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").selectExpr(
        "vec_id", "embedding"
    )
    base = str(tmp_path / "pq_base.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(base)
    idx = str(tmp_path / "pq_idx")

    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx, "--pq"],
                out=buf) == 0
    stats = _json.loads(buf.getvalue())
    assert stats["pq"] is True
    meta = _json.load(open(os.path.join(idx, "codebook.json")))
    assert "pq_books" in meta and len(meta["pq_books"]) == 8
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    assert "code" in cells.columns

    # probe: a perturbed copy of vector 31
    probe = spark.read.parquet(base).where("vec_id = 31").selectExpr(
        "931 AS vec_id",
        "transform(embedding, x -> x * CAST(1.001 AS DOUBLE)) AS embedding",
    )
    qp = str(tmp_path / "pq_q.parquet")
    probe.coalesce(1).write.mode("overwrite").parquet(qp)

    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qp, "--k", "3",
                 "--adc"], out=buf) == 0
    hits = [_json.loads(l) for l in buf.getvalue().splitlines()]
    assert hits and hits[0]["rn"] == 1 and hits[0]["c_id"] == 31, hits
    assert all("score" in h for h in hits)

    # an index built WITHOUT --pq refuses --adc with a clear error
    idx2 = str(tmp_path / "plain_idx")
    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx2], out=buf) == 0
    assert main(["search", "--index", idx2, "--queries", qp, "--adc"]) == 1


def test_index_compact(spark, tmp_path):
    """`index compact`: repeated adds leave sliver files per cell;
    compact rewrites each cell as few compact files with identical
    content and identical search results."""
    import glob
    import io
    import json

    from pqstream_spark.index import main

    base = _emb_parquet(spark, tmp_path, "c_base.parquet", "vec_id >= 100")
    idx = str(tmp_path / "cidx")
    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx], out=buf) == 0

    for lo, hi, name in ((0, 50, "a1"), (50, 100, "a2")):
        more = _emb_parquet(spark, tmp_path, f"{name}.parquet",
                            f"vec_id >= {lo} AND vec_id < {hi}")
        assert main(["add", "--index", idx, "--embeddings", more],
                    out=io.StringIO()) == 0

    qs = _emb_parquet(spark, tmp_path, "cq.parquet", "vec_id IN (3, 7)")
    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qs, "--k", "3",
                 "--nprobe", "8"], out=buf) == 0
    before_hits = buf.getvalue()
    rows_before = spark.read.parquet(f"{idx}/cells").count()

    buf = io.StringIO()
    assert main(["compact", "--index", idx], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["rows"] == rows_before == 500
    assert stats["files_after"] < stats["files_before"], stats
    files = glob.glob(os.path.join(idx, "cells", "*", "*.parquet"))
    assert len(files) == stats["files_after"]

    assert spark.read.parquet(f"{idx}/cells").count() == rows_before
    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qs, "--k", "3",
                 "--nprobe", "8"], out=buf) == 0
    assert buf.getvalue() == before_hits, "search unchanged by compaction"


def test_index_search_by_documents(spark, tmp_path):
    """`index search --documents`: text in, neighbors out — the
    docs→embed→index→search pipeline as one CLI. A truncated
    near-copy of a corpus document retrieves the original."""
    import io
    import json

    from pqstream_spark.functions.embeddings import embed_documents
    from pqstream_spark.index import main
    from pqstream_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    emb = embed_documents(docs)
    ep = str(tmp_path / "emb.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(ep)
    idx = str(tmp_path / "idx")
    assert main(["build", "--embeddings", ep, "--out", idx,
                 "--embedder", "md5-hash-v1"],
                out=io.StringIO()) == 0

    target = docs.where("doc_id = 42").collect()[0]["text"]
    qd = spark.createDataFrame(
        [(990042, target[: len(target) - 8])],  # near-copy query text
        "doc_id long, text string",
    )
    qp = str(tmp_path / "qdocs.parquet")
    qd.coalesce(1).write.mode("overwrite").parquet(qp)

    with open(f"{idx}/codebook.json") as f:
        ncells = len(json.load(f)["codebook"])
    buf = io.StringIO()
    assert main(["search", "--index", idx, "--documents", qp,
                 "--k", "3", "--nprobe", str(ncells)], out=buf) == 0
    hits = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert hits and min(hits, key=lambda h: h["rn"])["c_id"] == 42, hits

    # an index that does NOT record the md5-hash-v1 embedder identity
    # must refuse --documents (cosine across unrelated embedding
    # spaces is silently meaningless — ADVICE r6)
    idx2 = str(tmp_path / "idx_noembedder")
    assert main(["build", "--embeddings", ep, "--out", idx2],
                out=io.StringIO()) == 0
    assert main(["search", "--index", idx2, "--documents", qp,
                 "--k", "3"], out=io.StringIO()) == 2


def test_index_pq_residual_build_add_and_adc_search(spark, tmp_path):
    """--pq --residual stores IVFADC residual codes; search --adc
    transparently applies the per-cell coarse term (meta.pq_residual)
    and still retrieves a perturbed vector's original; `add` encodes
    additions as residuals against the STORED codebooks so old and new
    codes score alike."""
    import io
    import json as _json

    from pqstream_spark.index import main
    from pqstream_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").selectExpr(
        "vec_id", "embedding"
    )
    base = str(tmp_path / "res_base.parquet")
    emb.where("vec_id < 400").coalesce(1).write.mode("overwrite").parquet(base)
    idx = str(tmp_path / "res_idx")

    buf = io.StringIO()
    assert main(["build", "--embeddings", base, "--out", idx, "--pq",
                 "--residual"], out=buf) == 0
    meta = _json.load(open(os.path.join(idx, "codebook.json")))
    assert meta.get("pq_residual") is True and "pq_books" in meta

    # --residual without --pq is a usage error
    assert main(["build", "--embeddings", base,
                 "--out", str(tmp_path / "bad"), "--residual"]) == 2

    # add the remaining vectors — encoded as residuals via stored books
    rest = str(tmp_path / "res_rest.parquet")
    emb.where("vec_id >= 400").coalesce(1).write.mode("overwrite").parquet(rest)
    buf = io.StringIO()
    assert main(["add", "--index", idx, "--embeddings", rest], out=buf) == 0
    assert _json.loads(buf.getvalue())["added"] > 0

    # a perturbed copy of an ADDED vector retrieves its original
    probe = emb.where("vec_id = 450").selectExpr(
        "900450 AS vec_id",
        "transform(embedding, x -> x * CAST(1.001 AS DOUBLE)) AS embedding",
    )
    qp = str(tmp_path / "res_q.parquet")
    probe.coalesce(1).write.mode("overwrite").parquet(qp)
    buf = io.StringIO()
    assert main(["search", "--index", idx, "--queries", qp, "--k", "3",
                 "--adc"], out=buf) == 0
    hits = [_json.loads(l) for l in buf.getvalue().splitlines()]
    assert hits and hits[0]["rn"] == 1 and hits[0]["c_id"] == 450, hits

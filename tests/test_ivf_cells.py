"""Parameterized IVF cell count (round-6 ask #2): K is a build-time
parameter end-to-end (`_ivf_train_cte` → `train_ivf_codebook_from` →
`index build --cells K`), recall is monotone in nprobe at large K, and
probing all K cells is exact within the index. The oracle entry keeps
K=8, pinned here so catalog hashes cannot drift."""

from __future__ import annotations

import io
import json

import numpy as np


def _synth_corpus(spark, copies: int = 16):
    """~8k DISTINCT vectors: re-keyed copies of sf0.001's 500
    embeddings, each copy deterministically perturbed (clones would
    collapse into identical cells and make recall degenerate)."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from pqstream_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .selectExpr("vec_id",
                    "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    # NOTE (round 15): a crossJoin-with-range rewrite (one plan instead
    # of a `copies`-way union) produces bit-identical rows and analyzes
    # ~4 s faster — but its output inherits the single-partition base
    # scan, which SERIALIZED the downstream parquet write + index build
    # in the end-to-end tests (k_cells 26 → 51 s module-cold; measured,
    # reverted). The union keeps one partition per copy.
    parts = []
    for k in range(copies):
        parts.append(base.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, i) -> x + "
                f"cos(CAST(vec_id % 97 + i * {k + 1} AS DOUBLE)) * 0.2)"
            ).alias("embedding"),
        ))
    return reduce(DataFrame.unionByName, parts)


def test_k_cells_end_to_end(spark, tmp_path):
    from pqstream_spark.queries.llm import search_ivf_index
    from pqstream_spark.index import main

    corpus = _synth_corpus(spark)
    src = str(tmp_path / "corpus.parquet")
    corpus.write.mode("overwrite").parquet(src)

    idx = str(tmp_path / "idx16")
    buf = io.StringIO()
    assert main(["build", "--embeddings", src, "--out", idx,
                 "--cells", "16"], out=buf) == 0
    stats = json.loads(buf.getvalue())
    assert stats["cells"] == 16 and stats["indexed"] == 500 * 16

    with open(f"{idx}/codebook.json") as f:
        cb = json.load(f)["codebook"]
    assert len(cb) == 16

    index = spark.read.parquet(f"{idx}/cells")
    queries = corpus.where("vec_id < 10")\
        .selectExpr("vec_id AS q_id", "embedding")

    # ground truth: exact cosine top-5 over the whole corpus, driver-side
    rows = corpus.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    nv = {v: x / np.linalg.norm(x) for v, x in vecs.items()
          if np.linalg.norm(x) > 0}
    exact = {}
    for q in range(10):
        sims = sorted(((round(float(np.dot(nv[q], nv[v])), 6), v)
                       for v in nv if v != q),
                      key=lambda t: (-t[0], t[1]))[:5]
        exact[q] = {v for _, v in sims}

    recalls = []
    for nprobe in (1, 4, 16):
        hits = search_ivf_index(index, queries, cb, k=5, nprobe=nprobe)
        got = {}
        for r in hits.collect():
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        recalls.append(
            sum(len(exact[q] & got.get(q, set())) for q in range(10)) / 50.0
        )
    # recall is monotone in nprobe, and probing ALL cells is exact
    # within the index (every vector is indexed, so exact == full probe)
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] == 1.0, recalls
    # large K must actually prune: one-probe search touches 1/16 of the
    # corpus on average, so its candidate sets are real subsets
    assert recalls[0] < 1.0 or len(cb) == 1


def test_catalog_entry_keeps_k8(spark):
    """The oracle-checked entry's training phase stays at K=8 — the
    default — so CORRECTNESS hashes cannot move."""
    import inspect

    from pqstream_spark.queries import llm

    assert inspect.signature(llm.train_ivf_codebook_from)\
        .parameters["k_cells"].default == 8
    assert "rn <= 8" not in llm._ivf_train_cte(True)  # constant is gone
    assert "LIMIT 8" in llm._ivf_train_cte(True)
    assert "LIMIT 64" in llm._ivf_train_cte(True, k_cells=64)


def test_numpy_assignment_equals_expr_assignment(spark):
    """K > ASSIGN_STATIC_MAX_K routes assignment through the Arrow/
    numpy matmul; its cells are bit-identical to the HOF expression
    form (same integer quantization, same first-max tie-break)."""
    from pqstream_spark.queries.llm import (
        ASSIGN_STATIC_MAX_K,
        assign_ivf_cells,
        ivf_cell_expr,
        train_ivf_codebook_from,
    )

    # materialize the 8-way union once: Catalyst re-optimizing the
    # union-of-transforms under BOTH the Lloyd iterations and the huge
    # k=32 literal expression dominated this test (57 s → 24 s; the
    # assignment parity being certified is unchanged — same rows in).
    corpus = _synth_corpus(spark, copies=8).localCheckpoint(eager=True)
    cb = train_ivf_codebook_from(corpus, k_cells=32)
    assert len(cb) == 32 > ASSIGN_STATIC_MAX_K

    via_np = {r["vec_id"]: r["cell"]
              for r in assign_ivf_cells(corpus, cb).collect()}
    via_expr = {r["vec_id"]: r["cell"]
                for r in corpus.selectExpr(
                    "vec_id", f"{ivf_cell_expr(cb)} AS cell"
                ).where("cell IS NOT NULL").collect()}
    assert via_np == via_expr and len(via_np) == 4000


def test_arrow_search_equals_expression_search(spark, tmp_path):
    """search_ivf_index_arrow (numpy partial-top-k scan) returns
    exactly what the expression path returns, across nprobe settings."""
    from pqstream_spark.index import main
    from pqstream_spark.queries.llm import (
        search_ivf_index,
        search_ivf_index_arrow,
    )
    import json as _json

    corpus = _synth_corpus(spark, copies=8)
    src = str(tmp_path / "c.parquet")
    corpus.write.mode("overwrite").parquet(src)
    idx = str(tmp_path / "idx")
    import io

    buf = io.StringIO()
    assert main(["build", "--embeddings", src, "--out", idx,
                 "--cells", "16"], out=buf) == 0
    with open(f"{idx}/codebook.json") as f:
        cb = _json.load(f)["codebook"]
    index = spark.read.parquet(f"{idx}/cells")
    queries = corpus.where("vec_id < 10").selectExpr(
        "vec_id AS q_id", "embedding")

    for nprobe in (1, 4, 16):
        a = {(r["q_id"], r["c_id"], r["cos"], r["rn"])
             for r in search_ivf_index_arrow(
                 index, queries, cb, k=5, nprobe=nprobe).collect()}
        b = {(r["q_id"], r["c_id"], r["cos"], r["rn"])
             for r in search_ivf_index(
                 index, queries, cb, k=5, nprobe=nprobe).collect()}
        assert a == b, nprobe


def test_probe_frag_matches_production_probe_expr(spark):
    """Guard against divergence between the certification branches'
    _probe_cells_frag and production's ivf_probe_cells_expr: both
    rank cells with the same (-dot, cid) total order, so they must
    pick identical cells at every nprobe."""
    from pqstream_spark.queries.llm import (
        _ivf_parts,
        _norm2_expr,
        _norm_vec_expr,
        _probe_cells_frag,
        ivf_probe_cells_expr,
        train_ivf_codebook_from,
    )
    from pqstream_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .selectExpr("vec_id",
                    "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    cb = train_ivf_codebook_from(emb)
    p = _ivf_parts(True)
    nv = _norm_vec_expr(True)
    n2 = _norm2_expr(True)
    lit = "array(" + ", ".join(
        "array(" + ", ".join(f"{int(v)}L" for v in cv) + ")" for cv in cb
    ) + ")"
    base = emb.where(f"{n2} > 0").selectExpr(
        "vec_id", f"{nv} AS nv"
    ).selectExpr("vec_id", f"{p['qv']} AS qv").localCheckpoint(eager=True)
    for nprobe in (1, 2, len(cb)):
        frag = {r["vec_id"]: r["cells"] for r in base.selectExpr(
            "vec_id",
            f"{_probe_cells_frag(True, nprobe, p['ds']('qv', lit))} AS cells",
        ).collect()}
        prod = {r["vec_id"]: r["cells"] for r in emb.selectExpr(
            "vec_id", f"{ivf_probe_cells_expr(cb, nprobe)} AS cells"
        ).where("cells IS NOT NULL").collect()}
        assert frag == prod, nprobe

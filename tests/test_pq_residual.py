"""Residual IVF-PQ (true IVFADC — Jégou et al. 2011 §III): codes
quantize x − centroid(cell) with residual-trained books; search adds
the exact coarse term dot(q, centroid(cell)) per probed cell.

Pins: determinism, Arrow/SQL encode parity, exact integer score
decomposition (ADC score == dot(q, centroid + reconstructed residual)),
near-copy retrieval, and the round-7 ask — residual recall@5 >= the
raw-code path's recall@5 on a structured (clustered near-copy) corpus,
where residual encoding stops spending its 8 bytes re-describing cell
identity."""

from __future__ import annotations

from functools import reduce

import pytest

from tests.conftest import SF_SMOKE


def _emb(spark):
    from pqstream_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
    )


@pytest.fixture(scope="module")
def setup(spark):
    from pqstream_spark.functions.pq import (
        pq_encode_ivf,
        train_pq_codebooks,
        train_pq_codebooks_residual,
    )
    from pqstream_spark.queries.llm import train_ivf_codebook

    emb = _emb(spark)
    cb = train_ivf_codebook(spark, SF_SMOKE)
    rbooks = train_pq_codebooks_residual(emb, cb)
    books = train_pq_codebooks(emb)
    rcodes = pq_encode_ivf(emb, cb, rbooks).localCheckpoint(eager=True)
    return {"emb": emb, "cb": cb, "rbooks": rbooks, "books": books,
            "rcodes": rcodes}


def test_residual_training_deterministic(spark, setup):
    from pqstream_spark.functions.pq import train_pq_codebooks_residual

    again = train_pq_codebooks_residual(setup["emb"], setup["cb"])
    assert again == setup["rbooks"], "residual training must be repeatable"
    assert len(again) == 8 and all(len(bk) == 16 for bk in again)
    # residual books differ from raw books: they model x - centroid
    assert again != setup["books"]


def test_residual_encode_arrow_equals_sql(spark, setup):
    from pqstream_spark.functions.pq import pq_encode_ivf

    sql_rows = {(r["vec_id"]): (r["cell"], r["code"])
                for r in setup["rcodes"].collect()}
    np_rows = {(r["vec_id"]): (r["cell"], r["code"])
               for r in pq_encode_ivf(setup["emb"], setup["cb"],
                                      setup["rbooks"],
                                      arrow=True).collect()}
    assert sql_rows == np_rows and len(np_rows) == 500


def test_residual_score_is_exact_decomposition(spark, setup):
    """Full-probe residual search scores must equal the exact integer
    dot(qv_q, centroid(cell) + reconstructed residual) recomputed
    driver-side from the code nibbles — the IVFADC decomposition with
    zero float drift."""
    from pqstream_spark.functions.pq import ivfpq_search
    from pqstream_spark.queries.llm import _norm_vec_expr

    cb, rbooks = setup["cb"], setup["rbooks"]
    queries = setup["emb"].where("vec_id < 3").selectExpr(
        "vec_id AS q_id", "embedding")
    hits = ivfpq_search(setup["rcodes"], queries, cb, rbooks, k=5,
                        nprobe=len(cb), residual=True).collect()
    assert hits

    nv = _norm_vec_expr(True)
    qv_rows = {
        r["q_id"]: list(r["qv"])
        for r in queries.selectExpr(
            "q_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        ).collect()
    }
    meta = {r["vec_id"]: (r["cell"], r["code"])
            for r in setup["rcodes"].collect()}
    m, sub = len(rbooks), len(rbooks[0][0])
    for h in hits:
        cell, code = meta[h["c_id"]]
        centroid = cb[int(cell) - 1]
        recon = list(centroid)
        for mi in range(m):
            c = (code >> (4 * mi)) & 15
            for j in range(sub):
                recon[mi * sub + j] += rbooks[mi][c][j]
        want = sum(q * x for q, x in zip(qv_rows[h["q_id"]], recon))
        assert h["score"] == want, (h, want)


def test_residual_near_copy_retrieval(spark, setup):
    from pqstream_spark.functions.pq import ivfpq_search

    probe = setup["emb"].where("vec_id = 23").selectExpr(
        "900023 AS q_id",
        "transform(embedding, x -> x * CAST(1.001 AS DOUBLE)) AS embedding",
    )
    hits = ivfpq_search(setup["rcodes"], probe, setup["cb"],
                        setup["rbooks"], k=3, nprobe=1,
                        residual=True).collect()
    assert hits and min(hits, key=lambda r: r["rn"])["c_id"] == 23, hits


def test_residual_dim_mismatch_scores_not_null(spark, setup):
    """ADVICE r7: the cell_offset fold null-padded when the query dim
    differs from the coarse-codebook dim, silently ranking every row
    with a NULL score. The centroid is now sliced to size(qv) and
    zero-coalesced (the _residual_rel_sql / demo-codebook get()
    semantics), so a coarse codebook of a different dim yields real
    integer scores — missing dims contribute 0, never NULL."""
    from pqstream_spark.functions.pq import ivfpq_search

    dim = len(setup["cb"][0])
    # a coarse codebook truncated to half the embedding dim — the
    # mismatched-artifact shape (e.g. an IVF codebook trained on a
    # different embedder) the fold must not silently NULL-rank
    cb_short = [c[: dim // 2] for c in setup["cb"]]
    queries = setup["emb"].where("vec_id = 5").selectExpr(
        "900005 AS q_id", "embedding"
    )
    hits = ivfpq_search(setup["rcodes"], queries, cb_short,
                        setup["rbooks"], k=3, nprobe=2,
                        residual=True).collect()
    assert hits, "mismatched coarse dim must still retrieve"
    assert all(h["score"] is not None for h in hits), hits


def test_residual_recall_beats_raw_on_clustered_corpus(spark):
    """The round-7 ask's 'done' pin: on a STRUCTURED corpus (8 tight
    clusters of 60 near-copies with per-copy perturbation magnitudes
    spanning an int8-resolvable range — the regime real embedding
    corpora live in, and the one where raw-code PQ wastes its bytes
    re-describing the cluster), residual recall@5 vs exact must be
    >= the raw-code path's, AND the reconstruction error — the
    mechanism behind the recall — must drop by a wide margin
    (Jégou 2011 §III: residual energy << vector energy)."""
    import numpy as np
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from pqstream_spark.functions.pq import (
        ivfpq_search,
        pq_encode,
        pq_encode_ivf,
        train_pq_codebooks,
        train_pq_codebooks_residual,
    )
    from pqstream_spark.queries.llm import (
        ivf_cell_expr,
        train_ivf_codebook_from,
    )

    base = _emb(spark).where("vec_id < 8")
    # ONE crossJoin plan instead of a 60-way union of transform
    # branches: Catalyst spent ~10 s (driver-side) analyzing the union
    # tree; the crossJoin evaluates the SAME Spark expressions per
    # (row, k) — verified bit-identical output (round 15, suite
    # budget). `%.3f` on the magnitude is reproduced by printf; the
    # original formula's `vec_id` is the pre-offset id (< 1000 here).
    ks = spark.range(60).select(
        F.col("id").cast("int").alias("k"),
        F.expr("CAST(printf('%.3f', CAST(0.05 + 0.03 * (id % 10) "
               "AS DOUBLE)) AS DOUBLE)").alias("mag"),
    )
    corpus = (
        base.crossJoin(ks)
        .select(
            (F.col("vec_id") + F.col("k").cast("long") * 1000)
            .alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + "
                "cos(CAST(i * 17 + k * 29 + (vec_id % 1000) AS DOUBLE))"
                " * mag)"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    cb = train_ivf_codebook_from(corpus, k_cells=8)

    # raw-code IVF-PQ (the pre-round-7 path)
    books = train_pq_codebooks(corpus)
    codes = pq_encode(corpus, books).join(
        corpus.selectExpr("vec_id", f"{ivf_cell_expr(cb)} AS cell"),
        "vec_id",
    ).localCheckpoint(eager=True)
    # residual IVF-PQ
    rbooks = train_pq_codebooks_residual(corpus, cb)
    rcodes = pq_encode_ivf(corpus, cb, rbooks).localCheckpoint(eager=True)

    queries = corpus.where("vec_id >= 1000 AND vec_id < 1008").selectExpr(
        "vec_id AS q_id", "embedding")

    rows = corpus.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    nvs = {v: x / np.linalg.norm(x) for v, x in vecs.items()
           if np.linalg.norm(x) > 0}
    qids = sorted(v for v in nvs if 1000 <= v < 1008)
    exact = {}
    for q in qids:
        sims = sorted(((round(float(np.dot(nvs[q], nvs[v])), 6), v)
                       for v in nvs if v != q), key=lambda t: (-t[0], t[1]))[:5]
        exact[q] = {v for _, v in sims}

    def recall(hits):
        got = {}
        for r in hits:
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        return sum(len(exact[q] & got.get(q, set()))
                   for q in qids) / (5.0 * len(qids))

    nprobe = len(cb)  # full probe isolates code quality from pruning
    raw = recall(ivfpq_search(codes, queries, cb, books, k=5,
                              nprobe=nprobe).collect())
    res = recall(ivfpq_search(rcodes, queries, cb, rbooks, k=5,
                              nprobe=nprobe, residual=True).collect())
    assert res >= raw, f"residual recall {res} < raw recall {raw}"
    assert res >= 0.3, f"residual recall degenerated: {res}"

    # the mechanism: integer reconstruction error must drop sharply
    qv = {v: np.round(127 * nvs[v]).astype(np.int64) for v in nvs}
    m, sub = len(books), len(books[0][0])
    raw_codes = {r["vec_id"]: r["code"]
                 for r in codes.select("vec_id", "code").collect()}
    res_meta = {r["vec_id"]: (r["cell"], r["code"])
                for r in rcodes.collect()}

    def recon_raw(code):
        v = np.zeros(m * sub, dtype=np.int64)
        for mi in range(m):
            v[mi * sub:(mi + 1) * sub] = books[mi][(code >> (4 * mi)) & 15]
        return v

    def recon_res(cell, code):
        v = np.array(cb[int(cell) - 1], dtype=np.int64)
        for mi in range(m):
            v[mi * sub:(mi + 1) * sub] += np.array(
                rbooks[mi][(code >> (4 * mi)) & 15])
        return v

    e_raw = float(np.mean(
        [np.sum((qv[v] - recon_raw(raw_codes[v])) ** 2) for v in qv]))
    e_res = float(np.mean(
        [np.sum((qv[v] - recon_res(*res_meta[v])) ** 2) for v in qv]))
    assert e_res < 0.75 * e_raw, (
        f"residual reconstruction MSE {e_res} not clearly below raw "
        f"{e_raw} — the IVFADC mechanism is not engaging"
    )

"""Product quantization: 64x-compressed codes + ADC search.

Pins the integer discipline (deterministic training/encoding), the
compression claim (one BIGINT per vector), and retrieval quality (a
near-copy's original is the ADC top hit; ADC top-5 overlaps exact
cosine top-5 well above chance)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _emb(spark):
    from pqstream_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
    )


def test_pq_training_and_encoding_deterministic(spark):
    from pqstream_spark.functions.pq import pq_encode, train_pq_codebooks

    emb = _emb(spark)
    b1 = train_pq_codebooks(emb)
    b2 = train_pq_codebooks(emb)
    assert b1 == b2, "training must be run-to-run identical"
    assert len(b1) == 8 and all(len(bk) == 16 for bk in b1)
    assert all(isinstance(x, int) for bk in b1 for c in bk for x in c)

    c1 = {r["vec_id"]: r["code"] for r in pq_encode(emb, b1).collect()}
    c2 = {r["vec_id"]: r["code"] for r in pq_encode(emb, b1).collect()}
    assert c1 == c2
    assert len(c1) == 500
    # one BIGINT per vector: the 64x compression claim is the schema
    df = pq_encode(emb, b1)
    assert df.schema.simpleString() == "struct<vec_id:bigint,code:bigint>"
    # scale-invariance: normalizing first makes a rescaled vector
    # encode to the same code
    scaled = emb.where("vec_id = 9").selectExpr(
        "vec_id", "transform(embedding, x -> x * CAST(3.0 AS DOUBLE)) AS embedding"
    )
    assert pq_encode(scaled, b1).collect()[0]["code"] == c1[9]


def test_pq_adc_retrieval_quality(spark):
    import numpy as np

    from pqstream_spark.functions.pq import (
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )

    emb = _emb(spark)
    books = train_pq_codebooks(emb)
    codes = pq_encode(emb, books).localCheckpoint(eager=True)

    # a small perturbation of vector 17 must retrieve 17 as top hit
    probe = emb.where("vec_id = 17").selectExpr(
        "900017 AS q_id",
        "transform(embedding, x -> x * CAST(1.002 AS DOUBLE) "
        "+ CAST(0.001 AS DOUBLE)) AS embedding",
    )
    hits = pq_search(codes, probe, books, k=3).collect()
    assert hits and min(hits, key=lambda r: r["rn"])["c_id"] == 17, hits

    # ADC top-5 vs exact cosine top-5: the driver corpus is near-random
    # 64-dim noise — PQ's information-theoretic worst case (8 bytes
    # cannot preserve random directions) — so the pin is "an order of
    # magnitude above the ~5*5/499 ≈ 0.05 chance level", not high
    # absolute recall; the near-copy top-1 retrieval above is the
    # strong signal (structured similarity survives compression)
    queries = emb.where("vec_id < 10").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    adc = {}
    for r in pq_search(codes, queries, books, k=5).collect():
        adc.setdefault(r["q_id"], set()).add(r["c_id"])
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    nv = {v: x / np.linalg.norm(x) for v, x in vecs.items()
          if np.linalg.norm(x) > 0}
    overlaps = []
    for q in range(10):
        sims = sorted(
            ((float(np.dot(nv[q], nv[v])), v) for v in nv if v != q),
            reverse=True,
        )[:5]
        exact = {v for _, v in sims}
        overlaps.append(len(exact & adc.get(q, set())))
    mean = sum(overlaps) / len(overlaps)
    assert mean >= 0.5, f"ADC recall@5 degenerated: {overlaps}"


def test_pq_search_distributed_luts_equal_inline(spark):
    """Round-6 ask #5: the default in-engine LUT path (arbitrary-size
    query frames, zero driver collect) returns exactly what the
    round-5 inline-literal path returns."""
    from pqstream_spark.functions.pq import (
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )

    emb = _emb(spark)
    books = train_pq_codebooks(emb)
    codes = pq_encode(emb, books).localCheckpoint(eager=True)
    queries = emb.where("vec_id < 25").selectExpr(
        "vec_id AS q_id", "embedding")
    dist = {(r["q_id"], r["c_id"], r["score"], r["rn"])
            for r in pq_search(codes, queries, books, k=5).collect()}
    inline = {(r["q_id"], r["c_id"], r["score"], r["rn"])
              for r in pq_search(codes, queries, books, k=5,
                                 inline_luts=True).collect()}
    assert dist == inline and len(dist) == 125

    # the distributed path must not collect the query frame: its plan
    # has no driver-side literal LUTs, just the join
    df = pq_search(codes, queries, books, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_ivfpq_composition(spark):
    """IVF-PQ: ADC scoring restricted to the probed cells. Probing ALL
    cells reproduces plain PQ search exactly; probing one cell returns
    a subset of candidates per query; a near-copy still retrieves its
    original (same-cell by cosine invariance + ADC)."""
    from pqstream_spark.functions.pq import (
        ivfpq_search,
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )
    from pqstream_spark.queries.llm import ivf_cell_expr, train_ivf_codebook

    emb = _emb(spark)
    cb = train_ivf_codebook(spark, SF_SMOKE)
    books = train_pq_codebooks(emb)
    codes = pq_encode(emb, books).join(
        emb.selectExpr("vec_id", f"{ivf_cell_expr(cb)} AS cell"), "vec_id"
    ).localCheckpoint(eager=True)
    queries = emb.where("vec_id < 5").selectExpr("vec_id AS q_id", "embedding")

    full = {(r["q_id"], r["c_id"], r["rn"])
            for r in ivfpq_search(codes, queries, cb, books,
                                  k=5, nprobe=len(cb)).collect()}
    plain = {(r["q_id"], r["c_id"], r["rn"])
             for r in pq_search(codes.select("vec_id", "code"),
                                queries, books, k=5).collect()}
    assert full == plain, "all-cells IVF-PQ must equal the plain ADC scan"

    one = ivfpq_search(codes, queries, cb, books, k=5, nprobe=1).collect()
    assert one and all(r["rn"] <= 5 for r in one)

    probe = emb.where("vec_id = 23").selectExpr(
        "900023 AS q_id",
        "transform(embedding, x -> x * CAST(1.001 AS DOUBLE)) AS embedding",
    )
    hits = ivfpq_search(codes, probe, cb, books, k=3, nprobe=1).collect()
    assert hits and min(hits, key=lambda r: r["rn"])["c_id"] == 23, hits


def test_pq_encode_arrow_equals_static(spark):
    """The Arrow/numpy encode kernel (index-build path) packs
    bit-identical codes to the static SQL form — same integer
    quantization, same first-min tie-break per subspace."""
    from pqstream_spark.functions.pq import pq_encode, train_pq_codebooks

    emb = _emb(spark)
    books = train_pq_codebooks(emb)
    sql_codes = {r["vec_id"]: r["code"]
                 for r in pq_encode(emb, books).collect()}
    np_codes = {r["vec_id"]: r["code"]
                for r in pq_encode(emb, books, arrow=True).collect()}
    assert sql_codes == np_codes and len(np_codes) == 500

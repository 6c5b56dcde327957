"""Deterministic document embeddings via signed feature hashing
(the "hashing trick", Weinberger et al. 2009, ICML — public method):
bag-of-tokens term frequencies hashed into a fixed-dim dense vector
with a ±1 sign hash. A REAL classical embedding — cosine similarity
over it is token-overlap similarity — not a fake: model-based
embeddings (sentence transformers etc., no such library in this
container) swap in by replacing this ONE function; everything
downstream (IVF training, cell assignment, index layout, search)
consumes the same (vec_id, embedding) shape.

Scale shape: explode tokens → one shuffle on (doc_id) for the
map-side-combined bucket counts → array assembly from a
map_from_entries fold. No Python, no UDFs — whole chain is JVM
built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def embed_documents(docs: DataFrame, dim: int = 64) -> DataFrame:
    """(doc_id, text) → (vec_id, embedding: array<double>) with
    signed-feature-hashed token counts. Deterministic (xxhash64 both
    for bucket and sign), empty/whitespace docs embed to the zero
    vector (which every similarity path already guards as
    unsearchable)."""
    from ..queries.llm import TOK_SPARK

    from pyspark.sql import functions as F

    toks = docs.selectExpr("doc_id", f"{TOK_SPARK} AS tok")
    exploded = toks.selectExpr("doc_id", "explode(tok) AS t")
    buckets = (
        exploded.selectExpr(
            "doc_id",
            f"pmod(xxhash64(t), {dim}) AS bucket",
            "CASE WHEN pmod(xxhash64(concat('s', t)), 2) = 0 "
            "THEN 1 ELSE -1 END AS sgn",
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    assembled = (
        buckets.selectExpr("doc_id", "named_struct('bucket', bucket, 'v', v) AS e")
        .groupBy("doc_id")
        .agg(F.collect_list("e").alias("es"))
        .selectExpr(
            "doc_id AS vec_id",
            f"transform(sequence(0, {dim - 1}), i -> CAST(coalesce("
            "element_at(map_from_entries(es), CAST(i AS BIGINT)), 0) "
            "AS DOUBLE)) AS embedding",
        )
    )
    # docs with zero tokens never reach `buckets`; re-attach them with
    # the zero vector so every input doc has an embedding row
    zero = docs.join(assembled, docs.doc_id == assembled.vec_id, "left_anti") \
        .selectExpr(
            "doc_id AS vec_id",
            f"transform(sequence(0, {dim - 1}), i -> CAST(0 AS DOUBLE)) "
            "AS embedding",
        )
    return assembled.unionAll(zero)

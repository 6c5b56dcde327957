"""Deterministic document embeddings via signed feature hashing
(the "hashing trick", Weinberger et al. 2009, ICML — public method):
bag-of-tokens term frequencies hashed into a fixed-dim dense vector
with a ±1 sign hash. A REAL classical embedding — cosine similarity
over it is token-overlap similarity — not a fake: model-based
embeddings (sentence transformers etc., no such library in this
container) swap in by replacing this ONE function; everything
downstream (IVF training, cell assignment, index layout, search)
consumes the same (vec_id, embedding) shape.

Hash choice: bucket and sign come from md5 hex nibbles, NOT xxhash64 —
md5 is the one hash both Spark and DuckDB expose with identical
output, so the `embed_hash` branch of the sim_ann_lsh_quantized
catalog entry can run THE SAME math in the oracle and certify this
module's embeddings value-exactly (the round-5 xxhash64 variant was
pytest-only for exactly this reason). The nibble arithmetic is shared
via md5_bucket_sql/md5_sign_sql so library and certified SQL cannot
drift.

Scale shape: explode tokens → one shuffle on (doc_id) for the
map-side-combined bucket counts → array assembly from a
map_from_entries fold. No Python, no UDFs — whole chain is JVM
built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EMBED_DIM = 64

# Identity of this embedder, recorded in index artifacts
# (index.py build) so a text search (`index search --documents`) can
# refuse to run against an index whose vectors came from a DIFFERENT
# embedding source — cosine between unrelated embedding spaces is
# silently meaningless. Bump when the hashing scheme changes shape.
EMBEDDER_ID = "md5-hash-v1"


def md5_nib_sql(h: str, k: int, spark: bool = True) -> str:
    """Value of hex nibble `k` (1-based) of an md5 hex column — the
    portable instr/strpos formulation both engines evaluate
    identically (the same idiom as queries/llm._simhash_expr)."""
    fn = "instr" if spark else "strpos"
    return f"({fn}('0123456789abcdef', substring({h}, {k}, 1)) - 1)"


def md5_bucket_sql(h: str, dim: int = EMBED_DIM, spark: bool = True) -> str:
    """Feature bucket in [0, dim) from the first FOUR md5 nibbles
    (0..65535): two nibbles would silently zero every bucket >= 256
    for larger dims and modulo-bias any dim not dividing 256; 16 bits
    keeps power-of-two dims up to 65536 exactly unbiased."""
    if not 1 <= dim <= 65536:
        raise ValueError(f"md5_bucket_sql: dim {dim} outside [1, 65536]")
    v = " + ".join(
        f"{md5_nib_sql(h, k + 1, spark)} * {16 ** (3 - k)}" for k in range(4)
    )
    # operand is non-negative, so plain % == pmod; spelled pmod on
    # Spark anyway for uniformity with the sampling idiom
    return f"pmod({v}, {dim})" if spark else f"(({v}) % {dim})"


def md5_sign_sql(h: str, spark: bool = True) -> str:
    """±1 sign from the FIFTH md5 nibble's parity (independent of the
    four bucket nibbles)."""
    return f"CASE WHEN {md5_nib_sql(h, 5, spark)} % 2 = 0 THEN 1 ELSE -1 END"


def embed_documents(docs: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """(doc_id, text) → (vec_id, embedding: array<double>) with
    signed-feature-hashed token counts. Deterministic (md5 nibbles for
    bucket and sign — reproducible in the DuckDB oracle, see module
    docstring), empty/whitespace docs embed to the zero vector (which
    every similarity path already guards as unsearchable)."""
    from pyspark.sql import functions as F

    from ..queries.llm import TOK_SPARK

    toks = docs.selectExpr("doc_id", f"{TOK_SPARK} AS tok")
    exploded = toks.selectExpr("doc_id", "explode(tok) AS t")
    buckets = (
        exploded.selectExpr("doc_id", "md5(t) AS h")
        .selectExpr(
            "doc_id",
            f"{md5_bucket_sql('h', dim)} AS bucket",
            f"{md5_sign_sql('h')} AS sgn",
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    assembled = (
        buckets.selectExpr("doc_id", "named_struct('bucket', CAST(bucket AS BIGINT), 'v', v) AS e")
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

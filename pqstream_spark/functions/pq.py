"""Product quantization (PQ) for embeddings — Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011
(public method): split each vector into M subvectors, learn a small
per-subspace codebook, store each vector as M 4-bit codes packed into
ONE BIGINT — a 64× compression of a 64-dim float64 vector — and score
candidates with asymmetric distance computation (ADC): per query,
precompute M×16 partial dot products once, then each candidate costs M
table lookups, no float vector math.

Engine discipline (same as the IVF path in queries/llm.py): everything
integer. Vectors are L2-normalized then quantized to round(nv*127)
BIGINTs; sub-codebooks come from deterministic farthest-point seeding
plus two Lloyd steps over a hash-predicate sample, computed in exact integer/rational
arithmetic on the driver (the sample is bounded by construction — the
same "train on a sample, apply distributed" shape faiss uses); encode
is argmin integer L2 with a smaller-code tie-break, expanded into
static whole-stage-codegen SQL against a materialized qv column.

At 100 TB: codes are 8 bytes/vector, so a billion-vector index is
~8 GB — memory-resident per executor where the raw vectors are not;
the ADC scan is one narrow pass over the code column. Compose with
IVF cells (queries/llm.ivf_cell_expr) for IVF-PQ: prune to cells,
ADC-score inside them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .sampling import capped_sample_df, sample_pred, sort_and_cap

# deterministic hash sample shared with the IVF/BPE trainers — ONE
# definition (functions/sampling.py), overflow- and sign-safe
SAMPLE_PRED = sample_pred("vec_id")
SAMPLE_CAP = 8192  # enforced IN-ENGINE (capped_sample_df) before collect


def train_pq_codebooks(
    df: DataFrame, m: int = 8, ksub: int = 16
) -> list[list[list[int]]]:
    """(vec_id, embedding) → M sub-codebooks of ksub integer centroids
    each (m × ksub × (dim/m)). Deterministic: hash-predicate sample,
    multiplicative-hash sample order, farthest-point (maxmin) seeding,
    two Lloyd steps in integer space (argmin exact-integer L2,
    round-of-mean update, empty clusters keep their centroid)."""
    from ..queries.llm import _norm2_expr, _norm_vec_expr

    n2 = _norm2_expr(True)
    nv = _norm_vec_expr(True)
    assert 2 <= ksub <= 16, (
        f"ksub={ksub}: codes are packed as 4-bit nibbles (≤16 per "
        "subspace); widen the packing before raising ksub"
    )
    assert m * 4 <= 63, f"m={m}: packed code must fit one BIGINT"
    # cap enforced IN-ENGINE: the hash predicate admits ~25% of rows,
    # which at 100 TB is a driver OOM if collected raw. A bare
    # .limit() would let partition arrival order decide who trains the
    # codebooks, but the SORTED limit (capped_sample_df: ORDER BY
    # sample hash, id LIMIT cap) is a deterministic distributed
    # TakeOrderedAndProject selecting exactly the rows sort_and_cap
    # picks — the driver never sees more than SAMPLE_CAP rows.
    rows = capped_sample_df(
        df.where(f"{n2} > 0")
        .where(SAMPLE_PRED)
        .selectExpr(
            "vec_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        ),
        "vec_id", SAMPLE_CAP,
    ).collect()
    if not rows:
        raise ValueError(
            "train_pq_codebooks: empty training sample (no non-zero "
            "vectors passed the hash predicate) — an empty codebook "
            "would generate invalid encode SQL; widen the corpus or "
            "loosen functions/sampling.DEFAULT_THRESHOLD"
        )
    # driver-side re-sort is a no-op cross-check of the engine's order
    rows = sort_and_cap(rows, "vec_id", SAMPLE_CAP)
    return _lloyd_subspace_books([list(r["qv"]) for r in rows], m, ksub)


def _lloyd_subspace_books(
    qvs: list[list[int]], m: int, ksub: int
) -> list[list[list[int]]]:
    """Deterministic per-subspace k-means over integer vectors — the
    shared training tail of the raw and residual PQ trainers:
    farthest-point seeding, two Lloyd steps, exact integer/rational
    arithmetic, empty clusters keep their centroid."""
    dim = len(qvs[0])
    sub = dim // m
    assert sub * m == dim, f"dim {dim} not divisible by m={m}"
    books: list[list[list[int]]] = []
    for mi in range(m):
        vecs = [v[mi * sub:(mi + 1) * sub] for v in qvs]
        # deterministic farthest-point (maxmin) seeding: start from the
        # hash-first vector, repeatedly add the point farthest from its
        # nearest chosen seed (ties → earlier point). Far better spread
        # than first-K, still RNG-free.
        seeds = [vecs[0]]
        dmin = [None] * len(vecs)
        while len(seeds) < min(ksub, len(vecs)):
            last = seeds[-1]
            far_i, far_d = 0, -1
            for i, v in enumerate(vecs):
                d = sum((a - b) * (a - b) for a, b in zip(v, last))
                if dmin[i] is None or d < dmin[i]:
                    dmin[i] = d
                if dmin[i] > far_d:
                    far_d, far_i = dmin[i], i
            seeds.append(vecs[far_i])
        if len(seeds) < ksub:
            seeds = seeds + [seeds[-1]] * (ksub - len(seeds))
        # two Lloyd steps, exact integer arithmetic
        book = seeds
        for _ in range(2):
            assign: list[list[list[int]]] = [[] for _ in range(ksub)]
            for v in vecs:
                best, bc = None, 0
                for ci, c in enumerate(book):
                    cost = sum((a - b) * (a - b) for a, b in zip(v, c))
                    if best is None or cost < best:
                        best, bc = cost, ci
                assign[bc].append(v)
            nxt = []
            for ci in range(ksub):
                if assign[ci]:
                    n = len(assign[ci])
                    nxt.append([
                        int(round(sum(v[j] for v in assign[ci]) / n))
                        for j in range(sub)
                    ])
                else:
                    nxt.append(list(book[ci]))
            book = nxt
        books.append(book)
    return books


def demo_books(m: int = 8, ksub: int = 16, sub: int = 8) -> list[list[list[int]]]:
    """Formula-derived deterministic sub-codebooks — the certification
    twin of `train_pq_codebooks`: identical shapes and value range
    (m × ksub × sub integers in [-63, 63]), but a pure function of the
    indices so BOTH engines (Spark and the DuckDB oracle) can inline
    the same literals with no data dependence. The encode/ADC
    machinery exercised through these is byte-for-byte the machinery
    trained books flow through; only the constants differ."""
    return [
        [[((mi * 131 + ci * 29 + j * 17) % 127) - 63 for j in range(sub)]
         for ci in range(ksub)]
        for mi in range(m)
    ]


def demo_coarse_codebook(k: int = 8, dim: int = 64) -> list[list[int]]:
    """Formula-derived coarse (IVF) codebook — the certification twin
    of `train_ivf_codebook_from` for the residual-ADC oracle branch:
    K × dim integers in [-63, 63], a pure function of the indices so
    both engines inline identical literals. Trained codebooks flow
    through the same cell-assign / residual / offset expressions."""
    return [
        [((ci * 37 + j * 11 + (ci * j) % 13) % 127) - 63 for j in range(dim)]
        for ci in range(k)
    ]


def pq_encode_expr(books: list[list[list[int]]], spark: bool = True) -> str:
    """Static SQL (both dialects): a `qv` array/list<bigint> column →
    ONE packed BIGINT of M 4-bit codes. Per subspace, argmin over ksub
    of the integer L2 cost ||c||² − 2·x_m·c (the ||x_m||² term is
    constant across candidates), tie → smaller code via
    array_position/list_position's first-match. Apply against a
    MATERIALIZED qv column on Spark (the CollapseProject trap recorded
    in queries/llm.q_sim_topk). DuckDB lists are 1-based; Spark array
    [] indexing is 0-based — the dialect handles it."""
    if not books:
        raise ValueError(
            "pq_encode_expr: empty codebook (would generate invalid "
            "SQL) — train_pq_codebooks raises before producing one"
        )
    terms = []
    for mi, book in enumerate(books):
        sub = len(book[0])
        costs = []
        for c in book:
            cnorm = sum(x * x for x in c)
            off = 0 if spark else 1
            prods = [f"qv[{mi * sub + j + off}] * {int(-2 * c[j])}"
                     for j in range(sub) if c[j] != 0]
            costs.append(f"({cnorm}" + ("" if not prods else
                                        " + " + " + ".join(prods)) + ")")
        if spark:
            arr = "array(" + ", ".join(costs) + ")"
            code = f"(array_position({arr}, array_min({arr})) - 1)"
            terms.append(f"shiftleft({code}, {4 * mi})")
        else:
            arr = "list_value(" + ", ".join(costs) + ")"
            # CAST before the shift: DuckDB's << on INTEGER overflows
            # at nibble 7 (11 << 28); Spark's shiftleft is 64-bit
            code = f"CAST(list_position({arr}, list_min({arr})) - 1 AS BIGINT)"
            terms.append(f"({code} << {4 * mi})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _books_lit(books: list[list[list[int]]], spark: bool = True) -> str:
    """The full m×ksub×sub codebook as ONE literal nested array."""
    arr = "array" if spark else "list_value"
    return f"{arr}(" + ", ".join(
        _book_lit(book, spark) for book in books
    ) + ")"


def _book_lit(book: list[list[int]], spark: bool = True) -> str:
    """ONE subspace's ksub×sub centroids as a literal array. The HOF
    expression builders splice per-subspace literals instead of
    indexing one full-codebook literal per reference: the full literal
    would be COPIED at every reference (2 refs/subspace in encode,
    1 in the LUT → 24 copies of m×ksub×sub text, ~160 KB of generated
    SQL whose parse+analyze dominated the catalog entry at 3-4 s per
    call), while the per-subspace form keeps the text O(values)."""
    arr = "array" if spark else "list_value"
    suf = "L" if spark else ""
    return f"{arr}(" + ", ".join(
        f"{arr}(" + ", ".join(f"{int(v)}{suf}" for v in cv) + ")"
        for cv in book
    ) + ")"


def pq_encode_hof_expr(books: list[list[list[int]]],
                       spark: bool = True) -> str:
    """COMPACT encode (both dialects): per subspace, argmin of the
    direct integer L2 distance to each centroid of the literal
    codebook, folded with higher-order functions. Identical codes to
    `pq_encode_expr` (same argmin, same first-match tie-break — the
    ||x||² term the static form drops is constant per subspace), but
    the generated code is O(m) instead of O(m·ksub·sub): the static
    form's ~1k-term projections made janino compilation, not data,
    the cost at catalog scale (measured 2.9 s → 1.2 s at sf0.1).
    Production linear scans over millions of rows still want the
    static whole-stage-codegen form; this is the certification/
    small-batch variant, pinned equal by test."""
    if not books:
        raise ValueError("pq_encode_hof_expr: empty codebook")
    m = len(books)
    sub = len(books[0][0])
    terms = []
    for mi in range(m):
        bl_m = _book_lit(books[mi], spark)
        if spark:
            costs = (
                f"transform({bl_m}, cv -> "
                f"aggregate(zip_with(slice(qv, {mi * sub + 1}, {sub}), cv, "
                f"(x, c) -> (x - c) * (x - c)), CAST(0 AS BIGINT), "
                f"(a, e) -> a + e))"
            )
            code = (f"CAST(array_position({costs}, array_min({costs})) - 1 "
                    f"AS BIGINT)")
            terms.append(f"shiftleft({code}, {4 * mi})")
        else:
            costs = (
                f"list_transform({bl_m}, cv -> "
                f"list_sum(list_transform(range(1, {sub + 1}), j -> "
                f"(qv[{mi * sub} + j] - cv[j]) * (qv[{mi * sub} + j] - cv[j]))))"
            )
            code = (f"CAST(list_position({costs}, list_min({costs})) - 1 "
                    f"AS BIGINT)")
            terms.append(f"({code} << {4 * mi})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def pq_lut_hof_expr(books: list[list[list[int]]],
                    spark: bool = True) -> str:
    """COMPACT per-query LUT (both dialects): LUT[m][c] = q_m ·
    centroid_c via HOF folds over the literal codebook — same values
    as `pq_lut_expr`, O(m)-sized generated code."""
    m = len(books)
    sub = len(books[0][0])
    outer = []
    for mi in range(m):
        bl_m = _book_lit(books[mi], spark)
        if spark:
            outer.append(
                f"transform({bl_m}, cv -> "
                f"aggregate(zip_with(slice(qv, {mi * sub + 1}, {sub}), cv, "
                f"(x, c) -> x * c), CAST(0 AS BIGINT), (a, e) -> a + e))"
            )
        else:
            outer.append(
                f"list_transform({bl_m}, cv -> "
                f"list_sum(list_transform(range(1, {sub + 1}), j -> "
                f"qv[{mi * sub} + j] * cv[j])))"
            )
    return ("array(" if spark else "list_value(") + ", ".join(outer) + ")"


def pq_lut_expr(books: list[list[list[int]]], spark: bool = True) -> str:
    """Static SQL: a query row's `qv` column → the M×ksub ADC lookup
    table (array<array<bigint>>), LUT[m][c] = q_m · centroid_c — each
    entry a static integer sum over literal centroid coordinates.
    Computed ONCE per query row; every candidate then costs M shifts +
    M lookups (`pq_adc_score_expr`)."""
    outer = []
    for mi, book in enumerate(books):
        sub = len(book[0])
        off = 0 if spark else 1
        sums = []
        for c in book:
            prods = [f"qv[{mi * sub + j + off}] * {int(c[j])}"
                     for j in range(sub) if c[j] != 0]
            sums.append("(" + " + ".join(prods) + ")" if prods
                        else "CAST(0 AS BIGINT)")
        outer.append(("array(" if spark else "list_value(")
                     + ", ".join(sums) + ")")
    return ("array(" if spark else "list_value(") + ", ".join(outer) + ")"


def pq_adc_score_expr(m: int, luts_col: str, code_col: str,
                      spark: bool = True) -> str:
    """Static SQL: ADC score = Σ_m LUT[m][code_m] — M nibble shifts +
    M table lookups per candidate, integer-exact in both engines.
    `% 16` is the nibble mask (shiftright keeps higher nibbles)."""
    parts = []
    for mi in range(m):
        if spark:
            parts.append(
                f"element_at(element_at({luts_col}, {mi + 1}), "
                f"CAST(shiftright({code_col}, {4 * mi}) % 16 AS INT) + 1)"
            )
        else:
            parts.append(
                f"{luts_col}[{mi + 1}]"
                f"[CAST(({code_col} >> {4 * mi}) % 16 AS INTEGER) + 1]"
            )
    return "(" + " + ".join(parts) + ")"


def pq_encode(df: DataFrame, books: list[list[list[int]]],
              arrow: bool = False) -> DataFrame:
    """(vec_id, embedding) → (vec_id, code BIGINT). Zero-norm vectors
    drop (unsearchable by cosine, same contract as the IVF paths).

    `arrow=True` routes the argmin through an Arrow-batched numpy
    kernel instead of the static-sum SQL expression — the same
    strategy split as `assign_ivf_cells`: the SQL form is
    oracle-aligned and free at catalog scale, the numpy form wins on
    big build batches (one (n×sub)·(sub×ksub) int64 matmul per
    subspace per batch, first-min tie-break identical to
    array_position — pinned equal by test). The index CLI uses it for
    builds."""
    from ..queries.llm import _norm2_expr, _norm_vec_expr

    n2 = _norm2_expr(True)
    nv = _norm_vec_expr(True)
    base = (
        df.where(f"{n2} > 0")
        .selectExpr(
            "vec_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        )
        .localCheckpoint(eager=True)  # materialize before the static sums
    )
    if not arrow:
        return base.selectExpr("vec_id", f"{pq_encode_expr(books)} AS code")

    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    if not books:
        raise ValueError("pq_encode: empty codebook")
    m = len(books)
    sub = len(books[0][0])
    bks = [_np.array(bk, dtype=_np.int64) for bk in books]  # ksub × sub

    def enc(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv = _np.stack(
                [_np.asarray(v, dtype=_np.int64) for v in pdf["qv"]]
            )
            code = _np.zeros(len(pdf), dtype=_np.int64)
            for mi in range(m):
                x = qv[:, mi * sub:(mi + 1) * sub]          # n × sub
                bk = bks[mi]                                 # ksub × sub
                # argmin over ||x-c||²; the x² term is constant per row
                costs = (bk * bk).sum(axis=1)[None, :] - 2 * (x @ bk.T)
                code |= costs.argmin(axis=1).astype(_np.int64) << (4 * mi)
            yield _pd.DataFrame({"vec_id": pdf["vec_id"], "code": code})

    return base.mapInPandas(enc, "vec_id long, code long")


def _query_luts_frame(
    queries: DataFrame, books: list[list[list[int]]],
    keep_qv: bool = False,
) -> DataFrame:
    """(q_id, embedding) → (q_id, luts) with the M×ksub ADC lookup
    table computed IN-ENGINE: quantize qv once (localCheckpoint — the
    CollapseProject barrier), then the static `pq_lut_expr` sums over
    literal centroid coordinates. No driver COLLECT: the round-5
    inline-literal path serialized an O(|Q|·M·ksub) plan through the
    driver as SQL text (kept under inline_luts=True for parity
    tests); the LUT frame here still BROADCASTS for the scan join —
    ~(M·ksub·8+16) bytes/query ≈ 1 KB, so Spark's 8 GB broadcast cap
    is reached around ~10⁶–10⁷ queries; beyond that, swap the
    broadcast hint for a shuffle join on the caller side."""
    from ..queries.llm import _norm2_expr, _norm_vec_expr

    n2 = _norm2_expr(True)
    nv = _norm_vec_expr(True)
    base = (
        queries.where(f"{n2} > 0")
        .selectExpr(
            "q_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        )
        .localCheckpoint(eager=True)
    )
    cols = ["q_id", f"{pq_lut_expr(books, True)} AS luts"]
    if keep_qv:
        # residual IVF-PQ needs the raw quantized query again for the
        # per-cell coarse offset dot(q, centroid(cell))
        cols.append("qv")
    return base.selectExpr(*cols)


def _adc_topk(codes: DataFrame, luts_df: DataFrame, m: int, k: int,
              exclude_self: bool, on_cell: bool,
              with_offset: bool = False) -> DataFrame:
    """Shared ADC scoring tail: broadcast the LUT side, join (on cell
    for IVF-PQ, nested-loop for the full linear scan), score each
    candidate with M shifts + M lookups, window top-k. When the LUT
    frame carries a per-(query, cell) `cell_offset` (residual IVF-PQ's
    coarse term dot(q, centroid(cell))), it is added to the ADC sum —
    that makes scores comparable ACROSS probed cells, which the
    residual decomposition requires for nprobe > 1."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    score = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, mi) -> "
        f"acc + element_at(element_at(luts, mi + 1), "
        # % 16 is the NIBBLE mask (shiftright keeps higher nibbles),
        # independent of ksub
        f"CAST(shiftright(code, mi * 4) % 16 AS INT) + 1))"
    )
    if with_offset:
        score = f"(cell_offset + {score})"
    if on_cell:
        joined = F.broadcast(luts_df).join(codes, "cell")
    else:
        # Q queries x full code scan IS the ADC linear scan by
        # definition; the broadcast nested loop ships the LUT side
        joined = F.broadcast(luts_df).join(codes, F.lit(True))
    if exclude_self:
        joined = joined.where("q_id <> vec_id")
    scored = joined.selectExpr("q_id", "vec_id AS c_id", f"{score} AS score")
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def pq_search(
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[list[int]]],
    k: int = 5,
    exclude_self: bool = True,
    inline_luts: bool = False,
) -> DataFrame:
    """ADC top-k: for each (q_id, embedding) query, score every code
    as Σ_m LUT[m][code_m] where LUT[m][c] = q_m · centroid. The LUTs
    are computed IN-ENGINE (static sums over literal centroids — see
    `_query_luts_frame`, including the honest broadcast bound), so
    `queries` is a frame, not a driver-collected batch; each
    candidate then costs M shifts + M lookups inside codegen.
    `inline_luts=True` keeps the round-5 driver-side literal path
    (exact integers either way; pinned equal by test). Returns
    (q_id, c_id, score, rn); score is the integer ADC dot — a RANKING
    surrogate for cosine, not its value."""
    m = len(books)
    if not inline_luts:
        luts_df = _query_luts_frame(queries, books)
        return _adc_topk(codes, luts_df, m, k, exclude_self, on_cell=False)

    from ..queries.llm import _norm2_expr, _norm_vec_expr

    n2 = _norm2_expr(True)
    nv = _norm_vec_expr(True)
    qrows = (
        queries.where(f"{n2} > 0")
        .selectExpr(
            "q_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        )
        .collect()
    )
    if not qrows:
        return codes.sparkSession.createDataFrame(
            [], "q_id long, c_id long, score long, rn int"
        )
    spark = codes.sparkSession
    sub = len(books[0][0])
    luts = []
    for r in qrows:
        qlut = [
            [sum(int(r["qv"][mi * sub + j]) * c[j] for j in range(sub))
             for c in books[mi]]
            for mi in range(m)
        ]
        luts.append((r["q_id"], qlut))
    luts_df = spark.createDataFrame(
        luts, "q_id long, luts array<array<bigint>>"
    )
    return _adc_topk(codes, luts_df, m, k, exclude_self, on_cell=False)


def _cb_lit(codebook: list[list[int]]) -> str:
    """The IVF coarse codebook as one literal array<array<bigint>> —
    centroid lookup by 1-based cell id via element_at."""
    return "array(" + ", ".join(
        "array(" + ", ".join(f"{int(v)}L" for v in cv) + ")"
        for cv in codebook
    ) + ")"


def ivfpq_search(
    codes: DataFrame,
    queries: DataFrame,
    codebook: list[list[int]],
    books: list[list[list[int]]],
    k: int = 5,
    nprobe: int = 1,
    exclude_self: bool = True,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ — the composition both halves were built for: `codes` is
    (vec_id, code, cell) (pq_encode joined with the IVF cell
    assignment), each query probes its `nprobe` best cells
    (queries/llm.ivf_probe_cells_expr) and ADC-scores ONLY the codes in
    those cells. The join is an equi-join on `cell` (broadcast query
    side), so candidate generation never leaves the probed cells —
    with the codes table partitioned by cell this is the classic
    memory-resident IVF-PQ scan: 8 bytes per candidate, M lookups per
    score, file pruning per probe."""
    from ..queries.llm import ivf_probe_cells_expr

    m = len(books)
    nprobe = max(1, min(int(nprobe), len(codebook)))
    # LUTs compute on the checkpointed quantized base; probe cells as
    # a narrow expression over the RAW frame (`ivf_probe_cells_expr`
    # carries its own quantize chain — one extra normalize per query
    # row, the price of keeping that expression stream-safe). One
    # explode fans each query out to its nprobe cells, and the
    # equi-join on `cell` keeps candidate generation inside the
    # probed cells — with the codes table partitioned by cell this is
    # the memory-resident IVF-PQ scan: 8 bytes per candidate, M
    # lookups per score, file pruning per probe. No driver collect
    # (broadcast bound: see _query_luts_frame).
    luts_df = _query_luts_frame(
        queries.selectExpr("q_id", "embedding"), books, keep_qv=residual,
    )
    cells_df = queries.selectExpr(
        "q_id AS _qc_id",
        f"{ivf_probe_cells_expr(codebook, nprobe)} AS cells",
    ).where("cells IS NOT NULL").selectExpr(
        "_qc_id", "explode(cells) AS cell"
    )
    joined = luts_df.join(cells_df, luts_df.q_id == cells_df._qc_id)
    if not residual:
        luts_cells = joined.select("q_id", "cell", "luts")
        return _adc_topk(codes, luts_cells, m, k, exclude_self,
                         on_cell=True)
    # True IVFADC (Jégou et al. 2011 §III, inner-product/integer
    # adaptation): `codes` carries PQ codes of the RESIDUAL
    # x − centroid(cell) (pq_encode_ivf), so scoring decomposes
    # exactly as dot(q, x̂) = dot(q, centroid(cell)) + Σ_m q_m ·
    # book_m[code_m]. The coarse term is a per-(query, probed-cell)
    # integer fold over the literal codebook — `cell_offset` — added
    # to the ADC sum so scores stay comparable ACROSS probed cells.
    # LUTs use the RAW quantized query against the residual books
    # (inner-product ADC needs no query residual). The centroid is
    # sliced to size(qv) and zero-coalesced (ADVICE r7): zip_with
    # null-pads on length mismatch, which would silently rank every
    # row of a short/long query with a NULL score — the slice mirrors
    # _residual_rel_sql's short-vector semantics, the coalesce gives
    # extra query dims a 0 contribution (the same out-of-bounds→0
    # discipline as the demo-codebook get() sums).
    offset = (
        f"aggregate(zip_with(qv, slice(element_at({_cb_lit(codebook)}, "
        f"CAST(cell AS INT)), 1, size(qv)), "
        f"(x, c) -> x * coalesce(c, CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (a, e) -> a + e)"
    )
    luts_cells = joined.selectExpr(
        "q_id", "cell", "luts", f"{offset} AS cell_offset"
    )
    return _adc_topk(codes, luts_cells, m, k, exclude_self,
                     on_cell=True, with_offset=True)


def train_pq_codebooks_residual(
    df: DataFrame, codebook: list[list[int]], m: int = 8, ksub: int = 16
) -> list[list[list[int]]]:
    """Residual PQ training — the IVFADC half of Jégou et al. 2011
    §III: sub-codebooks are learned over x − centroid(cell(x)), not x.
    Residuals of a clustered corpus have much smaller magnitude than
    the vectors, so ksub centroids per subspace describe the
    WITHIN-cell structure instead of re-describing cell identity —
    the known fix for the raw-code recall floor on clustered data.

    Same discipline as `train_pq_codebooks`: deterministic
    hash-predicate sample capped IN-ENGINE (sorted LIMIT — no
    unbounded driver collect) BEFORE any per-row assignment work;
    cells + residuals for the ≤SAMPLE_CAP collected rows are then one
    exact-integer numpy matmul + argmax on the driver (the same
    integer dot / FIRST-max / 1-based contract as assign_ivf_cells —
    running the HOF `ivf_cell_expr` pre-cap instead measured 50 s of
    interpreted lambda evals over the 25% hash sample at K=64/100k),
    then the shared integer Lloyd trainer."""
    import numpy as _np

    from ..queries.llm import _norm2_expr, _norm_vec_expr

    assert 2 <= ksub <= 16 and m * 4 <= 63
    n2 = _norm2_expr(True)
    nv = _norm_vec_expr(True)
    rows = capped_sample_df(
        df.where(f"{n2} > 0")
        .where(SAMPLE_PRED)
        .selectExpr(
            "vec_id",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        ),
        "vec_id", SAMPLE_CAP,
    ).collect()
    if not rows:
        raise ValueError(
            "train_pq_codebooks_residual: empty training sample — "
            "see train_pq_codebooks for the remedy"
        )
    rows = sort_and_cap(rows, "vec_id", SAMPLE_CAP)
    qv = _np.array([list(r["qv"]) for r in rows], dtype=_np.int64)
    cbm = _np.array(codebook, dtype=_np.int64)          # K × dim
    cells = (qv @ cbm.T).argmax(axis=1)                 # first-max
    residuals = qv - cbm[cells]
    return _lloyd_subspace_books(
        [[int(x) for x in v] for v in residuals], m, ksub)


def pq_encode_ivf(
    df: DataFrame,
    codebook: list[list[int]],
    books: list[list[list[int]]],
    arrow: bool = False,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, embedding) → (vec_id, cell, code): the IVFADC index
    build — assign each vector to its coarse cell (assign_ivf_cells:
    static-sum codegen at small K, Arrow matmul above
    ASSIGN_STATIC_MAX_K), PQ-encode the RESIDUAL x − centroid(cell)
    with residual-trained `books` (train_pq_codebooks_residual).
    Search side: `ivfpq_search(..., residual=True)`. Zero-norm
    vectors drop (cell is NULL), same contract as the IVF paths.

    `arrow=True` routes the residual argmin through the same
    numpy-matmul kernel shape as `pq_encode(arrow=True)` — subtract
    the cell centroid per batch, then per-subspace cost matmuls;
    first-min tie-break identical to array_position (pinned equal by
    test).

    `assigned` short-circuits the coarse assignment with a caller-
    provided (vec_id, embedding, cell) frame (assign_ivf_cells output)
    — the index CLI computes the assignment once for the partitioned
    layout and must not pay the per-row argmax a second time here."""
    from ..queries.llm import _norm_vec_expr, assign_ivf_cells

    nv = _norm_vec_expr(True)
    if assigned is None:
        assigned = assign_ivf_cells(df, codebook)  # drops zero-norm rows
    base = (
        assigned.selectExpr(
            "vec_id", "cell",
            f"transform({nv}, x -> CAST(round(x * 127, 0) AS BIGINT)) AS qv",
        )
        .selectExpr(
            "vec_id", "cell",
            f"zip_with(qv, element_at({_cb_lit(codebook)}, "
            f"CAST(cell AS INT)), (x, c) -> x - c) AS qv",
        )
        .localCheckpoint(eager=True)  # materialize before the static sums
    )
    if not arrow:
        return base.selectExpr(
            "vec_id", "cell", f"{pq_encode_expr(books)} AS code"
        )

    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    if not books:
        raise ValueError("pq_encode_ivf: empty codebook")
    m = len(books)
    sub = len(books[0][0])
    bks = [_np.array(bk, dtype=_np.int64) for bk in books]

    def enc(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rv = _np.stack(
                [_np.asarray(v, dtype=_np.int64) for v in pdf["qv"]]
            )
            code = _np.zeros(len(pdf), dtype=_np.int64)
            for mi in range(m):
                x = rv[:, mi * sub:(mi + 1) * sub]
                bk = bks[mi]
                costs = (bk * bk).sum(axis=1)[None, :] - 2 * (x @ bk.T)
                code |= costs.argmin(axis=1).astype(_np.int64) << (4 * mi)
            yield _pd.DataFrame({
                "vec_id": pdf["vec_id"], "cell": pdf["cell"], "code": code,
            })

    return base.mapInPandas(enc, "vec_id long, cell long, code long")


def pq_residual_lut_hof_expr(
    books: list[list[list[int]]], coarse: list[list[int]],
    spark: bool = True,
) -> str:
    """Per-query residual-IVFADC lookup table (both dialects):
    T[m][cell][c] = q_m · (centroid(cell)_m + book_m[c]) — the coarse
    term folded INTO the ADC table exactly as Jégou 2011 §III's
    per-cell distance tables, so scoring a pair costs M triple
    lookups with NO per-pair fold and no offset join. Size per query:
    M × K × ksub ints (8·8·16 = 1 KB here)."""
    m = len(books)
    sub = len(books[0][0])
    k = len(coarse)
    outer = []
    for mi in range(m):
        # per-subspace literals (_book_lit rationale): the subspace's
        # centroids, and the coarse codebook PRE-SLICED to this
        # subspace's dims — same integers the runtime slice produced,
        # an order of magnitude less generated text
        bl_m = _book_lit(books[mi], spark)
        arr = "array" if spark else "list_value"
        suf = "L" if spark else ""
        cl_m = f"{arr}(" + ", ".join(
            f"{arr}(" + ", ".join(
                f"{int(v)}{suf}"
                for v in cv[mi * sub:(mi + 1) * sub]
            ) + ")" for cv in coarse
        ) + ")"
        if spark:
            outer.append(
                f"transform(sequence(1, {k}), ci -> "
                f"transform({bl_m}, cv -> "
                f"aggregate(zip_with(slice(qv, {mi * sub + 1}, {sub}), "
                f"zip_with(element_at({cl_m}, ci), "
                f"cv, (a, b) -> a + b), (x, s) -> x * s), "
                f"CAST(0 AS BIGINT), (a, e) -> a + e)))"
            )
        else:
            outer.append(
                f"list_transform(range(1, {k} + 1), ci -> "
                f"list_transform({bl_m}, cv -> "
                f"list_sum(list_transform(range(1, {sub + 1}), j -> "
                f"qv[{mi * sub} + j] * ({cl_m}[ci][j] + cv[j])))))"
            )
    return ("array(" if spark else "list_value(") + ", ".join(outer) + ")"


def pq_adc_residual_score_expr(
    m: int, luts_col: str, cell_col: str, code_col: str,
    spark: bool = True,
) -> str:
    """Score = Σ_m T[m][cell][code_m] over the residual-IVFADC table —
    M nibble shifts + M triple lookups per candidate, integer-exact."""
    parts = []
    for mi in range(m):
        if spark:
            parts.append(
                f"element_at(element_at(element_at({luts_col}, {mi + 1}), "
                f"CAST({cell_col} AS INT)), "
                f"CAST(shiftright({code_col}, {4 * mi}) % 16 AS INT) + 1)"
            )
        else:
            parts.append(
                f"{luts_col}[{mi + 1}][{cell_col}]"
                f"[CAST(({code_col} >> {4 * mi}) % 16 AS INTEGER) + 1]"
            )
    return "(" + " + ".join(parts) + ")"

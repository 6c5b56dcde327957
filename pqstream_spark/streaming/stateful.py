"""Streaming stateful operators: watermarked windows, streaming dedup,
session windows (SURVEY.md §2.2 — absent from the reference, required
of the engine; §7 M5).

All built on Structured Streaming's own state store — no custom state
management. Watermarks bound state size, which is the 100 TB
requirement: an unbounded groupBy on a stream is a memory leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts with late-data handling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def stream_dedup(
    raw: DataFrame,
    keys: tuple[str, ...] = ("seq",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once: drop replayed events by seq.
    dropDuplicatesWithinWatermark keeps state only inside the watermark
    horizon — bounded state at any scale (vs dropDuplicates, which
    accumulates keys forever on a stream)."""
    return raw.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by a time-range condition.

    Both sides are watermarked and the join carries `right_ts ∈
    [left_ts - within, left_ts]` — the range bound plus watermarks is
    what lets Spark EVICT buffered rows, keeping state finite on an
    unbounded stream (an unbounded stream-stream join is a memory leak
    by construction). This is the streaming form of the as-of/range
    join family (operators/asof.py, operators/rangejoin.py)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.expr(f"{left_ts} - INTERVAL {within}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how)


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Streaming sessionization — the built-in session_window operator
    (the batch equivalent is the gaps-and-islands query `sessionize` in
    queries/relational.py)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_against_corpus_stream(
    doc_stream: DataFrame, corpus: DataFrame
) -> DataFrame:
    """Ingest-time near-dup flagging: incoming documents are checked
    against an existing corpus WITHOUT re-running corpus-wide dedup —
    the streaming half of a dedup pipeline (batch LSH curates the
    initial corpus; this guards the door afterwards).

    Mechanics: the corpus' MinHash band index (queries/llm.py
    _minhash_signatures — same signature family, so stream and batch
    agree on what a near-dup is) is a STATIC frame; each micro-batch
    of incoming docs computes its own signatures (narrow, per-doc) and
    equi-joins band keys against the index — a stream-static join,
    which Structured Streaming executes without state: the static side
    is just re-scanned (or broadcast) per micro-batch. At 100 TB the
    static index is bucketed by band key on disk so each micro-batch
    prunes to the buckets its keys touch.

    Returns (doc_id, band_idx, corpus_doc_id) candidate rows — one per
    matching band; downstream either drops duplicates per micro-batch
    (foreachBatch) or verifies with exact Jaccard as the batch
    pipeline does. Emitting candidates rather than a global distinct
    keeps the stream append-only with ZERO streaming state — the
    stream side's signatures use the narrow per-row formulation
    (minhash_bands_narrow) because a per-doc groupBy on a stream
    would be an unbounded stateful aggregation; the static side keeps
    the faster hash-aggregate form (both produce bit-identical keys)."""
    from ..queries.llm import _minhash_signatures, minhash_bands_narrow

    corpus_bands = _band_rows(_minhash_signatures(corpus), "corpus_doc_id")
    stream_bands = _band_rows(minhash_bands_narrow(doc_stream), "doc_id")
    return (
        stream_bands.join(corpus_bands, ["band_idx", "bucket"])
        .where("doc_id <> corpus_doc_id")
        .select("doc_id", "band_idx", "corpus_doc_id")
    )


def _band_rows(sig: DataFrame, id_alias: str) -> DataFrame:
    """(doc_id, b0..b3) signatures → exploded (id, band_idx, bucket)
    rows — THE band-index shape. Single definition so every consumer
    (corpus-wide dedup, ingest dedup, the ingest curation gate) agrees
    on the banding scheme; changing band count/keys here changes all
    of them together."""
    return sig.selectExpr(
        f"doc_id AS {id_alias}",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, bucket)",
    )


def semdedup_quantize(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (vec_id, qv: array<bigint>, n2q: bigint) — the
    SemDeDup quantized embedding (hashing-trick embed, then
    q = round(127·v/‖v‖) per component) over an ARBITRARY frame, the
    DataFrame twin of `_semdedup_sq_sql`'s corpus-CTE form. Zero-norm
    docs are dropped (unsearchable by cosine, excluded by every
    SemDeDup path). Narrow after the embed aggregate; runs identically
    on a batch frame and a micro-batch."""
    from pyspark.sql import functions as F

    from ..functions.embeddings import embed_documents

    return (
        embed_documents(docs)
        .withColumn("_n2", F.expr(
            "aggregate(zip_with(embedding, embedding, (a, b) -> a * b),"
            " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
        .where("_n2 > 0")
        # try_divide, not /: ANSI evaluates the projection for the
        # union's zero-vector rows before the filter prunes them
        # (collapsed plan), and a plain divide-by-zero throws there
        .selectExpr(
            "vec_id",
            "transform(embedding, x -> CAST(round(try_divide(x * 127,"
            " sqrt(_n2)), 0) AS BIGINT)) AS qv")
        .withColumn("n2q", F.expr(
            "aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, "
            "(acc, x) -> acc + x)"))
    )


def curate_ingest(
    doc_stream: DataFrame,
    corpus: DataFrame,
    emit,
    checkpoint_dir: str | None = None,
    lm_max_cost_mnats: int | None = None,
    lm_tables_dir: str | None = None,
    semantic_dedup: bool = False,
):
    """Ingest-time curation gate — the streaming door of a training-data
    pipeline: each micro-batch of incoming (doc_id, lang, text)
    documents is annotated (language-ID, quality, Gopher signals),
    scored by the SAME linear classifier head the batch curation
    pipeline applies (queries/llm.CLF_MARGIN_EXPR — one model, two
    surfaces), and near-dup-flagged against the static corpus band
    index; `emit(kept_df, epoch_id)` receives the admitted documents
    with their annotations plus `near_dup`/`clf_keep`/`admitted`.

    Mechanics: foreachBatch, so the per-batch plan runs under BATCH
    semantics — the band join, the per-doc any-match aggregation, and
    the anti-join are ordinary bounded operators, and the stream holds
    ZERO streaming state (the corpus index is a static frame, re-scanned
    or broadcast per batch; at 100 TB it is bucketed by band key so each
    batch prunes to the buckets its keys touch — the same layout note
    as dedup_against_corpus_stream, whose index this reuses). This is
    the production shape for "merge the batch against the big static
    thing": state lives in the data layout, not the stream.

    `lm_max_cost_mnats`: when set, each batch is additionally scored
    against the CORPUS bigram LM (queries/llm.corpus_lm_tables /
    score_against_corpus_lm — CCNet's deployment shape: LM trained on
    the reference corpus, incoming text scored by it) and documents
    whose average transition cost exceeds the cap fail admission
    (`lm_ok` column). Static LM tables, stream-static joins, zero
    streaming state — the same architecture as the band index; docs
    with no bigrams pass (no evidence either way).

    `lm_tables_dir`: score against a PERSISTED corpus LM
    (save_corpus_lm / `curate --lm-train`) instead of training from
    `corpus` at gate setup — the full train-once/score-many CCNet
    deployment; the n-gram order travels with the artifact.

    `semantic_dedup` (round 12, VERDICT r11 #5): the band gate is
    token-ORDER-sensitive (MinHash over shingles), so a paraphrase
    that reuses a corpus doc's words in a different order sails
    through it. With this flag the gate ALSO checks SemDeDup's
    quantized-cosine threshold against the corpus cell index: at
    setup, the corpus is quantized (`semdedup_quantize`), a k-means
    codebook trains once (`_semdedup_train_codebook`), and the
    (cid, qv) index checkpoints; per batch, incoming docs quantize,
    assign their cell with one narrow integer-argmax expression
    (`semdedup_cell_expr`), and a stream-static equi-join on `cid`
    flags any within-cell quantized cosine ≥ SEMDEDUP_TAU — exact
    integer arithmetic, zero streaming state, the
    embedding_dedup_stream shape. Failing docs get `sem_dup=True` and
    fail admission. At 100 TB the index persists bucketed by cid so
    each batch reads only the cells it probes (DEPLOY §3's layout
    note); cross-cell misses follow the paper's nprobe=1 trade.

    Returns the started StreamingQuery."""
    import uuid as _uuid

    from ..queries.llm import (
        CLF_MARGIN_EXPR,
        _annotations_sql,
        _minhash_signatures,
        corpus_lm_tables,
        minhash_bands_narrow,
        score_against_corpus_lm,
    )

    corpus_bands = _band_rows(_minhash_signatures(corpus), "corpus_doc_id")
    lm_tables = None
    lm_order = 2
    if lm_max_cost_mnats is not None:
        if lm_tables_dir is not None:
            # persisted reference LM (save_corpus_lm / curate
            # --lm-train): parquet-backed tables ARE the materialized
            # form — train-once/score-many, no per-gate retraining,
            # and the order travels with the artifact
            from ..queries.llm import load_corpus_lm

            bgc0, uni0, vsz0, lm_order = load_corpus_lm(
                doc_stream.sparkSession, lm_tables_dir
            )
            lm_tables = (bgc0, uni0, vsz0)
        else:
            bgc0, uni0, vsz0 = corpus_lm_tables(corpus)
            # materialize ONCE at gate setup: left lazy, every
            # micro-batch would re-tokenize the whole corpus and re-run
            # both global aggregations — gate latency must track batch
            # size, not corpus size (at 100 TB: persist these bucketed
            # by `b`, see DEPLOY §3)
            lm_tables = (
                bgc0.localCheckpoint(eager=True),
                uni0.localCheckpoint(eager=True),
                vsz0,
            )
    sem_index = None
    sem_cell = None
    if semantic_dedup:
        from ..queries.llm import (
            _semdedup_train_codebook,
            semdedup_cell_expr,
        )

        cq = semdedup_quantize(
            corpus.selectExpr("doc_id", "text")
        ).localCheckpoint(eager=True)
        vtrain = f"_sem_gate_{_uuid.uuid4().hex[:8]}"
        cq.createOrReplaceTempView(vtrain)
        try:
            cs = _semdedup_train_codebook(corpus.sparkSession, vtrain)
        finally:
            corpus.sparkSession.catalog.dropTempView(vtrain)
        if cs:
            sem_cell = semdedup_cell_expr(cs)
            sem_index = cq.selectExpr(
                "vec_id AS corpus_doc_id", f"{sem_cell} AS cid",
                "qv AS cqv", "n2q AS cn2",
            ).localCheckpoint(eager=True)
    view = f"_ingest_gate_{_uuid.uuid4().hex[:8]}"

    def gate(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.createOrReplaceTempView(view)
        try:
            # lm=False: an in-batch bigram LM over a microbatch is
            # noise, and the gate stays a narrow per-batch projection
            ann = spark.sql(_annotations_sql(True, src=view, lm=False))
            matched = (
                _band_rows(minhash_bands_narrow(batch_df), "doc_id")
                .join(corpus_bands, ["band_idx", "bucket"])
                .where("doc_id <> corpus_doc_id")
                .select("doc_id")
                .distinct()
                .withColumn("near_dup", F.lit(True))
            )
            kept = (
                ann.join(matched, "doc_id", "left")
                .withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))
                .withColumn("clf_keep", F.expr(f"({CLF_MARGIN_EXPR}) >= 0"))
            )
            if lm_tables is not None:
                bgc, uni, vsz = lm_tables
                # one score row per doc_id even if a producer file
                # carries duplicate ids — the join must not fan out
                lm_scores = score_against_corpus_lm(
                    batch_df.dropDuplicates(["doc_id"]), bgc, uni, vsz,
                    n=lm_order,
                ).select("doc_id", "lm_bigrams", "lm_avg_cost_mnats",
                         "lm_ppl")
                kept = kept.join(lm_scores, "doc_id", "left").withColumn(
                    "lm_ok",
                    F.expr(
                        "lm_avg_cost_mnats IS NULL OR "
                        f"lm_avg_cost_mnats <= {int(lm_max_cost_mnats)}"
                    ),
                )
                admit = "clf_keep AND NOT near_dup AND lm_ok"
            else:
                admit = "clf_keep AND NOT near_dup"
            if sem_index is not None:
                from ..queries.llm import (
                    SEMDEDUP_TAU_DEN,
                    SEMDEDUP_TAU_NUM,
                )

                sem_hits = (
                    semdedup_quantize(
                        batch_df.selectExpr("doc_id", "text"))
                    .selectExpr("vec_id AS doc_id",
                                f"{sem_cell} AS cid", "qv", "n2q")
                    .join(sem_index, "cid")
                    .where("doc_id <> corpus_doc_id")
                    .withColumn("dotq", F.expr(
                        "aggregate(zip_with(qv, cqv, (a, b) -> a * b),"
                        " 0L, (acc, x) -> acc + x)"))
                    .where(
                        f"dotq > 0 AND {SEMDEDUP_TAU_DEN ** 2} * dotq"
                        f" * dotq >= {SEMDEDUP_TAU_NUM ** 2} * n2q * cn2")
                    .select("doc_id")
                    .distinct()
                    .withColumn("sem_dup", F.lit(True))
                )
                kept = (
                    kept.join(sem_hits, "doc_id", "left")
                    .withColumn("sem_dup",
                                F.coalesce("sem_dup", F.lit(False)))
                )
                admit += " AND NOT sem_dup"
            kept = kept.withColumn("admitted", F.expr(admit))
            emit(kept, epoch_id)
        finally:
            spark.catalog.dropTempView(view)

    writer = doc_stream.writeStream.foreachBatch(gate).queryName("ingest_gate")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def assign_stream_to_cells(
    embed_stream: DataFrame, codebook: list[list[int]]
) -> DataFrame:
    """Live ANN-index maintenance: assign each incoming embedding to
    its trained IVF cell (queries/llm.ivf_cell_expr — the same integer
    argmax the batch entry computes) as ONE narrow projection with
    zero streaming state. Pair with `upsert_parquet_sink(out, keys=
    ["vec_id"])` to keep the index current on disk: a micro-batch
    rewrites only the key-buckets its vectors touch, and searches read
    the cells they probe. Zero-norm vectors get a NULL cell (they are
    unsearchable by cosine and excluded by every search path)."""
    from ..queries.llm import ivf_cell_expr

    return embed_stream.selectExpr(
        "*", f"{ivf_cell_expr(codebook)} AS cell"
    )


def embedding_dedup_stream(
    embed_stream: DataFrame,
    index: DataFrame,
    codebook: list[list[int]],
    threshold: float = 0.9,
    nprobe: int = 1,
) -> DataFrame:
    """Embedding-space ingest dedup — the vector analog of
    `dedup_against_corpus_stream`: each incoming embedding is assigned
    its IVF cell (narrow, stateless) and checked against the SAME-CELL
    corpus vectors only, cosine >= threshold flags a near-dup. A
    stream-static equi-join on `cell`, so streaming state is ZERO and
    at scale the static side's cell partitioning prunes each
    micro-batch's read to the cells it touches — candidate generation
    never leaves the cell, exactly like the batch IVF search.

    Returns (vec_id, dup_of, cos) candidate rows, best-effort within
    the probed cells (a near-dup whose twin landed in a cell outside
    the probe set is missed — the same recall trade every IVF search
    makes). `nprobe` (round 12) widens the STREAM side to its best
    `nprobe` cells via `ivf_probe_cells_expr` (the index side keeps
    its single argmax cell, like every IVF query path here): a twin
    straddling a cell boundary is caught once the probe set covers
    its cell, at ~nprobe× the join work; no output duplicates arise
    (the index holds each vector in exactly one cell, and the probe
    list is distinct cells)."""
    from ..queries.llm import (
        _dot6_expr,
        _norm_vec_expr,
        ivf_probe_cells_expr,
    )

    nv = _norm_vec_expr(True)
    if nprobe <= 1:
        sn = assign_stream_to_cells(embed_stream, codebook).where(
            "cell IS NOT NULL"
        ).selectExpr("vec_id", f"{nv} AS qnv", "cell")
    else:
        sn = embed_stream.selectExpr(
            "vec_id", f"{nv} AS qnv",
            f"{ivf_probe_cells_expr(codebook, nprobe)} AS cells",
        ).where("cells IS NOT NULL").selectExpr(
            "vec_id", "qnv", "explode(cells) AS cell")
    cn = index.where("cell IS NOT NULL").selectExpr(
        "vec_id AS dup_of", f"{nv} AS cnv", "cell"
    )
    # no dedup needed even at nprobe>1: the index holds each vector in
    # exactly ONE cell and the probe list is distinct cells, so a
    # (vec_id, dup_of) pair can match in at most one probed cell — and
    # a streaming dropDuplicates would have bought unbounded state
    return (
        sn.join(cn, "cell")
        .where("vec_id <> dup_of")
        .selectExpr(
            "vec_id", "dup_of",
            f"{_dot6_expr('qnv', 'cnv', True)} AS cos",
        )
        .where(f"cos >= {threshold}")
    )

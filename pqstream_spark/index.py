"""`python -m pqstream_spark.index` — the vector-index lifecycle as a
CLI: build (train codebook + assign + write cell-partitioned parquet),
add (assign new vectors with the stored codebook, append), search
(cell-pruned exact-cosine top-k, one JSON line per hit).

    python -m pqstream_spark.index build  --embeddings emb.parquet --out idx/
    python -m pqstream_spark.index add    --index idx/ --embeddings new.parquet
    python -m pqstream_spark.index search --index idx/ --queries q.parquet --k 5

Layout: `idx/codebook.json` (the K×dim integer codebook, K =
`build --cells`, default 8 — the whole trained artifact,
deterministic, reviewable by eye) and `idx/cells/`
parquet partitioned by `cell=N` — so a search that probes one cell
READS one cell (partition pruning), which is the IVF contract at any
scale. `add` appends into the cells its vectors land in; re-adding a
vec_id is an upsert responsibility of the caller (or use the streaming
path: `assign_stream_to_cells` + `upsert_parquet_sink`).

Thin driver over the same library code the oracle-checked entry and
tests run (queries/llm.train_ivf_codebook_from / ivf_cell_expr /
search_ivf_index) — not a second implementation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    # parent parser so `index build ... --cpus N` (flag AFTER the
    # subcommand, the natural spelling) parses and shows in sub-help
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cpus", type=int, default=None,
                        help="local[N] cores (default: all)")
    p = argparse.ArgumentParser(
        prog="python -m pqstream_spark.index",
        description="build / extend / search an IVF vector index",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", parents=[common],
                       help="train codebook + write the index")
    b.add_argument("--embeddings", required=True,
                   help="parquet with (vec_id, embedding)")
    b.add_argument("--out", required=True, help="index directory")
    b.add_argument("--pq", action="store_true",
                   help="also train PQ sub-codebooks and store an 8-byte"
                   " packed code per vector (enables search --adc)")
    b.add_argument("--residual", action="store_true",
                   help="with --pq: encode the RESIDUAL x - "
                   "centroid(cell) instead of the raw vector (true "
                   "IVFADC, Jegou 2011 - better recall per byte on "
                   "clustered corpora; search --adc scores add the "
                   "exact per-cell coarse term automatically)")
    b.add_argument("--embedder", default=None, metavar="ID",
                   help="record the embedding source identity (e.g. "
                   "md5-hash-v1 for functions/embeddings.embed_documents"
                   " output) - search --documents refuses indexes built"
                   " from a different or unrecorded embedder")
    b.add_argument("--cells", type=int, default=8,
                   help="IVF cell count K (default 8). Production IVF "
                   "scales K with corpus size (K ~ sqrt(N)); each "
                   "search probes --nprobe of K cells, so read volume "
                   "tracks nprobe/K of the corpus")

    a = sub.add_parser("add", parents=[common],
                       help="assign + append new vectors")
    a.add_argument("--index", required=True)
    a.add_argument("--embeddings", required=True)

    c = sub.add_parser("compact", parents=[common],
                       help="rewrite cells/ as few compact files per "
                       "cell (appends leave one sliver per add per "
                       "cell; search cost follows file count)")
    c.add_argument("--index", required=True)

    s = sub.add_parser("search", parents=[common],
                       help="top-k per query vector")
    s.add_argument("--index", required=True)
    qsrc = s.add_mutually_exclusive_group(required=True)
    qsrc.add_argument("--queries",
                      help="parquet with (vec_id|q_id, embedding)")
    qsrc.add_argument("--documents",
                      help="parquet/CSV with (text[, doc_id]): embed "
                      "with the hashing-trick embedder "
                      "(functions/embeddings.py) and search by text — "
                      "the index must have been built over embeddings "
                      "of the same dimension")
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--nprobe", type=int, default=1,
                   help="cells to probe per query (1 = fastest, "
                   "n_cells = exact within the index)")
    s.add_argument("--include-self", action="store_true",
                   help="keep hits where c_id == q_id")
    s.add_argument("--arrow", action="store_true",
                   help="numpy-matmul re-rank (search_ivf_index_arrow)"
                   " — same results as the default expression path, "
                   "faster at large probed-candidate volumes")
    s.add_argument("--max-queries", type=int, default=10_000,
                   help="with --arrow: cap on the query-frame size the "
                   "kernel ships driver-side (exceeding it errors with "
                   "guidance; the default non-arrow path has no cap — "
                   "its query side never leaves the engine)")
    s.add_argument("--adc", action="store_true",
                   help="score candidates from the 8-byte PQ codes "
                   "(asymmetric distance; index must be built --pq) "
                   "instead of exact cosine over raw vectors")
    return p


def _load_embeddings(spark, path):
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if "vec_id" not in df.columns and "q_id" in df.columns:
        df = df.withColumnRenamed("q_id", "vec_id")
    if "vec_id" not in df.columns or "embedding" not in df.columns:
        raise SystemExit(
            f"{path}: need (vec_id, embedding) columns, have {df.columns}"
        )
    return df.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .alias("embedding")
    )


def _codebook_path(index_dir: str) -> str:
    return os.path.join(index_dir, "codebook.json")


def _cells_path(index_dir: str) -> str:
    return os.path.join(index_dir, "cells")


def main(argv: list[str] | None = None, out=None) -> int:
    args = build_parser().parse_args(argv)
    out = out if out is not None else sys.stdout

    from .queries.llm import (
        assign_ivf_cells,
        ivf_cell_expr,
        search_ivf_index,
        train_ivf_codebook_from,
    )
    from .session import get_spark

    spark = get_spark("pqstream-index", cpus=args.cpus)

    if args.cmd == "build":
        # pure-argparse validation BEFORE any Spark work — a forgotten
        # --pq must not cost a full codebook training run
        if args.residual and not args.pq:
            print("--residual requires --pq", file=sys.stderr)
            return 2
        emb = _load_embeddings(spark, args.embeddings)
        if args.cells < 1:
            print("--cells must be >= 1", file=sys.stderr)
            return 1
        cb = train_ivf_codebook_from(emb, k_cells=args.cells)
        if not cb:
            print("no non-zero vectors to index", file=sys.stderr)
            return 1
        # batch build → static-sum codegen assignment (K×dim literal
        # terms over a materialized qv) for small K, Arrow/numpy matmul
        # for large K; the HOF `ivf_cell_expr` form stays the
        # `add`/streaming path, where frames are micro-batch sized and
        # a checkpoint barrier is unavailable. Repartition ON the cell
        # key before the partitioned write: without it every task
        # writes a sliver into every cell directory (tasks × K tiny
        # files — measured 31 s of filesystem churn at K=64/100k rows);
        # with it each cell is a few compact files, which is also the
        # read-side contract (probe one cell → read one file).
        assigned = assign_ivf_cells(emb, cb)
        meta = {"codebook": cb}
        if args.embedder:
            meta["embedder"] = args.embedder
        if args.pq:
            if args.residual:
                from .functions.pq import (
                    pq_encode_ivf,
                    train_pq_codebooks_residual,
                )

                books = train_pq_codebooks_residual(emb, cb)
                meta["pq_books"] = books
                meta["pq_residual"] = True
                # reuse the assignment computed above — the per-row
                # argmax is the expensive half of the build and must
                # not run twice. Checkpoint so both consumers (the
                # partitioned write and the residual encode) read the
                # materialized frame instead of re-deriving it.
                assigned = assigned.localCheckpoint(eager=True)
                codes = pq_encode_ivf(emb, cb, books, arrow=True,
                                      assigned=assigned)
            else:
                from .functions.pq import pq_encode, train_pq_codebooks

                books = train_pq_codebooks(emb)
                meta["pq_books"] = books
                codes = pq_encode(emb, books, arrow=True)
            assigned = assigned.join(
                codes.select("vec_id", "code"), "vec_id",
            )
        # repartition LAST (a vec_id join would re-shuffle away the
        # cell clustering): each cell lands as a few compact files
        assigned.repartition("cell").write.mode("overwrite") \
            .partitionBy("cell").parquet(_cells_path(args.out))
        with open(_codebook_path(args.out), "w") as f:
            json.dump(meta, f)
        n = spark.read.parquet(_cells_path(args.out)).count()
        print(json.dumps({"indexed": n, "cells": len(cb),
                          "dim": len(cb[0]), "pq": bool(args.pq),
                          "out": args.out},
                         separators=(",", ":")), file=out)
        return 0

    with open(_codebook_path(args.index)) as f:
        meta = json.load(f)
    cb = meta["codebook"]

    if args.cmd == "add":
        emb = _load_embeddings(spark, args.embeddings)
        before = spark.read.parquet(_cells_path(args.index)).count()
        assigned = emb.selectExpr(
            "vec_id", "embedding", f"{ivf_cell_expr(cb)} AS cell"
        ).where("cell IS NOT NULL")
        if "pq_books" in meta:
            # a --pq index stores a `code` column per vector; appending
            # rows without it would mix parquet schemas in cells/ and
            # make the added vectors unretrievable by `search --adc`
            # (NULL codes under the build files' schema). Encode the
            # additions against the STORED sub-codebooks — the same
            # artifact search uses, so old and new codes score alike.
            if meta.get("pq_residual"):
                from .functions.pq import pq_encode_ivf

                # reuse this add's own cell assignment (same contract
                # as assign_ivf_cells, pinned equal) instead of
                # recomputing the argmax inside the encoder
                assigned = assigned.localCheckpoint(eager=True)
                codes = pq_encode_ivf(emb, cb, meta["pq_books"],
                                      arrow=True, assigned=assigned)
            else:
                from .functions.pq import pq_encode

                codes = pq_encode(emb, meta["pq_books"], arrow=True)
            assigned = assigned.join(
                codes.select("vec_id", "code"), "vec_id",
            )
        assigned.write.mode("append").partitionBy("cell").parquet(
            _cells_path(args.index)
        )
        # count the written delta, not assigned.count(): the latter
        # would re-scan the input and re-run the per-row argmax
        after = spark.read.parquet(_cells_path(args.index)).count()
        print(json.dumps({"added": after - before},
                         separators=(",", ":")), file=out)
        return 0

    if args.cmd == "compact":
        import glob as _glob
        import shutil as _shutil

        cells = _cells_path(args.index)
        old = cells + ".old"
        # crash recovery BEFORE anything else: a kill between the two
        # renames below leaves cells/ missing with cells.old complete
        # (restore it); a kill after the second rename leaves a stale
        # cells.old next to a valid cells/ (clear it so the next
        # compact's rename target is free)
        if not os.path.exists(cells) and os.path.exists(old):
            os.rename(old, cells)
        elif os.path.exists(old):
            _shutil.rmtree(old)
        files_before = len(_glob.glob(os.path.join(cells, "*", "*.parquet")))
        df = spark.read.parquet(cells)
        n_before = df.count()
        # write-aside then swap: the old layout stays readable until
        # the new one is complete and row-count-verified; the rename
        # window is recovered by the logic above, so any crash leaves
        # a usable index after the next compact invocation
        tmp_new = cells + ".compact"
        if os.path.exists(tmp_new):
            _shutil.rmtree(tmp_new)  # stale from an aborted run
        df.repartition("cell").write.mode("overwrite") \
            .partitionBy("cell").parquet(tmp_new)
        if spark.read.parquet(tmp_new).count() != n_before:
            print("compact aborted: row count mismatch", file=sys.stderr)
            _shutil.rmtree(tmp_new)
            return 1
        os.rename(cells, old)
        os.rename(tmp_new, cells)
        _shutil.rmtree(old)
        files_after = len(_glob.glob(os.path.join(cells, "*", "*.parquet")))
        print(json.dumps({"rows": n_before,
                          "files_before": files_before,
                          "files_after": files_after},
                         separators=(",", ":")), file=out)
        return 0

    # search
    index = spark.read.parquet(_cells_path(args.index))
    if args.documents:
        from pyspark.sql import functions as F

        from .functions.embeddings import embed_documents

        if args.documents.endswith(".csv"):
            qdocs = spark.read.option("header", "true").csv(args.documents)
        else:
            qdocs = spark.read.parquet(args.documents)
        if "text" not in qdocs.columns:
            print(f"--documents: no `text` column in {args.documents}",
                  file=sys.stderr)
            return 1
        if "doc_id" not in qdocs.columns:
            qdocs = qdocs.withColumn("doc_id", F.expr("xxhash64(text)"))
        from .functions.embeddings import EMBEDDER_ID

        if meta.get("embedder") != EMBEDDER_ID:
            # cosine between unrelated embedding spaces is silently
            # meaningless — refuse unless the build recorded that its
            # vectors came from this module's embedder
            print(
                f"--documents requires an index built from "
                f"{EMBEDDER_ID} embeddings (build with "
                f"--embedder {EMBEDDER_ID} over embed_documents "
                f"output); this index records "
                f"embedder={meta.get('embedder')!r}",
                file=sys.stderr,
            )
            return 2
        dim = len(cb[0])
        queries = embed_documents(
            qdocs.select("doc_id", "text"), dim=dim
        ).withColumnRenamed("vec_id", "q_id")
    else:
        queries = _load_embeddings(spark, args.queries).withColumnRenamed(
            "vec_id", "q_id"
        )
    if args.adc:
        if "pq_books" not in meta:
            print("--adc requires an index built with --pq",
                  file=sys.stderr)
            return 1
        from .functions.pq import ivfpq_search

        hits = ivfpq_search(
            index.select("vec_id", "code", "cell"), queries, cb,
            meta["pq_books"], k=args.k, nprobe=args.nprobe,
            exclude_self=not args.include_self,
            residual=bool(meta.get("pq_residual")),
        )
        for r in hits.orderBy("q_id", "rn").collect():
            print(json.dumps(
                {"q_id": r["q_id"], "c_id": r["c_id"],
                 "score": r["score"], "rn": r["rn"]},
                separators=(",", ":")), file=out)
        return 0
    if args.arrow:
        from .queries.llm import search_ivf_index_arrow

        hits = search_ivf_index_arrow(
            index, queries, cb, k=args.k,
            exclude_self=not args.include_self, nprobe=args.nprobe,
            max_queries=args.max_queries,
        )
    else:
        hits = search_ivf_index(
            index, queries, cb, k=args.k,
            exclude_self=not args.include_self, nprobe=args.nprobe,
        )
    for r in hits.orderBy("q_id", "rn").collect():
        print(json.dumps(
            {"q_id": r["q_id"], "c_id": r["c_id"], "cos": r["cos"],
             "rn": r["rn"]}, separators=(",", ":")), file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

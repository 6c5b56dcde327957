"""IVF large-K scale probe (round-6 ask #2 evidence): build a
--cells 64 index over a ~100k-vector synthetic corpus (50 re-keyed,
deterministically perturbed copies of sf0.1's embeddings — distinct
vectors, so cells stay meaningful) and measure search wall time as a
function of nprobe. The claim under test: with the index partitioned
by cell, search cost tracks PROBED-CELL VOLUME (nprobe/K of the
corpus), not corpus size — the partition-pruning contract that holds
at any scale. Recall vs exact brute force is reported per nprobe.

    python tools/ivf_scale_probe.py            # writes JSON to stdout

Results land in SCALE.md's round-6 section (run once per round when
the IVF path changes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 50
K_CELLS = 64
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/pqstream_scale")


def main() -> None:
    import numpy as np
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from pqstream_spark.queries.llm import (
        assign_ivf_cells,
        search_ivf_index,
        train_ivf_codebook_from,
    )
    from pqstream_spark.session import get_spark

    spark = get_spark("ivf-scale-probe")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet") \
        .selectExpr("vec_id",
                    "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    parts = []
    for k in range(COPIES):
        parts.append(base.select(
            (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, i) -> x + "
                f"cos(CAST(vec_id % 101 + i * {k + 1} AS DOUBLE)) * 0.2)"
            ).alias("embedding"),
        ))
    corpus_path = os.path.join(OUT, "ivf100k.parquet")
    if not os.path.exists(corpus_path):
        reduce(DataFrame.unionByName, parts).write.mode("overwrite") \
            .parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()

    t0 = time.time()
    cb = train_ivf_codebook_from(corpus, k_cells=K_CELLS)
    t_train = time.time() - t0
    t0 = time.time()
    assigned = assign_ivf_cells(corpus, cb).localCheckpoint(eager=True)
    t_assign = time.time() - t0
    t0 = time.time()
    cells_path = os.path.join(OUT, "ivf100k_cells")
    assigned.repartition("cell").write.mode("overwrite") \
        .partitionBy("cell").parquet(cells_path)
    t_write = time.time() - t0

    index = spark.read.parquet(cells_path)
    cell_widths = {r["cell"]: r["count"] for r in
                   index.groupBy("cell").count().collect()}

    queries = corpus.where("vec_id < 10").selectExpr(
        "vec_id AS q_id", "embedding")

    # exact ground truth, driver-side (10 queries x 100k — fine here)
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

    from pqstream_spark.functions.pq import (
        ivfpq_search,
        pq_encode,
        pq_encode_ivf,
        train_pq_codebooks,
        train_pq_codebooks_residual,
    )
    from pqstream_spark.queries.llm import search_ivf_index_arrow

    # IVF-PQ: 8-byte codes + cell assignment, the memory-resident scan
    t0 = time.time()
    books = train_pq_codebooks(corpus)
    codes = pq_encode(corpus, books, arrow=True).join(
        index.select("vec_id", "cell"), "vec_id"
    ).localCheckpoint(eager=True)
    t_pq_build = time.time() - t0

    # residual IVF-PQ (true IVFADC, round-7): codes quantize
    # x − centroid(cell); search adds the exact coarse term per cell
    t0 = time.time()
    rbooks = train_pq_codebooks_residual(corpus, cb)
    rcodes = pq_encode_ivf(corpus, cb, rbooks,
                           arrow=True).localCheckpoint(eager=True)
    t_pqr_build = time.time() - t0

    probes = []
    for nprobe in (1, 4, 16, 64):
        # warm once, then min of 3 timed runs
        search_ivf_index(index, queries, cb, k=5, nprobe=nprobe).count()
        times = []
        got = {}
        for _ in range(3):
            t0 = time.time()
            hits = search_ivf_index(index, queries, cb, k=5,
                                    nprobe=nprobe).collect()
            times.append(time.time() - t0)
            got = {}
            for r in hits:
                got.setdefault(r["q_id"], set()).add(r["c_id"])
        recall = sum(len(exact[q] & got.get(q, set()))
                     for q in range(10)) / 50.0
        search_ivf_index_arrow(index, queries, cb, k=5,
                               nprobe=nprobe).count()
        at = []
        for _ in range(3):
            t0 = time.time()
            search_ivf_index_arrow(index, queries, cb, k=5,
                                   nprobe=nprobe).count()
            at.append(time.time() - t0)
        ivfpq_search(codes, queries, cb, books, k=5,
                     nprobe=nprobe).count()
        pt = []
        got_pq = {}
        for _ in range(3):
            t0 = time.time()
            hits_pq = ivfpq_search(codes, queries, cb, books, k=5,
                                   nprobe=nprobe).collect()
            pt.append(time.time() - t0)
            got_pq = {}
            for r in hits_pq:
                got_pq.setdefault(r["q_id"], set()).add(r["c_id"])
        recall_pq = sum(len(exact[q] & got_pq.get(q, set()))
                        for q in range(10)) / 50.0
        ivfpq_search(rcodes, queries, cb, rbooks, k=5,
                     nprobe=nprobe, residual=True).count()
        rt = []
        got_r = {}
        for _ in range(3):
            t0 = time.time()
            hits_r = ivfpq_search(rcodes, queries, cb, rbooks, k=5,
                                  nprobe=nprobe, residual=True).collect()
            rt.append(time.time() - t0)
            got_r = {}
            for r in hits_r:
                got_r.setdefault(r["q_id"], set()).add(r["c_id"])
        recall_r = sum(len(exact[q] & got_r.get(q, set()))
                       for q in range(10)) / 50.0
        # candidate volume actually scanned = Σ widths of probed cells
        probes.append({"nprobe": nprobe, "t_min": round(min(times), 3),
                       "t_min_arrow": round(min(at), 3),
                       "t_min_adc": round(min(pt), 3),
                       "t_min_adc_residual": round(min(rt), 3),
                       "recall_at_5": recall,
                       "recall_at_5_adc": recall_pq,
                       "recall_at_5_adc_residual": recall_r})
    print(json.dumps({
        "n_vectors": n, "k_cells": len(cb),
        "t_train_s": round(t_train, 2), "t_assign_s": round(t_assign, 2),
        "t_write_s": round(t_write, 2),
        "t_pq_build_s": round(t_pq_build, 2),
        "t_pq_residual_build_s": round(t_pqr_build, 2),
        "min_cell": min(cell_widths.values()),
        "max_cell": max(cell_widths.values()),
        "probes": probes,
    }, indent=2))


if __name__ == "__main__":
    main()

"""Scale-growth harness: measures how the dedup / ANN / text-pipeline
entries grow across four scale factors — sf0.001, sf0.01, sf0.1 (the
driver's parquet) and a locally-synthesized sf1 (10 re-keyed copies of
sf0.1's documents+embeddings; other tables symlinked) — and fits the
per-query growth exponent alpha where time ~ sf^alpha.

The 100 TB design claims (capped LSH buckets, width-capped NN labels,
bucket-keyed shuffles, log-round connected components) predict <= ~linear
growth; anything bending quadratic here is a scale-killer caught while
the data is still small. The sf1 synthesis deliberately makes the
workload HARDER per row than organic data: every document/vector gains
9 exact clones, so duplicate density, LSH bucket width, and NN label
width all grow 10x — the regime the caps exist for.

Usage:
    python bench_scale.py               # prints one JSON line, updates SCALE.md
    SPARK_GRAFT_SCALE_ITERS=3 python bench_scale.py
    SPARK_GRAFT_SCALE_DIR=/tmp/foo python bench_scale.py   # synth location

Exponent caveat: points below sf0.1 are dominated by Spark's fixed
per-query overhead (~0.2-0.5 s of planning/py4j), which flattens alpha
toward 0; the headline exponent is therefore fitted on the two largest
points (sf0.1 -> sf1), where fixed cost is amortized.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SRC = "/root/testdata/sf0.1"
SYNTH_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/pqstream_scale")
N_ITERS = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "2")))
MULT = 10
ID_OFFSET = 1_000_000  # far above max(doc_id)=4999 / max(vec_id)=1999

# the entries whose 100 TB story the caps carry (VERDICT r4 ask #1),
# plus the cheap single-scan baselines for contrast
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_pairwise_scores",
    "dedup_pipeline_corpus",
    "sim_topk_brute_ivf",
    "sim_ann_lsh_quantized",
    "text_annotations",
    "text_curation_pipeline",
    # round 9: the CDC fold with the single-exchange TRUNCATE
    # delete-all branch — its growth must stay the one key shuffle
    "cdc_materialize_state",
]

SCALES = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
    (os.path.join(SYNTH_ROOT, "sf1synth"), 1.0),
]


def synthesize(spark, out_dir: str) -> None:
    """Build the sf1-scale directory: documents+embeddings are MULT
    re-keyed unions of sf0.1 (copy 0 keeps original ids, so the fixed
    vec_id<10 ANN query set is unchanged while the corpus grows 10x);
    every other table is symlinked from sf0.1 unmodified."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from pqstream_spark.sources.tables import TABLE_NAMES

    marker = os.path.join(out_dir, "_SYNTH_OK")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    for name, id_col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        base = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        copies = [
            base.withColumn(id_col, (F.col(id_col) + F.lit(k * ID_OFFSET)).cast("long"))
            for k in range(MULT)
        ]
        reduce(DataFrame.unionByName, copies).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name in TABLE_NAMES:
        if name in ("documents", "embeddings"):
            continue
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    with open(marker, "w") as fh:
        fh.write(f"mult={MULT} src={SRC}\n")


def fit_alpha(sfs: list[float], times: list[float]) -> float:
    """Least-squares slope of log(time) vs log(sf) over the given
    points: time ~ sf^alpha."""
    xs = [math.log10(s) for s in sfs]
    ys = [math.log10(max(t, 1e-3)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="pqstream_bench_scale")
    queries, _ = build_catalog()
    names = [n for n in QUERIES if n in queries]

    synthesize(spark, SCALES[-1][0])

    # warm every plan shape once (codegen compile is not the engine)
    for n in names:
        queries[n](spark, SCALES[0][0]).count()

    times: dict[str, dict[float, float]] = {n: {} for n in names}
    rows: dict[str, dict[float, int]] = {n: {} for n in names}
    for sf_dir, sf in SCALES:
        for n in names:
            runs = []
            cnt = 0
            for _ in range(N_ITERS):
                t0 = time.perf_counter()
                cnt = queries[n](spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
                # untimed inter-iteration reclamation: py4j-held plan
                # references defer the ContextCleaner, so checkpoint/
                # shuffle garbage accumulates across this single long
                # session and a late entry measures the backlog, not
                # the engine — the first round-13 run recorded a 2.2x
                # outlier on the heaviest entry this way
                from bench import _reclaim

                _reclaim(spark)
            times[n][sf] = round(min(runs), 3)
            rows[n][sf] = cnt
            print(f"  sf={sf} {n}: {times[n][sf]}s rows={cnt}", file=sys.stderr, flush=True)

    report = {}
    for n in names:
        sfs = sorted(times[n])
        ts = [times[n][s] for s in sfs]
        # headline: the top decade, where fixed overhead is amortized
        alpha_top = math.log10(ts[-1] / max(ts[-2], 1e-3))
        report[n] = {
            "times": {str(s): times[n][s] for s in sfs},
            "rows": {str(s): rows[n][s] for s in sfs},
            "alpha_all": round(fit_alpha(sfs, ts), 2),
            "alpha_top_decade": round(alpha_top, 2),
        }

    out = {
        "metric": "scale_growth",
        "mult": MULT,
        "n_iters": N_ITERS,
        "queries": report,
        "worst_alpha_top_decade": max(r["alpha_top_decade"] for r in report.values()),
    }
    write_md(report)
    print(json.dumps(out))


def write_md(report: dict) -> None:
    lines = [
        "# SCALE — measured growth across four scale factors",
        "",
        "`python bench_scale.py` measures the dedup/ANN/text entries at",
        "sf0.001 / sf0.01 / sf0.1 (driver parquet) and a synthesized sf1",
        f"({MULT} re-keyed copies of sf0.1's documents+embeddings — every doc/vector",
        "gains 9 exact clones, so duplicate density, LSH bucket width and NN label",
        "width grow 10x: deliberately HARDER per row than organic data).",
        "`alpha` is the growth exponent (time ~ sf^alpha): 1.0 = linear,",
        "2.0 = quadratic. `alpha(top)` is fitted on sf0.1 -> sf1, the only",
        "decade where Spark's fixed ~0.2-0.5 s per-query overhead is",
        "amortized; the all-points fit is shown for completeness but is",
        "biased low by that fixed cost at tiny SFs.",
        "",
        "| query | t(sf0.001) | t(sf0.01) | t(sf0.1) | t(sf1-synth) | alpha(top) | alpha(all) | out-rows sf0.1→sf1 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, r in report.items():
        t = r["times"]
        r01, r1 = r["rows"].get("0.1"), r["rows"].get("1.0")
        growth = f"{r01}→{r1} ({r1 / r01:.0f}x)" if r01 else "—"
        lines.append(
            f"| {n} | {t.get('0.001', '—')}s | {t.get('0.01', '—')}s | "
            f"{t.get('0.1', '—')}s | {t.get('1.0', '—')}s | "
            f"**{r['alpha_top_decade']}** | {r['alpha_all']} | {growth} |"
        )
    lines += [
        "",
        "Host caveat (round 8): ABSOLUTE times in this table are only",
        "comparable within one run — this VM's fixed per-job costs drifted",
        "mid-round (disk to ~65 MB/s; broadcast+localCheckpoint ~3x on",
        "identical plans). The GROWTH exponents cancel the fixed cost",
        "across SFs and stay comparable; normalize absolute times with",
        "bench.py's `calib_sec` host canary when comparing rounds.",
        "",
        "Reading: alpha(top) <= ~1.1 means the entry scales linearly through",
        "a 10x growth in rows AND a 10x growth in duplicate/label density —",
        "the capped-bucket design holding empirically, not just by plan",
        "shape. Sub-linear values mean fixed overhead still dominates at sf1.",
        "The out-rows column shows why the caps matter: clone clusters make",
        "the PAIR space grow far faster than the corpus (every cluster of 10",
        "emits its C(10,2) capped pairs), yet runtime tracks the capped",
        "bucket work, not the pair space.",
        "",
    ]
    md = "\n".join(lines)
    # preserve hand-written sections (anything from the first "## "
    # heading on — e.g. the round-6 IVF probe results): this file
    # regenerates only the measured-exponents block above them
    path = Path(__file__).resolve().parent / "SCALE.md"
    extra = ""
    if path.exists():
        old = path.read_text()
        for i, line in enumerate(old.splitlines(keepends=True)):
            if line.startswith("## "):
                extra = "".join(old.splitlines(keepends=True)[i:])
                break
    with open(path, "w") as fh:
        fh.write(md)
        if extra:
            fh.write("\n" + extra)


if __name__ == "__main__":
    main()

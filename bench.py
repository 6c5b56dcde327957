"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count) over
N_ITERS iterations (default 3, $SPARK_GRAFT_BENCH_ITERS to override),
AFTER one DISCARDED warm-up iteration at the bench SF (round 11,
VERDICT r10 #5: the first at-SF execution pays parquet footer reads,
page-cache faults and shape-specific codegen that the sf0.001 warmup
does not cover — rounds 8-10 each needed a forensic paragraph to
attribute that first-iteration noise).
The headline per-query number stays the MIN (steady-state throughput,
comparable with earlier rounds); the JSON additionally carries the MEAN
and every raw per-iteration time so a slow run is attributable — a
min≈mean spread says engine, min<<mean says host noise (GC pause, cold
page cache, concurrent load). Entries whose mean/min still exceeds 1.5
after the extra-sample guard are named in `flagged_noisy` in the
compact line, so a round-over-round comparison can discount them from
the artifact alone.

A warmup pass on sf0.001 primes the JVM/codegen so we measure the
engine, not JIT warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"
N_ITERS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))

# headline set: the flagship CDC chain + the shuffle/join/window-heavy
# relational queries + the LLM-pipeline operators that matter at scale
HEADLINE = [
    "p1_parse_envelope",
    "p2_merge_patch",
    "k1_jsonline_sink",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q10_returned_items",
    "agg_multilevel_grouping",
    "topk_global_grouped",
    "window_analytics_frames",
    "window_running_sum",
    "sessionize",
    "asof_join_attribution",
    "range_join_purchase_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_pipeline_corpus",
    "dedup_pairwise_scores",
    "sim_topk_brute_ivf",
    "sim_ann_lsh_quantized",
    "text_annotations",
    "text_curation_pipeline",
    "cdc_materialize_state",
    "q6_q19_selective_agg",
    "q18_large_volume_in_having",
    # real StreamingQuery run to completion (source->pipeline->memory
    # sink): measures streaming micro-batch throughput, not just plan
    "stream_changelog_pipeline",
]


# entries that union several certified branches under one `method`
# discriminator: their totals move when a branch is ADDED even though
# nothing regressed, so the bench decomposes them — a branch filter
# over the union constant-folds every other branch away, making each
# branch timing a genuine standalone measurement (VERDICT r6 ask #5)
MULTI_BRANCH = {
    "dedup_pairwise_scores",
    "sim_topk_brute_ivf",
    "sim_ann_lsh_quantized",
    "q6_q19_selective_agg",  # r9: + q9_profit / q21_wait stressors
}
BRANCH_ITERS = 2
# the discriminator column per entry: LLM entries use `method`,
# relational unions use `variant` — detected at warmup
_DISCRIMINATORS = ("method", "variant")


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids of the RDDs the context currently holds persistent (the
    localCheckpoint blocks). Used to SCOPE the purge below (ADVICE
    r14): the purge may only unpersist blocks no later consumer will
    re-execute, and an explicit protect-set makes that structural
    instead of depending on call-site ordering."""
    try:
        rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()  # noqa: SLF001
        it = rdds.iterator()
        ids: set[int] = set()
        while it.hasNext():
            ids.add(int(it.next()._1()))
        return ids
    except Exception:
        return set()  # connect-mode: no JVM handle


def _reclaim(spark, purge: bool = False,
             protect: set[int] | None = None) -> None:
    """Untimed inter-iteration reclamation (round 13): every catalog
    invocation leaves localCheckpoint blocks and shuffle files whose
    cleanup is driven by DRIVER GC — Python holds py4j proxies to the
    plans, so neither Python nor the JVM collects promptly on its own,
    and executor storage/disk pressure accumulates ACROSS iterations.
    Measured on the heaviest entry at sf1-synth: without this,
    back-to-back runs wander 35 -> 88 s within one session; with an
    explicit collect after each run they sit flat at 32.5-33.6 s. The
    bench measures the engine, not the session's garbage backlog, so
    the collection runs OUTSIDE the timed region.

    `purge=True` (round 14) additionally unpersists every still-cached
    RDD — the DEAD previous invocation's checkpoint blocks, which the
    async ContextCleaner lags on under back-to-back invocations
    (measured on dedup_pairwise_scores: plain GC wanders 6.8-7.6 s,
    purge sits flat 5.5-6.1 s). ONLY legal where no earlier DataFrame
    will be re-executed afterwards: a localCheckpoint's lineage is
    truncated at materialization, so an unpersisted one cannot
    recompute — the loop below never purges after the iteration whose
    frame the plan audit and branch discovery re-execute, AND (round
    15, ADVICE r14) `protect` carries the block ids of any frame that
    stays live past this call (the final timed iteration's df), so a
    future call-site reorder fails safe instead of at a distance."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    except Exception:
        pass  # connect-mode / no JVM handle: Python GC alone still
        # releases the py4j references that gate ContextCleaner
    if purge:
        keep = protect or set()
        try:
            rdds = spark.sparkContext._jsc.sc().getPersistentRDDs()  # noqa: SLF001
            it = rdds.iterator()
            while it.hasNext():
                e = it.next()
                if int(e._1()) not in keep:
                    e._2().unpersist(False)
        except Exception:
            pass  # connect-mode: no JVM handle — plain GC reclaim only


def _calibrate(spark) -> dict[str, float]:
    """Host-speed canary: three fixed synthetic workloads, zero engine
    code, so round-over-round BENCH comparisons can be normalized for
    the machine instead of mistaking host drift for regressions. This
    exists because it happened: mid-round-8 this VM's disk dropped to
    ~65 MB/s and its fixed per-job costs (broadcast build, local
    checkpoint) roughly tripled — identical code and byte-identical
    plans measured 3.2 s, then 9 s, hours apart. The three components
    separate the failure modes:

    - shuffle_30m: one wide shuffle (raw parallel throughput)
    - expr_md5_5m: whole-stage-codegen expression crunch (single-core
      JIT'd speed)
    - iter_bcast_ckpt_6r: six rounds of broadcast-join +
      localCheckpoint over a tiny frame — the fixed per-round driver
      cost every iterative entry (connected components) pays, the
      component that actually degraded here

    Two reps, min of each: the canary measures the host, not its own
    warmup."""
    from pyspark.sql import functions as F

    def _rep() -> dict[str, float]:
        out: dict[str, float] = {}
        t = time.perf_counter()
        spark.range(30_000_000).selectExpr("id % 1000 AS k").groupBy(
            "k"
        ).count().count()
        out["shuffle_30m"] = time.perf_counter() - t
        t = time.perf_counter()
        spark.sql(
            "SELECT count(*) FROM (SELECT md5(CAST(id AS STRING)) m "
            "FROM range(5000000)) WHERE m LIKE '%aa%'"
        ).collect()
        out["expr_md5_5m"] = time.perf_counter() - t
        t = time.perf_counter()
        lab = spark.range(10_000).selectExpr("id AS doc_id", "id AS label")
        for _ in range(6):
            lab = (
                lab.join(
                    F.broadcast(
                        lab.selectExpr("doc_id AS d2", "label AS l2")
                    ),
                    F.expr("doc_id = d2"),
                )
                .selectExpr("doc_id", "least(label, l2) AS label")
                .localCheckpoint()
            )
        lab.count()
        out["iter_bcast_ckpt_6r"] = time.perf_counter() - t
        return out

    reps = [_rep(), _rep()]
    return {
        k: round(min(r[k] for r in reps), 3) for k in reps[0]
    }


def main() -> None:
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="pqstream_bench")
    queries, _ = build_catalog()

    names = [n for n in HEADLINE if n in queries]

    # warm up EVERY query shape at the smallest SF: whole-stage-codegen
    # compiles per plan shape, and first execution of a shape measures
    # the Janino compiler, not the engine. Multi-branch entries also
    # surrender their branch list here (tiny SF, one distinct scan).
    branch_values: dict[str, list[str]] = {}
    branch_col: dict[str, str] = {}
    for n in names:
        wdf = queries[n](spark, WARMUP_DIR)
        wdf.count()
        if n in MULTI_BRANCH:
            col = next((c for c in _DISCRIMINATORS if c in wdf.columns), None)
            if col:
                branch_col[n] = col

    # calib gating (round 14, VERDICT r13 #5 / what's-wrong #3): a
    # degraded host makes both the raw totals AND the normalized
    # quotient unreliable (the canaries are not shaped like the
    # entries, so value_norm OVERcorrects on a 2.6x-degraded host).
    # When the pre-run canary lands outside the healthy band, wait and
    # retry a few times so the measured window starts on a healthy
    # host; if it never recovers, run anyway and label the artifact —
    # the driver needs a BENCH line either way.
    healthy = float(os.environ.get("BENCH_CALIB_HEALTHY", "1.6"))
    retries = int(os.environ.get("BENCH_CALIB_RETRIES", "3"))
    wait_s = float(os.environ.get("BENCH_CALIB_WAIT", "60"))
    calib = _calibrate(spark)
    calib_total = round(sum(calib.values()), 3)
    print(f"host calibration: {calib} (total {calib_total}s)",
          file=sys.stderr, flush=True)
    for attempt in range(retries):
        if calib_total <= healthy:
            break
        print(f"host degraded (calib {calib_total}s > {healthy}s): "
              f"waiting {wait_s:.0f}s before retry "
              f"{attempt + 1}/{retries}", file=sys.stderr, flush=True)
        time.sleep(wait_s)
        _reclaim(spark)
        calib = _calibrate(spark)
        calib_total = round(sum(calib.values()), 3)
        print(f"host calibration (retry): {calib} "
              f"(total {calib_total}s)", file=sys.stderr, flush=True)

    timings: dict[str, float] = {}
    means: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    plans: dict[str, dict] = {}
    branch_timings: dict[str, dict[str, float]] = {}
    stream_overhead: dict[str, dict] = {}
    first_call: dict[str, float] = {}
    for n in names:
        runs: list[float] = []
        df = None
        # discarded at-SF warm-up (VERDICT r10 #5): the first execution
        # at the bench SF pays one-time costs (parquet footers, page
        # cache, at-shape codegen) that are neither engine speed nor
        # host drift — timing it poisons both min and mean. Its
        # duration IS recorded (round 15, VERDICT r14 #7): this cold
        # call pays any one-time per-corpus work (IVF codebook
        # training, cell-width collection) that the in-process memos
        # then amortize, so `first_call_sec` keeps that cost visible
        # in the artifact instead of silently riding the warm-up.
        t0 = time.perf_counter()
        queries[n](spark, SF_DIR).count()
        first_call[n] = round(time.perf_counter() - t0, 3)
        _reclaim(spark, purge=True)
        for it_i in range(N_ITERS):
            t0 = time.perf_counter()
            df = queries[n](spark, SF_DIR)
            df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            # purge dead checkpoint blocks between iterations, but
            # NEVER after the last one: the plan audit and branch
            # discovery below re-execute that df, and an unpersisted
            # localCheckpoint (truncated lineage) cannot recompute
            _reclaim(spark, purge=it_i < N_ITERS - 1)
            # fixed-overhead split for streaming entries (VERDICT r8
            # #2): keep the snapshot of the FASTEST iteration so the
            # decomposition describes the same run the headline min
            # reports
            if n.startswith("stream_"):
                from pqstream_spark.queries import streaming_q

                if runs[-1] == min(runs) and streaming_q.LAST_RUN_STATS:
                    stream_overhead[n] = dict(streaming_q.LAST_RUN_STATS)
        # noisy-host guard: when the iterations disagree badly
        # (mean/min > 1.5 — a contention burst hit some of them), take
        # up to 2 extra samples so the reported min is a real
        # steady-state point, not the luckiest survivor of three.
        # (An all-slow burst is indistinguishable here; the pre/post
        # calibration canary is the detector for that case.)
        extras = 0
        while (extras < 2 and min(runs) > 0
               and sum(runs) / len(runs) / min(runs) > 1.5):
            t0 = time.perf_counter()
            queries[n](spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 3))
            _reclaim(spark)
            extras += 1
        raw[n] = runs
        timings[n] = min(runs)
        means[n] = round(sum(runs) / len(runs), 3)
        # scale evidence, not just speed: shuffle/join/codegen shape of
        # the EXECUTED plan (post-AQE — auditing before execution hides
        # codegen markers and runtime join strategy; streaming entries
        # return their sink table, whose trivial scan plan is skipped)
        if not n.startswith("stream_"):
            from pqstream_spark.plans.audit import audit

            a = audit(df, execute=True)
            plans[n] = {
                "exchanges": a.n_exchanges,
                "broadcast_joins": a.n_broadcast_joins,
                "shuffle_joins": a.n_shuffle_joins,
                "pushed_filters": sum(len(p.split(",")) for p in a.pushed_filters),
                "codegen": a.codegen,
            }
        print(
            f"  {n}: min={timings[n]}s mean={means[n]}s raw={runs}",
            file=sys.stderr,
            flush=True,
        )
        # block ids of the final iteration's still-live df: the branch
        # passes below purge between runs, and these are the only
        # blocks a later re-execution of `df` could still need
        final_ids = _persistent_rdd_ids(spark)
        if n in branch_col:
            # branch discovery at BENCH SF, not warmup SF: a selective
            # branch (q21_wait) can emit zero rows at sf0.001 and would
            # silently vanish from the decomposition
            branch_values[n] = sorted(
                r[branch_col[n]]
                for r in df.select(branch_col[n]).distinct().collect()
            )
        if n in branch_values:
            # ADDITIVE attribution (r7 ask #6): a raw per-branch run
            # re-pays the entry's SHARED setup (codebook training,
            # checkpointed relations) every time, so raw branch numbers
            # sum past the entry total and mislead round-over-round
            # decomposition. The shared floor is the entry filtered to
            # a method no branch emits — it constant-folds EVERY branch
            # away but still executes the shared setup — and each
            # branch reports branch_minus_shared.
            #
            # INTERLEAVED, not blocked (round 12, VERDICT r11 #1): r11
            # measured the floor first and the branches after, so a
            # host-contention shift between the blocks made every
            # `branch - shared` clamp to zero exactly on the entry
            # that grew that round. Each round-robin pass now times the
            # floor and every branch back-to-back — one pass, one host
            # regime — and the per-measurement min is taken across
            # passes. Entries the main loop already measured as noisy
            # (mean/min > 1.5) get extra passes automatically, and the
            # artifact carries an additivity self-check so a diverged
            # decomposition names itself instead of needing forensics.
            col = branch_col[n]
            b_iters = BRANCH_ITERS + (
                2 if means[n] / max(timings[n], 1e-9) > 1.5 else 0)
            floor_label = "__bench_shared_floor__"
            labels = [floor_label] + branch_values[n]
            samples: dict[str, list[float]] = {m: [] for m in labels}

            def _one_pass():
                # purge is safe here: the main df's audit and branch
                # discovery already ran, each pass's frame is dead
                # once its count returns, and the main df's own blocks
                # are protected structurally (final_ids)
                for m in labels:
                    t0 = time.perf_counter()
                    queries[n](spark, SF_DIR).where(
                        f"{col} = '{m}'").count()
                    samples[m].append(
                        round(time.perf_counter() - t0, 3))
                    _reclaim(spark, purge=True, protect=final_ids)

            def _decompose():
                shared = min(samples[floor_label])
                standalone = {m: min(samples[m])
                              for m in branch_values[n]}
                per_branch = {
                    m: round(max(standalone[m] - shared, 0.0), 3)
                    for m in branch_values[n]
                }
                additivity = round(
                    (shared + sum(per_branch.values()))
                    / max(timings[n], 1e-9), 3)
                return shared, standalone, per_branch, additivity

            for _ in range(b_iters):
                _one_pass()
            shared, standalone, per_branch, additivity = _decompose()
            if additivity > 1.2:
                # serialize-variants confirmation pass (round 13,
                # VERDICT r12 #6): an out-of-band additivity claims
                # OVERLAP — branches running concurrently inside the
                # union hide wall-clock behind the slowest one. One
                # extra interleaved pass firms the standalone mins,
                # then the overlap_check below tests the claim: the
                # union's wall-clock must sit between the critical
                # path (slowest standalone branch) and the serialized
                # sum, or the artifact names itself unexplained.
                _one_pass()
                b_iters += 1
                shared, standalone, per_branch, additivity = _decompose()
            slowest = max(standalone.values()) if standalone else 0.0
            serial_sum = round(shared + sum(per_branch.values()), 3)
            if 0.8 <= additivity <= 1.2:
                overlap_verdict = "clean_serial_decomposition"
            elif additivity < 0.8:
                # the union entry costs MORE than its serialized parts:
                # either the passes straddled a host-speed shift, or
                # the all-branches job pays overhead (memory pressure,
                # python-worker churn) the constant-folded branch runs
                # dodge — read branch_raw and the calibration canaries
                overlap_verdict = "sub_additive_entry_overhead_or_host_shift"
            elif (slowest <= timings[n] * 1.1
                    and timings[n] <= serial_sum * 1.1):
                overlap_verdict = "overlap_confirmed"
            else:
                overlap_verdict = "unexplained_check_branch_raw"
            branch_timings[n] = {
                "overlap_check": {
                    "entry_min": timings[n],
                    "slowest_branch_standalone": round(slowest, 3),
                    "serialized_sum": serial_sum,
                    "verdict": overlap_verdict,
                    "semantics": "additivity > 1.2 claims concurrent "
                                 "branches overlap inside the union "
                                 "run; confirmed iff slowest "
                                 "standalone branch <= entry_min <= "
                                 "serialized sum (1.1x tolerance)",
                },
                "shared_setup": shared,
                "branch_minus_shared": per_branch,
                "branch_standalone_min": standalone,
                "branch_raw": samples,
                "iters": b_iters,
                "additivity_vs_entry_min": additivity,
                "semantics": "branch = standalone min minus shared_setup, "
                             "all measured interleaved per pass; "
                             "additivity_vs_entry_min = (shared + "
                             "sum(branches)) / entry_min. ~1.0 = clean "
                             "serial decomposition; >1.2 = branches "
                             "OVERLAP inside the entry run (concurrent "
                             "stages hide behind the slowest branch, so "
                             "the standalone sum double-counts hidden "
                             "wall-clock — the slowest standalone branch "
                             "then approximates the entry's critical "
                             "path); <0.8 = the passes straddled a "
                             "host-speed shift (read branch_raw)",
            }
            print(f"    shared={shared}s branches-minus-shared: "
                  f"{per_branch} (additivity {additivity})",
                  file=sys.stderr, flush=True)

    # second canary AFTER the query loop: this host has been observed
    # degrading MID-RUN (early entries fast, late entries 3×) — a
    # start-only canary would certify a speed the late entries never
    # saw. calib_sec reports the worse of the two passes.
    calib_post = _calibrate(spark)
    calib_post_total = round(sum(calib_post.values()), 3)
    calib_total = max(calib_total, calib_post_total)
    print(f"host calibration (post): {calib_post} "
          f"(total {calib_post_total}s)", file=sys.stderr, flush=True)

    total_min = round(sum(timings.values()), 3)
    total_mean = round(sum(means.values()), 3)
    # per-entry variance gate (VERDICT r10 #5): entries still noisy
    # after the extra-sample guard are NAMED in the compact artifact —
    # a cross-round delta on a flagged entry is host noise until the
    # raw iterations say otherwise
    flagged_noisy = sorted(
        n for n in names
        if timings[n] > 0 and means[n] / timings[n] > 1.5
    )
    # noise indicator for the round-over-round comparison: mean/min per
    # query, worst first — a hot host inflates mean, not min
    spread = sorted(
        ((n, round(means[n] / timings[n], 2)) for n in names if timings[n] > 0),
        key=lambda t: -t[1],
    )
    print(
        f"totals: min={total_min}s mean={total_mean}s; "
        f"noisiest mean/min: {spread[:5]}",
        file=sys.stderr,
        flush=True,
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # the harness that captures this output keeps only the LAST ~2000
    # characters of stdout and parses the final line — every earlier
    # round's line carried raw iterations + plan stats inline and blew
    # past that window (BENCH_r*.json: parsed=null each round). The
    # stdout line is now compact enough to survive the capture; the
    # full evidence (means, raw per-iteration times, executed-plan
    # shuffle/join stats, per-branch decomposition of the multi-branch
    # entries) lands in bench_detail.json next to this script.
    detail = {
        "queries_mean": means,
        # untimed at-SF warm-up durations (VERDICT r14 #7): the cold
        # per-entry cost including one-time per-corpus memo population
        "first_call_sec": first_call,
        "raw_iterations": raw,
        "plan_stats": plans,
        "branch_timings": branch_timings,
        "stream_overhead": stream_overhead,
        "total_mean": total_mean,
        "n_iters": N_ITERS,
        "sf": sf_val,
        "flagged_noisy": flagged_noisy,
        "host_calibration": calib,
        "host_calibration_post": calib_post,
    }
    detail_path = Path(__file__).resolve().parent / "bench_detail.json"
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(f"detail (means/raw/plans/branches) -> {detail_path}",
          file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total_min,
                "unit": "sec",
                "queries": timings,
                "total_mean": total_mean,
                "n_iters": N_ITERS,
                "sf": sf_val,
                # entries whose mean/min > 1.5 even after extra
                # samples: discount these in cross-round comparison
                "flagged_noisy": flagged_noisy,
                # host-speed canary (fixed synthetic workloads, no
                # engine code): healthy host ≈ 1-1.5 s — see _calibrate
                "calib_sec": calib_total,
                # the CROSS-ROUND comparable headline (VERDICT r8 #1):
                # raw total divided by the canary, so a degraded VM
                # (r8: canary 1.57→3.99 s mid-run, phantom "60%
                # regression" at face value) reads true. Compare
                # value_norm round-over-round; `value` stays the raw
                # wall total for same-host absolute throughput.
                "value_norm": round(total_min / max(calib_total, 1.0), 3),
                # normalization validity band (round 14, VERDICT r13
                # what's-wrong #3): value_norm assumes engine time
                # scales 1:1 with canary time, which holds near the
                # healthy band and OVERcorrects far outside it. Only
                # compare value_norm across rounds when both rounds
                # are calib_band != "severe" (calib <= ~2x healthy).
                "calib_band": (
                    "healthy" if calib_total <= 1.6
                    else "degraded" if calib_total <= 3.0
                    else "severe"),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count).
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


def main() -> None:
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="pqstream_bench")
    queries, _ = build_catalog()

    names = [n for n in HEADLINE if n in queries]

    # warm up EVERY query shape at the smallest SF: whole-stage-codegen
    # compiles per plan shape, and first execution of a shape measures
    # the Janino compiler, not the engine
    for n in names:
        queries[n](spark, WARMUP_DIR).count()

    # best-of-2 at the target SF: steady-state throughput, insulated
    # from one-off GC pauses on the shared host
    timings: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[n](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 3)
        print(f"  {n}: {timings[n]}s", file=sys.stderr, flush=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Round-14 measurement harness (guide §1): per-entry split of
BUILD time (the python builder — eager collects, codebook training,
checkpoint materialization, SQL analysis) vs ACTION time (noop-sink
execution of the returned DataFrame, guide §1.4), plus a count()
action for comparability with bench.py's timed region.

Usage: python tools/profile_entries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ONLY = sys.argv[2:]

DEFAULT = [
    "dedup_pairwise_scores",
    "sim_ann_lsh_quantized",
    "dedup_pipeline_corpus",
    "sim_topk_brute_ivf",
    "dedup_minhash_lsh",
    "stream_changelog_pipeline",
    "dedup_exact",
    "text_annotations",
    "q18_large_volume_in_having",
    "cdc_materialize_state",
]


def main() -> None:
    from pqstream_spark.queries import build_catalog
    from pqstream_spark.session import get_spark

    spark = get_spark(app_name="profile_entries")
    queries, _ = build_catalog()
    names = ONLY or DEFAULT
    names = [n for n in names if n in queries]

    # warm the JVM/codegen once at the smallest SF
    for n in names:
        queries[n](spark, "/root/testdata/sf0.001").count()

    import gc

    for n in names:
        # discarded at-SF warmup, same as bench.py
        queries[n](spark, SF_DIR).count()
        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        for it in range(2):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{n}: build")
            df = queries[n](spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{n}: noop action")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{n}: count action")
            df.count()
            t3 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            print(
                f"{n} iter{it}: build={t1 - t0:6.3f}s "
                f"noop={t2 - t1:6.3f}s count={t3 - t2:6.3f}s "
                f"total(build+count)={t1 - t0 + t3 - t2:6.3f}s",
                flush=True,
            )
            gc.collect()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001


if __name__ == "__main__":
    main()

"""Bootstrap (initial-snapshot) throughput through the sharded
`pqstream_logical` DataSource — the round-14 measurement VERDICT r13
ask #6 requested: rows/s for the SAME populated database consumed as

  (a) one unbounded first micro-batch (maxChangesPerBatch=0), vs
  (b) a sequence of bounded micro-batches (maxChangesPerBatch=N/8)
      with durable mid-snapshot checkpoint progress.

The interesting question is the COST of the bounded mode's incremental
progress (per-batch planning, per-chunk commit, consumed.json fsyncs):
at 100 TB the unbounded mode is not an option at all (one task, no
checkpoint progress, restart loses everything), so the bounded mode's
throughput is the real bootstrap number and the delta is what you pay
for restartability.

Usage: python tools/bench_bootstrap.py   # one JSON line on stdout
Env: BOOT_BENCH_ROWS (default 40000 total), BOOT_BENCH_SHARDS (4).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ROWS = int(os.environ.get("BOOT_BENCH_ROWS", "40000"))
N_SHARDS = int(os.environ.get("BOOT_BENCH_SHARDS", "4"))
N_TABLES = 8


def run() -> dict:
    from pqstream_spark.session import get_spark
    from pqstream_spark.sources.logical_datasource import LogicalDataSource
    from pqstream_spark.sources.outbox_pg import EphemeralPostgres

    spark = get_spark("bench_bootstrap")
    spark.dataSource.register(LogicalDataSource)
    srv = EphemeralPostgres.temp("pq_bootbench_")
    srv.initdb()
    srv.start()
    out: dict = {"metric": "bootstrap_throughput", "rows": N_ROWS,
                 "shards": N_SHARDS}
    try:
        r = srv.createdb("boot")
        per = N_ROWS // N_TABLES
        for t in range(N_TABLES):
            r.sql(
                f"CREATE TABLE tb{t} (id serial PRIMARY KEY, "
                "body text);"
                f"INSERT INTO tb{t} (body) SELECT 'r' || g || '-' || "
                f"repeat('x', 64) FROM generate_series(1, {per}) g;")

        def boot_drain(name: str, cap: int) -> dict:
            batches: list[int] = []

            def sink(df, epoch_id: int) -> None:
                batches.append(df.count())

            ckpt = tempfile.mkdtemp(prefix=f"pq_bb_{name}_ckpt_")
            t0 = time.time()
            q = (spark.readStream.format("pqstream_logical")
                 .option("url", "postgres:" + srv.conninfo("boot"))
                 .option("shards", str(N_SHARDS))
                 .option("slot", f"bb_{name}")
                 .option("publication", f"bb_pub_{name}")
                 .option("consumer", f"bb_{name}")
                 .option("tableRegexp", "tb.*")
                 .option("bootstrap", "true")
                 .option("maxChangesPerBatch", str(cap))
                 .option("spillDir",
                         tempfile.mkdtemp(prefix=f"pq_bb_{name}_sp_"))
                 .load()
                 .writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt).start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            dt = time.time() - t0
            n = sum(batches)
            assert n >= N_ROWS, (name, n, batches)
            return {"sec": round(dt, 2),
                    "rows_per_s": round(n / dt),
                    "batches": len([b for b in batches if b]),
                    "max_changes_per_batch": cap}

        out["unbounded"] = boot_drain("unb", 0)
        out["bounded"] = boot_drain("bnd", max(1, N_ROWS // 8))
        out["bounded_vs_unbounded_x"] = round(
            out["bounded"]["rows_per_s"]
            / max(1, out["unbounded"]["rows_per_s"]), 2)
    finally:
        srv.destroy()
    return out


if __name__ == "__main__":
    print(json.dumps(run(), separators=(",", ":")))

"""Wire fan-out throughput: events/sec from parquet through the full
handled pipeline (parse → redact → merge-patch) and the Dispatcher to
N concurrent HTTP NDJSON subscribers.

The reference's server.go:291 TODO reads "will likely buffer after
benchmarking" — the benchmarking never happened, so there is no
reference number to match; this harness produces the engine's own.
(Slow-client ISOLATION is proven separately, in
tests/test_hol_buffer.py and tests/test_wire_http.py, with
server-side slow callbacks — a client that merely reads slowly is
absorbed by kernel socket buffers and does not exercise the loop.)

Usage: python bench_wire.py   # one JSON line on stdout
"""

from __future__ import annotations

import http.client
import json
import os
import shutil
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_EVENTS = int(os.environ.get("WIRE_BENCH_EVENTS", "10000"))
N_SUBS = int(os.environ.get("WIRE_BENCH_SUBS", "4"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _reader(host: str, port: int, out: dict, key: str) -> None:
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("GET", "/listen?tables=.*&policy=block&buffer=4096")
    resp = conn.getresponse()
    n = 0
    t0 = time.perf_counter()
    try:
        while n < N_EVENTS:
            if not resp.fp.readline():
                break
            n += 1
    finally:
        out[key] = {"events": n, "sec": round(time.perf_counter() - t0, 3)}
        conn.close()


def run() -> dict:
    from pqstream_spark.pipeline import handle_events
    from pqstream_spark.session import get_spark
    from pqstream_spark.streaming.source import stream_changelog
    from pqstream_spark.streaming.subscribe import Dispatcher
    from pqstream_spark.streaming.wire_http import WireServer

    spark = get_spark("bench_wire")
    tmp = tempfile.mkdtemp(prefix="wire_bench_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    stage = os.path.join(tmp, "stage")
    (ev.orderBy("event_id").limit(N_EVENTS).coalesce(1)
     .write.mode("overwrite").parquet(stage))
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]

    disp = Dispatcher(
        handle_events(stream_changelog(spark, src), typed_wire=True)
    )
    srv = WireServer(disp, port=0)
    srv.start_background()
    q = disp.start()
    host, port = srv.server_address[:2]
    results: dict = {}
    threads = []
    try:
        for i in range(N_SUBS):
            t = threading.Thread(
                target=_reader, args=(host, port, results, f"sub{i}"),
                daemon=True,
            )
            t.start()
            threads.append(t)
        time.sleep(1.5)  # subscriptions land before events flow
        shutil.copy(os.path.join(stage, part), os.path.join(src, "b1.parquet"))
        for t in threads:
            t.join(timeout=300)
    finally:
        disp.stop()
        srv.stop()
        if q.isActive:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    subs = list(results.values())
    slowest = max(v["sec"] for v in subs)
    return {
        "per_sub_events_per_sec": round(N_EVENTS / slowest),
        "total_deliveries_per_sec": round(
            sum(v["events"] for v in subs) / slowest
        ),
        "slowest_sub_sec": slowest,
        "events_each": sorted(v["events"] for v in subs),
        "dispatched": disp.dispatched,
    }


def main() -> None:
    run()  # warm-up: JVM, codegen, stream machinery
    out = {"n_events": N_EVENTS, "n_subs": N_SUBS, "sf_dir": SF_DIR}
    out.update(run())
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()

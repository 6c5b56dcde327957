"""Head-of-line blocking fix (the reference's own unshipped TODO,
/root/reference/server.go:291): a subscriber may opt into a bounded
per-subscriber buffer so a slow consumer no longer stalls the shared
fan-out loop. Policies: block (lossless, bounded slack), drop-oldest
(lossy tail, never stalls), disconnect-slow (protect the loop by
dropping the subscriber)."""

from __future__ import annotations

import os
import re
import shutil
import threading
import time

import pytest

from pqstream_spark.streaming.source import stream_changelog
from pqstream_spark.streaming.subscribe import Dispatcher, _Subscriber


@pytest.fixture()
def disp(spark, tmp_path):
    src = str(tmp_path / "hol_src")
    os.makedirs(src)
    d = Dispatcher(stream_changelog(spark, src))
    started: dict = {}

    def start():
        started["q"] = d.start()
        return d

    try:
        yield src, d, start
    finally:
        d.stop()
        q = started.get("q")
        if q is not None and q.isActive:
            q.stop()


def _drop_events(spark, tmp_path, src, n=60, name="b1"):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stage = str(tmp_path / ("hol_stage_" + name))
    ev.orderBy("event_id").limit(n).coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(stage, part), os.path.join(src, name + ".parquet"))


def _wait(pred, timeout=90, step=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(step)
    return pred()


def test_slow_buffered_subscriber_does_not_stall_fast(spark, tmp_path, disp):
    """One deliberately slow subscriber (50 ms/row, drop-oldest buffer)
    must not delay a fast subscriber's delivery: the fast one receives
    the whole micro-batch while the slow one is still far behind —
    under the reference's inline semantics both would finish together."""
    src, d, start = disp
    fast: list = []
    slow_seen = []
    lock = threading.Lock()

    def fast_cb(row):
        fast.append(row["seq"])
        return True

    def slow_cb(row):
        time.sleep(0.25)  # 4 rows/s: even a slow host can't clear 60 rows
        with lock:
            slow_seen.append(row["seq"])
        return True

    d.subscribe("fast", ".*", fast_cb)  # inline, reference semantics
    d.subscribe("slow", ".*", slow_cb, policy="drop-oldest", capacity=4)
    start()
    _drop_events(spark, tmp_path, src, n=60)

    assert _wait(lambda: len(fast) >= 60), "fast subscriber starved"
    with lock:
        slow_at_fast_done = len(slow_seen)
    # inline semantics would force slow to have processed ~everything
    # (minus the 4-slot slack) before fast could finish the batch
    assert slow_at_fast_done < 55, (
        f"slow consumer had processed {slow_at_fast_done}/60 rows when the "
        "fast one finished — fan-out is still head-of-line blocked"
    )
    assert fast == sorted(fast), "fast delivery lost seq order"
    assert _wait(lambda: d.dropped("slow") > 0, timeout=30), (
        "drop-oldest never evicted despite a 4-slot buffer and a flooded batch"
    )


def test_block_policy_is_lossless_and_ordered(spark, tmp_path, disp):
    src, d, start = disp
    got: list = []

    def cb(row):
        time.sleep(0.005)
        got.append(row["seq"])
        return True

    d.subscribe("s", ".*", cb, policy="block", capacity=8)
    start()
    _drop_events(spark, tmp_path, src, n=60)
    assert _wait(lambda: len(got) >= 60), "block policy lost rows"
    assert got == sorted(got)
    assert d.dropped("s") == 0


def test_disconnect_slow_policy_removes_subscriber(spark, tmp_path, disp):
    """disconnect-slow: a stalled subscriber is removed on overflow; the
    fast subscriber's delivery is untouched."""
    src, d, start = disp
    fast: list = []
    stall = threading.Event()

    def fast_cb(row):
        fast.append(row["seq"])
        return True

    def stalled_cb(row):
        stall.wait(120)  # simulates a client that never drains
        return True

    d.subscribe("fast", ".*", fast_cb)
    d.subscribe("stalled", ".*", stalled_cb, policy="disconnect-slow", capacity=2)
    start()
    _drop_events(spark, tmp_path, src, n=60)
    assert _wait(lambda: len(fast) >= 60), "fast subscriber starved"
    assert _wait(lambda: "stalled" not in d.subscribers(), timeout=30), (
        "overflowing disconnect-slow subscriber was never removed"
    )
    assert not d.is_active("stalled")
    stall.set()  # release the worker thread


def test_cb_false_unsubscribes_buffered_worker():
    """The cb-returns-False contract (subscription.fn parity) holds on
    the worker path too: the subscriber goes dead and offer() reports
    it for removal."""
    sub = _Subscriber("s", re.compile(".*"), lambda row: False,
                      policy="block", capacity=4)
    assert sub.offer({"seq": 1})
    assert _wait(lambda: sub.dead.is_set(), timeout=10)
    assert not sub.offer({"seq": 2})
    sub.close()
    sub.join()


def test_unknown_policy_rejected():
    with pytest.raises(ValueError, match="unknown buffer policy"):
        _Subscriber("s", None, lambda r: True, policy="buffer-harder", capacity=4)

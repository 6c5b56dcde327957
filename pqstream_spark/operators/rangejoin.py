"""Range (interval) join — bucketized so it scales.

A naive `l.ts BETWEEN r.ts AND r.ts + d` with no equi key is a cross
join with a filter — O(L×R) and a broadcast-nested-loop plan that dies
at scale. Bucketizing the time axis by the window duration turns it
into an equi-join: a right row at time t can only match left rows in
bucket(t) or bucket(t)+1, so we explode the right side ×2 on bucket id
and equi-join on the bucket — shuffle-hash/sort-merge joinable,
partition-pruned, AQE-skew-splittable. The residual range predicate is
applied post-join.

Cost: 2× duplication of the (smaller) right side vs O(L×R) — the
standard interval-bucketing trade. Spark's own range-join hints exist
only in Databricks runtime; this composition is the OSS-portable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    duration_seconds: int,
    key: str | None = None,
) -> DataFrame:
    """Pairs where right_time <= left_time < right_time + duration.

    Optional `key` adds an equi condition (joined on (key, bucket));
    without it the bucket alone is the join key.
    """
    dur_us = int(duration_seconds) * 1_000_000
    # integer div — double division would lose precision at micros scale
    l_bucket = F.expr(f"unix_micros({left_time}) div {dur_us}")
    r_bucket = F.expr(f"unix_micros({right_time}) div {dur_us}")

    lhs = left.withColumn("_b", l_bucket)
    rhs = right.withColumn(
        "_b", F.explode(F.array(r_bucket, r_bucket + F.lit(1)))
    )

    on = [lhs["_b"] == rhs["_b"]]
    if key:
        on.append(lhs[key] == rhs[key])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c

    residual = (F.unix_micros(lhs[left_time]) >= F.unix_micros(rhs[right_time])) & (
        F.unix_micros(lhs[left_time]) < F.unix_micros(rhs[right_time]) + F.lit(dur_us)
    )
    joined = lhs.join(rhs, cond & residual, "inner")
    drop = [lhs["_b"], rhs["_b"]]
    out = joined
    for c in drop:
        out = out.drop(c)
    return out

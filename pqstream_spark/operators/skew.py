"""Skew handling: salted aggregation and salted broadcast-side join.

At 100 TB a handful of hot keys (one viral user_id, one boilerplate
document) can put an entire shuffle partition on one executor. AQE's
skew-join splitting covers sort-merge joins; these operators cover the
two cases it doesn't:

- `salted_aggregate`: two-phase aggregation — phase 1 groups on
  (key, salt) so a hot key spreads over `salt` reducers, phase 2 merges
  the partials. Only works for decomposable aggregates (sum/count/
  min/max), which is exactly what the phase split expresses.
- `salted_join`: replicate the small side `salt` times so the big
  side's hot key spreads across (key, salt) pairs. Useful when the
  small side is too big to broadcast and the big side is skewed.

Salt is deterministic (xxhash64 of the row's unique columns, mod N) so
results are reproducible and tests can compare against the unsalted
plan exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECOMPOSE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over skewed group keys.

    aggs: list of (column, fn, out_alias) with fn in sum/count/min/max.
    salt_from: columns whose hash spreads the hot key (default: all
    non-key columns' first; any row-varying column works)."""
    for _, fn, _ in aggs:
        if fn not in _DECOMPOSE:
            raise ValueError(f"{fn} is not decomposable; use plain groupBy")
    spread_cols = salt_from or [c for c in df.columns if c not in keys][:1]
    if not spread_cols:
        raise ValueError("need at least one non-key column to salt on")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in spread_cols]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DECOMPOSE[fn][0](col).alias(f"_p_{alias}")
            for col, fn, alias in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSE[fn][1](f"_p_{alias}").alias(alias)
            for _, fn, alias in aggs
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Spread a skewed big-side key over `salt` partitions by
    replicating the small side. Join key becomes (key, salt_id)."""
    non_key = [c for c in big.columns if c != key][:1]
    if not non_key:
        raise ValueError("big side needs a non-key column to salt on")
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def salt_column(spread: Column | str, salt: int) -> Column:
    """Expose the salt derivation for custom pipelines."""
    c = F.col(spread) if isinstance(spread, str) else spread
    return F.pmod(F.xxhash64(c), F.lit(salt))

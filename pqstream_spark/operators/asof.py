"""As-of join — an operator the reference lacks and Spark has no native
form of (SURVEY.md §2.2); built as a composition of built-in ops.

Strategy (the scalable merge-style formulation, not a cross join):
union both sides tagged, sort within key by (time, side, tiebreak),
and carry the right side's values forward with last(..., ignorenulls).
One shuffle on the key — the same cost as any equi-join on that key —
and no O(L×R) candidate explosion, so it survives 100× scale-up.
Skewed keys behave like any skewed aggregation (AQE skew handling /
salting applies).

Semantics: for each left row, attach `value_cols` from the right row
with the greatest (right_time, tiebreak) such that right_time <=
left_time, per key. Right rows at exactly left_time DO match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    filled_names = [f"asof_{c}" for c in value_cols]

    rt = F.col(right_time)
    # the value columns ride in ONE struct, so (a) every value comes from
    # the SAME most-recent right row (per-column forward-fill could mix
    # rows when the latest right row holds a legitimate NULL), and (b)
    # struct non-null IS the match marker — a matched right row whose
    # value columns are all NULL is still a match for how='inner'
    right_part = right.select(
        F.col(key).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tie"),
        F.struct(
            *[F.col(c).alias(n) for c, n in zip(value_cols, filled_names)]
        ).alias("_vals"),
    )
    left_part = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right_part.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(right_part.schema["_vals"].dataType).alias("_vals"),
        *[F.col(c) for c in left.columns],
    )
    # right rows lacking the left columns
    right_full = right_part.select(
        "*", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns]
    )

    unioned = left_part.unionByName(right_full)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.last("_vals", ignorenulls=True).over(w).alias("_vals"),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col("_vals").isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_vals.{n}").alias(n) for n in filled_names],
    )

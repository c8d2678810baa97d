"""As-of (temporal) join — a time-series operator the reference lacks
(SURVEY.md §2.2 notes as-of/range joins are absent in datafusion-ray); a
training-data/event pipeline needs it constantly (attach the latest state
snapshot to each event).

Spark-first design: **union + one window pass**, not a range self-join.

A naive formulation (``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + argmax)
explodes to O(|l|·|r|) rows per key before the argmax prunes them. Instead,
both sides are tagged and unioned, sorted once per key by (ts, side), and the
match is ``last(right_value, ignorenulls=True)`` over an unbounded-preceding
window. Cost: ONE shuffle on the key, then a linear within-partition scan —
the same sort-merge strategy DuckDB's native ASOF JOIN uses, and exactly the
plan shape that survives 100 TB (no pair blow-up, no skew amplification;
shuffle volume = |l| + |r| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row with
    ``r.ts <= l.ts`` in the same ``by`` group (NULLs when none exists).

    Right payload columns arrive as ``{prefix}{col}`` plus ``{prefix}ts``.
    Equal timestamps count as "already happened" (right sorts before left at
    the same instant), matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
    """
    r_tagged = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    l_tagged = left.withColumn("_side", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in ("ts", *right_cols)
        ],
    )
    out_cols = [c for c in left.columns]
    return (
        matched.where(F.col("_side") == 1)
        .select(
            *out_cols,
            *[F.col(f"_m_{c}").alias(f"{prefix}{c}") for c in ("ts", *right_cols)],
        )
    )

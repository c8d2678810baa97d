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

from ..sources.tables import epoch_us, ts_to_utc


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "r_",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row in the same
    ``by`` group (NULLs when none exists) — pandas ``merge_asof`` surface.

    - ``direction="backward"`` (default): most recent right with
      ``r.ts <= l.ts``; equal timestamps count as "already happened"
      (right sorts before left at the same instant), matching DuckDB's
      ``ASOF JOIN ... ON l.ts >= r.ts``.
    - ``direction="forward"``: earliest right with ``r.ts >= l.ts`` (equal
      ts matches, same as pandas).
    - ``tolerance_seconds``: a found match farther than this from ``l.ts``
      is nulled out (pandas ``tolerance=``). A pure post-projection — the
      plan is unchanged, still ONE shuffle and one window pass. For
      timestamp columns the unit is seconds; for a numeric ts column the
      value is compared in the column's own units (pandas int-tolerance
      semantics).

    Right payload columns arrive as ``{prefix}{col}`` plus ``{prefix}ts``.
    Only TIMESTAMP_NTZ inputs are normalized (the round-2 regression
    shape); numeric ts columns pass through untouched — ordering and
    differencing are already well-defined on them.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if dict(left.dtypes).get(ts_col) == "timestamp_ntz":
        left = ts_to_utc(left, ts_col)
    if dict(right.dtypes).get(ts_col) == "timestamp_ntz":
        right = ts_to_utc(right, ts_col)
    if direction == "nearest":
        return _asof_nearest(
            left, right, by, ts_col, right_cols, prefix, tolerance_seconds
        )
    # Side tags order rows at EQUAL timestamps so the window sees the
    # right row: backward scans [start, current] (right must sort first),
    # forward scans [current, end] (right must sort after the left row).
    r_side = 0 if direction == "backward" else 2
    r_tagged = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(r_side).alias("_side"),
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    l_tagged = left.withColumn("_side", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    base = Window.partitionBy(by).orderBy(ts_col, "_side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    matched = unioned.select(
        "*",
        *[
            pick(f"{prefix}{c}").over(w).alias(f"_m_{c}")
            for c in ("ts", *right_cols)
        ],
    )
    out_cols = [c for c in left.columns]
    m = matched.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        if dict(m.dtypes).get(ts_col, "").startswith("timestamp"):
            lus, mus = epoch_us(m, ts_col), F.unix_micros(F.col("_m_ts"))
            tol_units = tolerance_seconds * 1_000_000
        else:  # numeric ts: tolerance in the column's own units
            lus, mus = F.col(ts_col), F.col("_m_ts")
            tol_units = tolerance_seconds
        diff = (lus - mus) if direction == "backward" else (mus - lus)
        ok = F.col("_m_ts").isNull() | (diff <= tol_units)
        picked = [
            F.when(ok, F.col(f"_m_{c}")).alias(f"{prefix}{c}")
            for c in ("ts", *right_cols)
        ]
    else:
        picked = [
            F.col(f"_m_{c}").alias(f"{prefix}{c}") for c in ("ts", *right_cols)
        ]
    return m.select(*out_cols, *picked)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple[str, ...],
    prefix: str,
    tolerance_seconds: int | None,
) -> DataFrame:
    """Nearest-direction as-of: the closer of the backward and forward
    candidates, ties to backward (pandas ``merge_asof(direction='nearest')``
    semantics). With a tolerance, each direction's candidate is nulled
    FIRST and the choice runs over the survivors — so a too-far backward
    match still falls through to an in-range forward one.

    Plan shape: the SAME single union + one shuffle as the directional
    paths — both the backward pick (``last`` over the preceding frame) and
    the forward pick (``first`` over the following frame) share one window
    partitioning/ordering, so Spark sorts once and scans twice within the
    partition. No extra shuffle versus a one-direction as-of.
    """
    # side=0: right rows sort BEFORE an equal-ts left row, so the backward
    # frame sees equal-ts matches (distance 0, which also wins any tie) and
    # the forward frame doesn't double-offer them.
    r_tagged = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    l_tagged = left.withColumn("_side", F.lit(1))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    base = Window.partitionBy(by).orderBy(ts_col, "_side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    payload = ("ts", *right_cols)
    matched = unioned.select(
        "*",
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(wb).alias(f"_b_{c}") for c in payload],
        *[F.first(f"{prefix}{c}", ignorenulls=True).over(wf).alias(f"_f_{c}") for c in payload],
    ).where(F.col("_side") == 1)

    if dict(matched.dtypes).get(ts_col, "").startswith("timestamp"):
        lus = epoch_us(matched, ts_col)
        bus, fus = F.unix_micros(F.col("_b_ts")), F.unix_micros(F.col("_f_ts"))
        tol = None if tolerance_seconds is None else tolerance_seconds * 1_000_000
    else:
        lus = F.col(ts_col)
        bus, fus = F.col("_b_ts"), F.col("_f_ts")
        tol = tolerance_seconds
    b_ok = F.col("_b_ts").isNotNull() & (
        F.lit(True) if tol is None else ((lus - bus) <= tol)
    )
    f_ok = F.col("_f_ts").isNotNull() & (
        F.lit(True) if tol is None else ((fus - lus) <= tol)
    )
    use_b = b_ok & (~f_ok | ((lus - bus) <= (fus - lus)))
    picked = [
        F.when(use_b, F.col(f"_b_{c}"))
        .when(f_ok, F.col(f"_f_{c}"))
        .alias(f"{prefix}{c}")
        for c in payload
    ]
    return matched.select(*left.columns, *picked)

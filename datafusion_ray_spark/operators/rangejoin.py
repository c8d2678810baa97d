"""Range (interval) join — the second temporal-join operator the reference
lacks (SURVEY.md §2.2: as-of/range/interval joins absent in datafusion-ray).

Spark-first design: **time-bucketized equi-join**, not a raw non-equi join.

A raw ``l JOIN r ON key AND r.ts BETWEEN l.ts - w AND l.ts`` plans as a
broadcast-nested-loop join (Spark has no native band join): O(|l|·|r|) per
key and a driver-killing broadcast at scale. Bucketizing turns it into a
plain hash equi-join: each right row is duplicated into the two
``w``-wide buckets it can influence, the join key becomes (key, bucket), and
the exact range predicate survives as a cheap residual filter. Shuffle
volume is 2·|r| + |l| rows — linear, skew-handled by AQE like any other
equi-join. (Each (l, r) pair meets exactly once: only the right copy whose
bucket equals l's bucket joins, so no double counting.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import epoch_us


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    window_minutes: int = 10,
    count_alias: str = "n_recent",
) -> DataFrame:
    """For each left row, count right rows of the same ``by`` key with
    ``l.ts - window <= r.ts < l.ts`` (strictly before the left event).

    Returns all left columns plus ``count_alias`` (0 when none match).
    """
    w_us = window_minutes * 60 * 1_000_000
    # epoch_us handles TIMESTAMP / TIMESTAMP_NTZ / raw-nanos inputs alike
    # (the round-2 regression: unix_micros rejects NTZ outright).
    l = left.withColumn("_lus", epoch_us(left, ts_col)).withColumn(
        "_b", F.floor(F.col("_lus") / w_us)
    )
    r = (
        right.select(
            F.col(by).alias("_rk"),
            epoch_us(right, ts_col).alias("_rts"),
        )
        .withColumn("_b0", F.floor(F.col("_rts") / w_us))
        # a right row in bucket b can precede left rows in buckets b and b+1
        .withColumn("_b", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
    )
    lts = l["_lus"]
    cond = (
        (l[by] == r["_rk"])
        & (l["_b"] == r["_b"])
        & (r["_rts"] >= lts - w_us)
        & (r["_rts"] < lts)
    )
    joined = l.join(r, cond, "left")
    return joined.groupBy(*[l[c] for c in left.columns]).agg(
        F.count(r["_rts"]).cast("long").alias(count_alias)
    )

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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    left_minutes: int = 360,
    right_minutes: int = 180,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Interval-overlap join: each side's rows become closed intervals
    ``[ts, ts + duration]``; emit one row per overlapping (left, right)
    pair of the same ``by`` key with the overlap length in whole seconds.

    Spark-first design — the same bucketization trick as
    :func:`range_join_count`, generalized to interval×interval. A raw
    overlap predicate (``l.s <= r.e AND r.s <= l.e``) plans as a
    broadcast-nested-loop join. Instead each interval is exploded into
    every bucket of width ``w = max(left_minutes, right_minutes)`` that it
    touches (at most 2 buckets per side, since interval length <= w), the
    join becomes a hash equi-join on ``(key, bucket)``, and the exact
    overlap predicate survives as a residual filter. Exactly-once pairing:
    a qualifying pair is kept only in the bucket containing the overlap's
    start (``floor(max(l.s, r.s) / w)``) — both sides provably cover that
    bucket, and no other bucket passes the keep test. Shuffle volume
    <= 2|l| + 2|r| rows, linear; AQE handles key skew like any equi-join.

    Output: ``l_<left_id>``, ``r_<right_id>``, ``overlap_s`` (bigint,
    truncated seconds of ``min(l.e, r.e) - max(l.s, r.s)``).
    """
    w_us = max(left_minutes, right_minutes) * 60 * 1_000_000

    def prep(df: DataFrame, dur_min: int, idc: str, tag: str) -> DataFrame:
        s = epoch_us(df, ts_col)
        e = s + dur_min * 60 * 1_000_000
        return (
            df.select(
                F.col(by).alias(f"{tag}k"),
                F.col(idc).alias(f"{tag}id"),
                s.alias(f"{tag}s"),
                e.alias(f"{tag}e"),
            )
            # a length<=w interval touches floor(s/w) .. floor(e/w): <=2 buckets
            .withColumn(
                "_b",
                F.explode(
                    F.sequence(
                        F.floor(F.col(f"{tag}s") / w_us),
                        F.floor(F.col(f"{tag}e") / w_us),
                    )
                ),
            )
        )

    l = prep(left, left_minutes, left_id, "_l")
    r = prep(right, right_minutes, right_id, "_r")
    ov_start = F.greatest(F.col("_ls"), F.col("_rs"))
    pairs = (
        l.join(
            r,
            (F.col("_lk") == F.col("_rk")) & (l["_b"] == r["_b"]),
        )
        .where(
            (F.col("_ls") <= F.col("_re"))
            & (F.col("_rs") <= F.col("_le"))
            # exactly-once: only the bucket holding the overlap start emits
            & (l["_b"] == F.floor(ov_start / w_us))
        )
        .select(
            F.col("_lid").alias(f"l_{left_id}"),
            F.col("_rid").alias(f"r_{right_id}"),
            # integer floor-division keeps the value hash-certifiable
            F.expr("(least(_le, _re) - greatest(_ls, _rs)) DIV 1000000")
            .cast("long")
            .alias("overlap_s"),
        )
    )
    return pairs

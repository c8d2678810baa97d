"""Time-windowed aggregation operators over the ``events`` table.

The reference has NO streaming semantics (SURVEY.md §2.5 — its "streaming"
is pipelined batch execution), so these are driver extensions: the windowed
shapes a time-series/event pipeline needs, expressed with Spark's native
window machinery (``F.window`` / ``F.session_window``) which works
identically over batch DataFrames and Structured Streaming sources (the
streaming variants live in streaming/structured.py).

Scale: every operator here is a single hash-shuffle on (window, key) with
map-side partial aggregation; window assignment is a projection, so the
plans are exactly as scalable as a plain groupBy.

Window starts/ends are projected as epoch seconds/micros (BIGINT) so the
oracle comparison is timezone-metadata-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import ts_to_utc

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _dsum(col: str, alias: str) -> F.Column:
    return F.sum(F.col(col).cast("decimal(25,6)")).cast("double").alias(alias)


def tumbling_agg(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + sums per event_type."""
    df = ts_to_utc(df, "ts")
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), _dsum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(df: DataFrame, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding-window (hopping) counts: each event lands in width/slide
    overlapping windows."""
    df = ts_to_utc(df, "ts")
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").cast("long").alias("n"), _dsum("value", "sum_value"))
        .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"), "n", "sum_value")
    )


def session_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events merge while consecutive gaps are
    below ``gap``; session end = last event + gap (Spark semantics).

    Input ts is normalized first (round-2 regression: ``unix_micros`` on the
    NTZ ``w.start`` Spark derives from an NTZ input column is a type error).
    """
    df = ts_to_utc(df, "ts")
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"), _dsum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def daily_type_pivot(df: DataFrame) -> DataFrame:
    """Daily event-type count matrix (groupBy().pivot() — Spark plans the
    same partial/final agg as a manual CASE fan-out)."""
    df = ts_to_utc(df, "ts")
    return (
        df.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


TUMBLING_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY bucket_start, event_type
"""

SLIDING_ORACLE = """
WITH off AS (SELECT unnest([0, 15, 30, 45]) AS m),
assigned AS (
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP) - to_minutes(m)) + to_minutes(m) AS w,
           value
    FROM events CROSS JOIN off
)
SELECT CAST(epoch(w) AS BIGINT) AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY 1
ORDER BY bucket_start
"""

SESSION_ORACLE = """
WITH o AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
           CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                  OR CAST(ts AS TIMESTAMP) >= LAG(CAST(ts AS TIMESTAMP)) OVER w + INTERVAL '30' MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM o
)
SELECT user_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
       CAST(epoch_us(MAX(ts) + INTERVAL '30' MINUTE) AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""

PIVOT_ORACLE = """
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY 1
ORDER BY day
"""


def resample_fill(df: DataFrame, width_seconds: int = 3600) -> DataFrame:
    """Gap-filled resampling: per-event_type counts on a fixed grid with
    ZERO rows for empty buckets — the time-series `resample().fillna(0)`
    shape dashboards and feature pipelines need (a plain groupBy silently
    drops empty buckets).

    Spark-first: the dense time spine is `sequence(min, max, step)` exploded
    from a one-row global bounds aggregate crossed with the distinct type
    list, then a left join against the bucketed counts. Scale: the spine is
    O(time-range / width) rows regardless of event volume, the counts side
    is already aggregated (bounded by the same grid), so the final join is
    grid-sized — event rows are touched exactly once, in the first
    map-side-combinable groupBy.
    """
    df = ts_to_utc(df, "ts")
    bucket = (F.floor(F.unix_timestamp("ts") / width_seconds) * width_seconds).cast(
        "long"
    )
    counts = (
        df.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        # Pinned (r11, guide §5 — the graph_triangles precedent): the
        # grid-sized counts table feeds THREE plan legs (bounds, the
        # distinct type list, the fill join) whose differing projections
        # defeat exchange reuse, so each leg re-planned the corpus scan +
        # groupBy. Bounded by construction (time-range/width x types);
        # lazy, so plan-only tooling never runs the scan.
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.lit(int(width_seconds)).cast("long"))
        ).alias("bucket_start")
    )
    # Distinct types off the aggregated counts, not the raw events (r11,
    # guide §2.3): same value set by construction (every type in events
    # appears in its bucket counts), but grid-sized input instead of a
    # second corpus scan + corpus-wide distinct shuffle.
    types = counts.select("event_type").distinct()
    grid = spine.crossJoin(types)
    return (
        grid.join(counts, ["bucket_start", "event_type"], "left")
        .na.fill({"n": 0})
        .select("bucket_start", "event_type", "n")
    )


RESAMPLE_ORACLE = """
WITH c AS (
    -- epoch_us // 1e6 floors like Spark's unix_timestamp; CAST(epoch(..))
    -- would ROUND and shift sub-second events across hour boundaries
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600) * 3600 AS bucket_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bucket_start) AS lo, MAX(bucket_start) AS hi FROM c),
spine AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS bucket_start FROM bounds),
types AS (SELECT DISTINCT event_type FROM events)
SELECT s.bucket_start, t.event_type, COALESCE(c.n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN c ON c.bucket_start = s.bucket_start AND c.event_type = t.event_type
ORDER BY s.bucket_start, t.event_type
"""

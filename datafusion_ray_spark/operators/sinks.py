"""Hive-partitioned parquet sinks + pruned reads (static and dynamic).

The reference's output surface is ``COPY TO`` / listing-table reads
(``/root/reference/src/context.rs`` register_listing_table,
``/root/reference/src/util.rs:523-580`` object-store routing); DataFusion's
listing tables support hive-style ``col=value`` directory partitioning. The
Spark-first equivalent is ``DataFrameWriter.partitionBy`` on write and two
prune paths on read, both exercised here as first-class certified queries:

- **Static partition pruning** (``sink_partitioned_prune``): a literal
  filter on the partition column never touches non-matching directories —
  the scan's ``PartitionFilters`` carry the predicate and at 100 TB a
  one-type query reads 1/|types| of the data without a file ever opening.
- **Dynamic partition pruning** (``join_dpp``): the filter arrives at run
  time from the OTHER side of a join (here: the above-average revenue
  days, known only after an aggregate). Spark broadcasts the dim side,
  collects its partition keys, and injects them into the fact scan's
  partition filters (``dynamicpruningexpression``) — the canonical
  star-schema accelerator: fact partitions that no dim row references are
  never read.

Both queries WRITE the partitioned layout themselves (repartitioned by the
partition column first, so each directory gets one file instead of one
file per task — the small-files discipline that matters at 1000
executors), then read it back: sink and source are certified together.

Money-typed values use the repo-wide integer idiom (``floor(value * 1e6)``
micro-units) so sums are order-independent and engine-exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

#: partitions read back by the static-prune query.
PRUNE_EVENT_TYPE = "purchase"
#: dim selectivity for the dynamic-prune query: days whose revenue share
#: exceeds this fraction of the total (mean share at 30 days = 1/30 ~
#: 0.0333, so this keeps the above-average days — a strict subset at
#: every SF: 15/13/11 of 30 days at sf0.001/0.01/0.1).
DPP_REVENUE_SHARE = 0.0335


def _scratch(sf_dir: str, layout: str) -> str:
    """Deterministic scratch dir per (sf_dir, layout) under the system tmp
    dir; overwritten on every run so repeated bench/oracle invocations are
    self-contained."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(), "dfrs_partitioned", f"{tag}_{layout}"
    )


def write_events_partitioned(
    spark: SparkSession, sf_dir: str, by: str
) -> str:
    """Write events hive-partitioned by ``by`` (``event_type`` or the
    derived ``event_date``); returns the output path.

    ``repartition(by)`` before ``partitionBy(by)`` shuffles each partition
    value to one task -> ONE file per directory. Without it every one of
    the N input tasks writes a sliver into every directory: N x |values|
    small files, the classic partitioned-write mistake that turns a 100 TB
    write into hundreds of millions of KB-files.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.to_date("ts").alias("event_date"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_micro"),
    )
    path = _scratch(sf_dir, f"by_{by}")
    ev.repartition(by).write.partitionBy(by).mode("overwrite").parquet(path)
    return path


def run_sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by event_type, read back ONE type.

    The read plan carries ``PartitionFilters: [... (event_type = purchase)]``
    — directories for the other four types are pruned by the driver-side
    file index before any task launches (plan-asserted in
    tests/test_partitioned_sink.py).
    """
    path = write_events_partitioned(spark, sf_dir, "event_type")
    back = spark.read.parquet(path).where(
        F.col("event_type") == PRUNE_EVENT_TYPE
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value_micro").cast("long").alias("sum_value_micro"),
        )
        .orderBy("event_type")
    )


def sink_partitioned_prune_oracle() -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_value_micro
FROM events
WHERE event_type = '{PRUNE_EVENT_TYPE}'
GROUP BY event_type
ORDER BY event_type
"""


def run_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full metrics for the above-average revenue days, scanning only those
    partitions: events written partitioned by event_date, joined to a dim
    of days whose revenue share exceeds ``DPP_REVENUE_SHARE``.

    The dim key set exists only at run time (a HAVING over an aggregate
    against a scalar-subquery total), so static pushdown is impossible and
    Catalyst's InferFiltersFromConstraints cannot copy it across the join
    — and Spark's PartitionPruning rule requires exactly this shape: a
    genuinely selective Filter on the non-partitioned side (a bare
    aggregate+limit dim does NOT qualify). Dynamic partition pruning
    broadcasts the dim, harvests its dates, and injects them into the
    fact scan's partition filters (``dynamicpruningexpression``,
    plan-asserted in tests/test_partitioned_sink.py): the below-average
    date directories are never read; at 100 TB with daily partitions the
    fact scan cost is the qualifying days, not the archive.
    """
    path = write_events_partitioned(spark, sf_dir, "event_date")
    spark.read.parquet(path).createOrReplaceTempView("pfact")
    return spark.sql(f"""
WITH top_days AS (
    SELECT event_date FROM pfact GROUP BY event_date
    HAVING SUM(value_micro) >=
           {DPP_REVENUE_SHARE} * (SELECT SUM(value_micro) FROM pfact)
)
SELECT CAST(f.event_date AS STRING) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(f.value_micro) AS BIGINT) AS sum_value_micro
FROM pfact f JOIN top_days USING (event_date)
GROUP BY f.event_date
ORDER BY event_date
""")


def join_dpp_oracle() -> str:
    return f"""
WITH e AS (
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(floor(value * 1000000) AS BIGINT) AS value_micro
    FROM events
),
top_days AS (
    SELECT event_date
    FROM e
    GROUP BY event_date
    HAVING SUM(value_micro) >=
           {DPP_REVENUE_SHARE} * (SELECT SUM(value_micro) FROM e)
)
SELECT CAST(e.event_date AS VARCHAR) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(e.value_micro) AS BIGINT) AS sum_value_micro
FROM e JOIN top_days USING (event_date)
GROUP BY e.event_date
ORDER BY event_date
"""


def run_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the OPTIMIZE-style maintenance operator):
    rewrite a fragmented partitioned layout to one file per partition and
    prove data integrity across the rewrite.

    Stage 1 writes events partitioned by event_type WITHOUT the
    repartition discipline — every one of 16 write tasks drops a sliver
    into every directory (16 x 5 small files), which is exactly what
    incremental appends do to a real table. Stage 2 is the compactor:
    read back, shuffle each partition value to one task, rewrite — one
    file per directory. The returned per-type aggregates come from the
    COMPACTED layout and must match the DuckDB oracle computed from the
    original table, certifying the rewrite lost/duplicated nothing.
    File-count before/after is pinned by tests/test_partitioned_sink.py.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_micro"),
    )
    frag = _scratch(sf_dir, "frag")
    ev.repartition(16).write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(frag)
    compacted = _scratch(sf_dir, "compacted")
    (
        spark.read.parquet(frag)
        .repartition("event_type")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(compacted)
    )
    return (
        spark.read.parquet(compacted)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value_micro").cast("long").alias("sum_value_micro"),
        )
        .orderBy("event_type")
    )


def sink_compact_oracle() -> str:
    return """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_value_micro
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def extension_entries_sinks() -> list:
    from ..queries.registry import SuiteEntry

    return [
        SuiteEntry(
            "sink_partitioned_prune",
            run_sink_partitioned_prune,
            sink_partitioned_prune_oracle(),
            "hive-partitioned parquet sink (one file per partition dir) + "
            "static partition-pruned read-back of one event_type",
        ),
        SuiteEntry(
            "join_dpp",
            run_join_dpp,
            join_dpp_oracle(),
            "dynamic partition pruning: date-partitioned fact joined to a "
            "runtime above-average-revenue-days dim; only the matching "
            "partitions are scanned",
        ),
        SuiteEntry(
            "sink_compact",
            run_sink_compact,
            sink_compact_oracle(),
            "small-file compaction: fragmented partitioned layout "
            "rewritten to one file per partition, integrity certified "
            "against the source table",
        ),
    ]

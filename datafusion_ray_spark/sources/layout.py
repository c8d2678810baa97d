"""Canonical at-scale table layouts: how the ingest job should materialize
the engine's tables so downstream queries prune instead of scan.

The testdata arrives as single monolithic parquet files (fine for
correctness runs); a 100 TB deployment lays data out so the planner can
skip most of it:

- fact/event tables: hive-partitioned by event date → any time-bounded
  query reads only its days (PartitionFilters, proven in
  tests/test_plans.py);
- join-heavy tables: bucketed by the recurring join key
  (``sources/bucketing.py``) → co-located SortMergeJoins, no exchange;
- vector tables: partitioned by ANN bucket/cell
  (``similarity.write_ann_index``) → a query reads nprobe cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import ts_to_utc


def write_events_partitioned(events: DataFrame, path: str,
                             mode: str = "overwrite") -> None:
    """Materialize events hive-partitioned by ``event_date`` (UTC day of
    the canonical timestamp). Directory-per-day is the layout that turns
    every time-range predicate into a partition filter."""
    ev = ts_to_utc(events, "ts")
    (
        ev.withColumn("event_date", F.to_date(F.col("ts")))
        .write.partitionBy("event_date")
        .mode(mode)
        .parquet(path)
    )


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned layout back (partition discovery supplies
    ``event_date``; predicates on it prune directories at plan time)."""
    return spark.read.parquet(path)


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_rows: int = 1_000_000,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction — the maintenance job every streaming/
    micro-batch ingest needs at scale (a day of 1-minute micro-batches is
    1440 files per partition; metadata and open() overheads dominate scans
    long before data volume does).

    Rewrites the parquet directory at ``path`` into
    ``ceil(rows / target_file_rows)`` files. The rewrite is one
    round-robin repartition (no sort, no skew sensitivity); row count is
    computed from parquet footer statistics, not a data scan. Returns the
    number of output files written.

    At 100 TB this runs per partition directory (compact yesterday's
    partition, not the table), which is how OPTIMIZE-style maintenance
    bounds its work; pair with ``write_events_partitioned`` so each
    partition compacts independently.
    """
    df = spark.read.parquet(path)
    # Footer-only count: Spark answers count() over parquet from row-group
    # metadata (no column data read) — cheap even on huge directories.
    rows = df.count()
    n_files = max(1, -(-rows // target_file_rows))
    df.repartition(n_files).write.mode(mode).parquet(out_path)
    return n_files

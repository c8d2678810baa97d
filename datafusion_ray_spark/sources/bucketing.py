"""Bucketed table layout: co-located, shuffle-free equi-joins.

The reference executes every join behind its Arrow-Flight shuffle
(`/root/reference/src/stage_reader.rs` — each stage fetches repartitioned
streams); the Spark-native way to DELETE that shuffle for recurring joins
is the bucketed-table layout: both sides pre-hashed into the same number
of buckets on the join key at write time, so the planner proves
co-partitioning and plans a SortMergeJoin with NO Exchange on either side.

At 100 TB this is the difference between re-shuffling the fact table on
every pipeline run and shuffling it once at ingest: a nightly
orders⋈lineitem pipeline pays the bucket write once, then every downstream
join/aggregation on the bucket key is map-side.

Buckets also bound task input size (choose n_buckets so one bucket of the
LARGER table fits an executor's memory) and feed bucket-pruned scans for
point lookups on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool,
    mode: str,
    path: str | None,
    file_format: str,
) -> None:
    """Shared writer for :func:`write_bucketed` / :func:`append_bucketed`.

    Aligns task partitioning with bucket assignment before the write:
    both use HashPartitioning on the bucket keys, so each task holds
    exactly ONE bucket's rows -> n_buckets output files. Without this,
    every task writes a sliver into every bucket (tasks x buckets small
    files — measured 1024 files / 1.7 s on a 32-task write of the LSH
    index; the same small-files rule as repartition-before-partitionBy
    in operators/sinks.py).
    """
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, *[F.col(k) for k in keys])
    writer = df.write.bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.mode(mode).format(file_format).saveAsTable(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``sort=True`` additionally sorts within each bucket file, so a
    bucket-key SortMergeJoin needs neither Exchange NOR Sort — the scan
    output order is the join order.
    """
    keys = [key] if isinstance(key, str) else list(key)
    _save_bucketed(df, table, keys, n_buckets, sort, "overwrite", path, file_format)


def append_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    file_format: str = "parquet",
) -> None:
    """APPEND a batch into an existing bucketed table (same bucket spec).

    The incremental-maintenance half of the bucketed-index story: ingest
    batches land as n_buckets NEW files per append — existing files are
    never rewritten (append-only, asserted in tests/test_suite7.py), so
    maintaining a corpus-scale index costs O(batch), not O(corpus).
    Spark's bucketed scan unions the per-bucket file groups, so the
    co-partitioning guarantee (joins on the bucket key plan with NO
    Exchange above the index scan) survives appends; only the
    within-bucket SORT guarantee is per-file after an append, which a
    SortMergeJoin recovers with a local Sort, never a shuffle. Periodic
    compaction back to one file per bucket is a rewrite via
    :func:`write_bucketed` (the sink_compact rule: files scale with
    buckets, not appends x buckets, after each compaction)."""
    keys = [key] if isinstance(key, str) else list(key)
    _save_bucketed(df, table, keys, n_buckets, sort, "append", None, file_format)


def compact_bucketed(
    spark: SparkSession,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> int:
    """Compact an appended-to bucketed table back to ONE file per bucket
    (and restore the full within-bucket sort the appends fragmented).

    Returns the number of files before compaction. Locally the rewrite
    pins the table's rows (localCheckpoint) and overwrites in place; at
    100 TB run the same ``write_bucketed`` into a NEW table/location and
    swap the catalog entry atomically — the rewrite itself is one
    bucket-aligned shuffle-free pass either way (the scan is already
    hash-partitioned on the key). Pair with :func:`append_bucketed`:
    appends are O(batch) all week, one compaction restores the
    one-file-per-bucket + sorted-scan invariants."""
    location = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .where("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    import glob
    import os

    n_before = len(
        glob.glob(os.path.join(location.replace("file:", ""), "*.parquet"))
    )
    pinned = spark.table(table).localCheckpoint(eager=True)
    write_bucketed(
        pinned, table, key=key, n_buckets=n_buckets, sort=sort,
        path=location.replace("file:", ""),
    )
    return n_before


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,  # str | list[str] | Column join condition
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on the
    same key and bucket count.  The plan this produces is the point: verify
    with ``.explain`` that there is no Exchange above either scan
    (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)

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


def _sql_str(value: str) -> str:
    """Escape a string for interpolation into a SQL string literal."""
    return value.replace("'", "''")


def _sql_ident(name: str) -> str:
    """Backtick-quote a (possibly dotted) table identifier so names that
    need quoting cannot break interpolated DDL."""
    return ".".join(
        "`" + part.replace("`", "``") + "`" for part in name.split(".")
    )


def table_location(spark: SparkSession, table: str) -> str:
    """Filesystem location backing a catalog table (``file:`` stripped)."""
    loc = (
        spark.sql(f"DESCRIBE FORMATTED {_sql_ident(table)}")
        .where("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    return loc[len("file:"):] if loc.startswith("file:") else loc


def _generation_base(location: str) -> str:
    import re

    return re.sub(r"\.gen\d+(?:\.retired)?$", "", location.rstrip("/"))


def _next_generation(location: str) -> str:
    """Versioned sibling location for the next index generation:
    ``<base>.gen<N>`` with N = 1 + the highest existing generation (the
    current location may itself be a ``.gen<K>`` from a prior compaction,
    and retired generations awaiting GC also reserve their number, so
    generations never collide and never nest suffixes)."""
    import glob
    import re

    base = _generation_base(location)
    taken = {0}
    for p in glob.glob(base + ".gen*"):
        m = re.search(r"\.gen(\d+)(?:\.retired)?$", p)
        if m:
            taken.add(int(m.group(1)))
    if base != location.rstrip("/"):
        m = re.search(r"\.gen(\d+)$", location.rstrip("/"))
        if m:
            taken.add(int(m.group(1)))
    return f"{base}.gen{max(taken) + 1}"


def gc_generations(live_location: str) -> list[str]:
    """Delete every RETIRED generation of an index — the sibling
    ``<base>``/``<base>.gen<N>``/``<base>.gen<N>.retired`` directories
    that are not the live one — and return the deleted paths.

    Old-generation deletion is DEFERRED by default (``gc_old=False`` on
    the compactors): a reader that planned its scan against the old
    generation keeps a valid file listing through the swap and finishes
    undisturbed; the retired directory survives until this GC pass runs.
    The compactors call it at the START of the next compaction, so the
    grace window is one full compaction cycle — call it directly for an
    eager sweep once no reader can hold the old listing."""
    import glob
    import os
    import shutil

    live = os.path.normpath(live_location.rstrip("/"))
    if not os.path.isdir(live):
        # CRASH STATE, not garbage: nothing is live (e.g. a rerun after a
        # crash between compact_partitioned's two swap renames, where the
        # old generation sits at <base>.genN.retired and the new at
        # <base>.genN). Deleting the siblings here would destroy EVERY
        # copy of the index — refuse, leave recovery to the operator.
        return []
    base = _generation_base(live)
    candidates = {base, *glob.glob(base + ".gen*")}
    deleted = []
    for path in sorted(candidates):
        if os.path.normpath(path) == live or not os.path.isdir(path):
            continue
        shutil.rmtree(path, ignore_errors=True)
        if os.path.exists(path):
            # A failed deletion (permissions, open handles) must stay
            # VISIBLE — reporting it swept would mean it is never retried.
            # It remains a retired sibling, so the next GC pass retries.
            import logging

            logging.getLogger(__name__).warning(
                "gc_generations could not remove %s; will retry next pass",
                path,
            )
            continue
        deleted.append(path)
    return deleted


def compact_bucketed(
    spark: SparkSession,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    pre_swap_hook=None,
    gc_old: bool = False,
) -> int:
    """Compact an appended-to bucketed table back to ONE file per bucket
    (and restore the full within-bucket sort the appends fragmented),
    WITHOUT ever putting the only copy of the index at risk.

    The 100 TB-safe shape (this IS the code path, not prose): the new
    generation is written with ``write_bucketed`` into a VERSIONED SIBLING
    location (``<base>.gen<N>``) while the live table keeps serving reads
    from the old files — nothing pins the table in executor memory and
    nothing overwrites in place. After a row-count check against the old
    generation, the catalog entry is repointed in ONE metastore operation
    (``ALTER TABLE ... SET LOCATION``) — the atomic commit. The old
    generation is NOT deleted at swap time (``gc_old=False`` default): a
    concurrent reader mid-scan on the old files finishes undisturbed, and
    the retired directory is swept by :func:`gc_generations` — invoked
    here at the start of the NEXT compaction, so the grace window is one
    full compaction cycle. ``gc_old=True`` restores eager deletion for
    callers that know no concurrent reader exists. A failure at ANY step
    before the swap leaves the table serving the old generation
    untouched; a failure after it leaves at worst an orphaned retired
    directory for the next GC pass.

    ``pre_swap_hook(old_location, new_location)`` is a test seam invoked
    after the new generation is written+verified but before the swap —
    the point where both generations must coexist on disk.

    Returns the number of files before compaction. Pair with
    :func:`append_bucketed`: appends are O(batch) all week, one compaction
    restores the one-file-per-bucket + sorted-scan invariants."""
    import glob
    import os
    import shutil

    location = table_location(spark, table)
    gc_generations(location)  # sweep generations retired >=1 cycle ago
    new_location = _next_generation(location)
    n_before = len(glob.glob(os.path.join(location, "*.parquet")))
    rows_before = spark.table(table).count()  # parquet metadata-only

    # New generation from the old files (never touched): one
    # bucket-aligned pass, external temp table so DROP keeps the files.
    # Read the LOCATION as plain parquet, not spark.table(table): the
    # bucketed-table scan advertises HashPartitioning, EnsureRequirements
    # then removes _save_bucketed's explicit repartition as redundant, and
    # DisableUnnecessaryBucketedScan subsequently disables the bucketed
    # scan itself — leaving NO alignment at all, so every task writes a
    # mixture of buckets (measured: 64 files from a 32-bucket rewrite).
    # A plain parquet read carries no bucket metadata, so the repartition
    # survives and each task writes exactly one bucket.
    tmp = f"{table}__compacting"
    keys = [key] if isinstance(key, str) else list(key)
    try:
        write_bucketed(
            spark.read.parquet(location), tmp, key=keys, n_buckets=n_buckets,
            sort=sort, path=new_location,
        )
        rows_new = spark.table(tmp).count()
        if rows_new != rows_before:
            raise RuntimeError(
                f"compaction row-count mismatch for {table}: "
                f"{rows_before} -> {rows_new}; keeping the old generation"
            )
    except BaseException:
        spark.sql(f"DROP TABLE IF EXISTS {_sql_ident(tmp)}")
        shutil.rmtree(new_location, ignore_errors=True)
        raise
    if pre_swap_hook is not None:
        pre_swap_hook(location, new_location)
    # THE commit: one metastore op repoints readers at the new generation
    # (bucket spec is table metadata and survives; refresh drops the
    # cached file listing). Everything before this is invisible to
    # readers; everything after is cleanup.
    spark.sql(
        f"ALTER TABLE {_sql_ident(table)} "
        f"SET LOCATION '{_sql_str(new_location)}'"
    )
    spark.sql(f"DROP TABLE IF EXISTS {_sql_ident(tmp)}")  # files survive
    spark.catalog.refreshTable(table)
    if gc_old:
        shutil.rmtree(location, ignore_errors=True)
    return n_before


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str = "cell",
    pre_swap_hook=None,
    gc_old: bool = False,
) -> int:
    """Compact a ``partitionBy(partition_col)`` parquet directory (the
    persisted IVF index layout) back to ONE file per partition directory —
    the cell-partitioned twin of :func:`compact_bucketed`, same
    generation-then-swap safety story for a PATH-addressed index with no
    catalog entry.

    The new generation is written complete and row-count-verified at
    ``<path>.gen<N>`` before the live directory is touched; the swap is
    two renames ordered so data is never lost (old aside first, new into
    place second — a crash between them leaves BOTH generations on disk,
    recoverable by hand or rerun). The retired old generation is NOT
    deleted at swap time (``gc_old=False`` default — same deferred-GC
    grace window as :func:`compact_bucketed`): it survives as
    ``<path>.gen<N>.retired`` until :func:`gc_generations` sweeps it at
    the start of the next compaction. Note the path-addressed swap is
    inherently rename-based, so a reader that resolves files BY PATH
    mid-swap can still observe the move — on an object store / real
    deployment the swap is a catalog or view repoint exactly like
    :func:`compact_bucketed`'s ``ALTER TABLE`` (the rename story is the
    LOCAL-FILESYSTEM stand-in and is load-bearing: object stores have no
    atomic directory rename — an s3://-backed index needs the manifest/
    catalog repoint, not this function).

    Directory-level partition pruning (``PartitionFilters`` on
    ``partition_col``) is a property of the layout, which compaction
    preserves — asserted across a compaction in tests/test_suite7.py.

    Returns the number of data files before compaction."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    gc_generations(path)  # sweep generations retired >=1 cycle ago
    n_before = len(glob.glob(os.path.join(path, "*", "*.parquet")))
    df = spark.read.parquet(path)
    rows_before = df.count()  # parquet metadata-only
    new_location = _next_generation(path)
    try:
        (
            df.repartition(F.col(partition_col))
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(new_location)
        )
        rows_new = spark.read.parquet(new_location).count()
        if rows_new != rows_before:
            raise RuntimeError(
                f"compaction row-count mismatch for {path}: "
                f"{rows_before} -> {rows_new}; keeping the old generation"
            )
    except BaseException:
        shutil.rmtree(new_location, ignore_errors=True)
        raise
    if pre_swap_hook is not None:
        pre_swap_hook(path, new_location)
    retired = new_location + ".retired"
    shutil.rmtree(retired, ignore_errors=True)  # stale crash leftover
    os.rename(path, retired)  # old generation intact, just aside
    os.rename(new_location, path)  # new generation live
    if gc_old:
        shutil.rmtree(retired, ignore_errors=True)
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

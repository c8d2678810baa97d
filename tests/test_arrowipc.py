"""Distributed Arrow IPC file reads (``sources/arrowipc.py``) — the
reference's ArrowExec surface (``/root/reference/src/util.rs:26,504-507``)
on Spark: footer-only planning, one partition per record-batch run,
zero-copy batch reads on executors, facade registration + SQL."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_ray_spark.context import DFRayContext

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def arrow_file(tmp_path_factory):
    """documents re-written as ONE IPC file with many small record
    batches — the split unit the source must fan out over."""
    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    path = str(tmp_path_factory.mktemp("ipc") / "documents.arrow")
    with pa.ipc.new_file(path, tbl.schema) as w:
        for batch in tbl.to_batches(max_chunksize=max(1, tbl.num_rows // 8)):
            w.write_batch(batch)
    return path, tbl


def test_arrow_scan_partitions_per_batch_and_roundtrips(spark, arrow_file):
    path, tbl = arrow_file
    n_batches = pa.ipc.open_file(pa.memory_map(path)).num_record_batches
    assert n_batches >= 8  # the fixture really produced a splittable file

    from datafusion_ray_spark.sources.arrowipc import register_arrow_ipc

    register_arrow_ipc(spark)
    df = spark.read.format("arrowipc").option("path", path).load()
    # one input partition per record batch (ArrowExec's split unit)
    assert df.rdd.getNumPartitions() == n_batches
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r.values()) for r in tbl.to_pylist())
    assert got == want

    # batches_per_partition packs runs (for files written with tiny batches)
    packed = (
        spark.read.format("arrowipc")
        .option("path", path)
        .option("batches_per_partition", "4")
        .load()
    )
    assert packed.rdd.getNumPartitions() == -(-n_batches // 4)
    assert packed.count() == tbl.num_rows


def test_arrow_facade_register_sql_and_oracle(spark, arrow_file):
    """The migration surface: register an .arrow table on the facade, run
    SQL against it, and certify the aggregate against DuckDB computing
    the same thing from the ORIGINAL parquet."""
    path, _ = arrow_file
    ctx = DFRayContext(spark=spark)
    ctx.register_arrow_file("docs_ipc", path)
    got = [
        b.to_pydict()
        for b in ctx.sql(
            "SELECT lang, count(*) AS n, sum(n_chars) AS chars "
            "FROM docs_ipc GROUP BY lang ORDER BY lang"
        ).collect()
    ]
    con = duckdb.connect()
    want = con.sql(
        "SELECT lang, count(*) AS n, sum(n_chars) AS chars "
        f"FROM '{os.path.join(SF_DIR, 'documents.parquet')}' "
        "GROUP BY lang ORDER BY lang"
    ).fetchall()
    flat = [
        (lang, n, c)
        for b in got
        for lang, n, c in zip(b["lang"], b["n"], b["chars"])
    ]
    assert flat == [tuple(r) for r in want]


def test_arrow_directory_listing(spark, tmp_path):
    """A directory of .arrow files is a listing table (reference
    ListingTable shape); files concatenate in sorted order."""
    tbl = pq.read_table(os.path.join(SF_DIR, "nation.parquet"))
    d = tmp_path / "nation_ipc"
    d.mkdir()
    half = tbl.num_rows // 2
    for i, part in enumerate((tbl.slice(0, half), tbl.slice(half))):
        with pa.ipc.new_file(str(d / f"part{i}.arrow"), tbl.schema) as w:
            w.write_table(part)
    ctx = DFRayContext(spark=spark)
    ctx.register_listing_table("nation_ipc", str(d), file_format="arrow")
    out = [
        b.to_pydict()
        for b in ctx.sql("SELECT count(*) AS n FROM nation_ipc").collect()
    ]
    assert out[0]["n"] == [tbl.num_rows]


def test_arrow_missing_path_errors_cleanly(spark):
    ctx = DFRayContext(spark=spark)
    with pytest.raises(Exception, match="(?i)no arrow ipc files"):
        ctx.register_arrow_file("nope", "/tmp/does_not_exist_ipc_dir_xyz")


def test_arrow_remote_scheme_rejected_up_front(spark):
    """Executors open IPC paths with plain os I/O, so a remote scheme must
    fail with an explicit unsupported-scheme error, not a misleading
    'no arrow IPC files at s3://...' (advisor round-8)."""
    ctx = DFRayContext(spark=spark)
    with pytest.raises(Exception, match="local/shared-filesystem only"):
        ctx.register_arrow_file("nope", "s3://bucket/prefix")


def test_arrow_directory_mixed_schemas_fail_at_planning(spark, tmp_path):
    """A directory mixing footer schemas must raise a clear per-file error
    during planning, not a confusing executor-side batch-schema error
    (advisor round-8)."""
    d = tmp_path / "mixed_ipc"
    d.mkdir()
    a = pa.table({"x": pa.array([1, 2], pa.int64())})
    b = pa.table({"y": pa.array(["u", "v"])})
    for name, tbl in (("a.arrow", a), ("b.arrow", b)):
        with pa.ipc.new_file(str(d / name), tbl.schema) as w:
            w.write_table(tbl)
    from datafusion_ray_spark.sources.arrowipc import register_arrow_ipc

    register_arrow_ipc(spark)
    df = spark.read.format("arrowipc").option("path", str(d)).load()
    with pytest.raises(Exception, match="schema mismatch"):
        df.collect()

"""End-to-end S3 object-store reads against a LIVE (moto) S3 endpoint.

Round-8: the environment probe found boto3 + moto present, which opens the
gate the roadmap carried since round 4 ("exercised s3/gs object stores").
These tests run a real ThreadedMotoServer, upload real parquet bytes, and
read them back through the distributed Python Data Source
(``sources/s3store.py``) and through the facade
(``DFRayContext.register_parquet("s3://...")`` — the reference's
scheme-based registration, ``/root/reference/src/util.rs:523-580``).

The s3a fallback chain is exercised implicitly: this sandbox has no
hadoop-aws jars, so the facade path proves tier-2 engages when tier-1
fails — exactly the degraded environment the source exists for.
"""

from __future__ import annotations

import os

import pytest

try:
    import boto3
    from moto.server import ThreadedMotoServer
except ImportError:  # pragma: no cover - capability gate
    boto3 = None

pytestmark = pytest.mark.skipif(
    boto3 is None, reason="boto3/moto not installed (capability gate)"
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def s3_endpoint():
    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    url = f"http://{host}:{port}"
    old = {
        k: os.environ.get(k)
        for k in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
                  "AWS_DEFAULT_REGION")
    }
    os.environ.update(
        AWS_ACCESS_KEY_ID="testing",
        AWS_SECRET_ACCESS_KEY="testing",
        AWS_DEFAULT_REGION="us-east-1",
    )
    yield url
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    server.stop()


@pytest.fixture(scope="module")
def bucket(s3_endpoint):
    client = boto3.client("s3", endpoint_url=s3_endpoint)
    client.create_bucket(Bucket="graft")
    # single object
    with open(os.path.join(SF_DIR, "nation.parquet"), "rb") as f:
        client.put_object(Bucket="graft", Key="tables/nation.parquet",
                          Body=f.read())
    # directory-of-files prefix: supplier split into two same-schema parts
    import io

    import pyarrow.parquet as pq

    sup = pq.read_table(os.path.join(SF_DIR, "supplier.parquet"))
    half = sup.num_rows // 2
    for i, part in enumerate((sup.slice(0, half), sup.slice(half))):
        buf = io.BytesIO()
        pq.write_table(part, buf)
        client.put_object(Bucket="graft", Key=f"dir/part-{i}.parquet",
                          Body=buf.getvalue())
    # a multi-row-group object, to prove row-group splitting
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "customer.parquet"))
    import io

    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=max(1, t.num_rows // 7))
    client.put_object(Bucket="graft", Key="multi/customer.parquet",
                      Body=buf.getvalue())
    # a LARGE multi-row-group object whose data pages live far outside
    # the 64 KB footer tail cache — the byte-accounting fixture for the
    # projection / stats-pruning tests (sf0.001 tables are smaller than
    # the tail probe, so every read would come from one cached GET).
    import pyarrow as pa

    big = pa.table({
        "k": list(range(200_000)),  # ascending -> tight row-group stats
        "v": [float(i % 997) for i in range(200_000)],
        # unique per row (dictionary encoding can't collapse it): the
        # column a projection of (k, v) must never transfer
        "s": [f"payload-{i:012d}-{(i * 2654435761) % 10**12:012d}"
              for i in range(200_000)],
    })
    buf = io.BytesIO()
    pq.write_table(big, buf, row_group_size=25_000)
    client.put_object(Bucket="graft", Key="big/pushdown.parquet",
                      Body=buf.getvalue())
    return "graft"


def _read(spark, s3_endpoint, path, **opts):
    from datafusion_ray_spark.sources.s3store import register_s3_parquet

    register_s3_parquet(spark)
    # Credentials as explicit OPTIONS, not env: Spark's Python workers were
    # spawned before this module's fixtures ran, so env mutations here
    # never reach them. moto accepts any key pair.
    reader = (
        spark.read.format("s3parquet")
        .option("path", path)
        .option("endpoint_url", s3_endpoint)
        .option("access_key", "testing")
        .option("secret_key", "testing")
        .option("region", "us-east-1")
    )
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_single_object_matches_local(spark, s3_endpoint, bucket):
    got = _read(spark, s3_endpoint, "s3://graft/tables/nation.parquet")
    want = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_prefix_listing_reads_all_files(spark, s3_endpoint, bucket):
    """A prefix of N same-schema objects reads as one table (the
    reference's ListingTable over an object store)."""
    got = _read(spark, s3_endpoint, "s3://graft/dir")
    want = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
    assert got.schema == want.schema
    assert got.count() == want.count()
    assert sorted(r["s_suppkey"] for r in got.collect()) == sorted(
        r["s_suppkey"] for r in want.collect()
    )


def test_row_group_splitting_fans_out(spark, s3_endpoint, bucket):
    # partition_bytes=1: every row group becomes its own input partition.
    got = _read(
        spark, s3_endpoint, "s3://graft/multi/customer.parquet",
        partition_bytes=1,
    )
    nparts = got.rdd.getNumPartitions()
    assert nparts >= 7, f"expected >=7 row-group partitions, got {nparts}"
    want = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    assert got.count() == want.count()
    # values survive the split exactly
    assert (
        sorted(map(tuple, got.select("c_custkey", "c_name").collect()))
        == sorted(map(tuple, want.select("c_custkey", "c_name").collect()))
    )


def test_facade_register_parquet_s3_fallback(spark, s3_endpoint, bucket):
    """DFRayContext.register_parquet('s3://...') must engage tier 2 (the
    boto3 source) in this jar-less sandbox and serve SQL over the table."""
    from datafusion_ray_spark.context import DFRayContext

    ctx = DFRayContext(spark=spark)
    ctx.register_parquet(
        "nation_s3", "s3://graft/tables/nation.parquet",
        endpoint_url=s3_endpoint, access_key="testing",
        secret_key="testing", region="us-east-1",
    )
    batches = ctx.sql(
        "SELECT COUNT(*) AS n, MIN(n_nationkey) AS mn FROM nation_s3"
    ).collect()
    row = batches[0].to_pydict()
    assert row["n"] == [25] and row["mn"] == [0]


def test_facade_gs_interop_fallback(spark, s3_endpoint, bucket):
    """gs:// engages the same tier-2 distributed source through GCS's
    S3-interop endpoint when the GCS connector jar is absent. The
    explicit endpoint_url override (pointed at moto here) is the exact
    knob the real interop path turns — storage.googleapis.com is only
    the default the facade fills in."""
    from datafusion_ray_spark.context import DFRayContext

    ctx = DFRayContext(spark=spark)
    ctx.register_parquet(
        "nation_gs", "gs://graft/tables/nation.parquet",
        endpoint_url=s3_endpoint, access_key="testing",
        secret_key="testing", region="us-east-1",
    )
    row = ctx.sql(
        "SELECT COUNT(*) AS n, MAX(n_nationkey) AS mx FROM nation_gs"
    ).collect()[0].to_pydict()
    assert row["n"] == [25] and row["mx"] == [24]


def test_facade_s3_csv_presigned_distributed(spark, s3_endpoint, bucket):
    """register_csv('s3://...') in a jar-less environment presigns a GET
    URL and feeds the DISTRIBUTED Range-partitioned HTTP CSV source —
    S3 answers Range requests natively (moto does too), so the scan
    splits instead of spooling."""
    import io

    from datafusion_ray_spark.context import DFRayContext

    client = boto3.client("s3", endpoint_url=s3_endpoint)
    rows = "".join(f"{i},name_{i},{i * 0.5}\n" for i in range(5000))
    client.put_object(
        Bucket="graft", Key="csv/people.csv",
        Body=io.BytesIO(f"id,name,score\n{rows}".encode()).read(),
    )
    ctx = DFRayContext(spark=spark)
    ctx.register_csv(
        "people_s3", "s3://graft/csv/people.csv",
        endpoint_url=s3_endpoint, access_key="testing",
        secret_key="testing", region="us-east-1",
        partition_bytes=16_384,  # force >1 byte-range partition
    )
    df = spark.table("people_s3")
    assert df.rdd.getNumPartitions() > 1, "scan must split by byte range"
    row = ctx.sql(
        "SELECT COUNT(*) AS n, SUM(id) AS s, MAX(score) AS mx FROM people_s3"
    ).collect()[0].to_pydict()
    assert row["n"] == [5000]
    assert row["s"] == [sum(range(5000))]
    assert row["mx"] == [4999 * 0.5]


def test_missing_prefix_raises_cleanly(spark, s3_endpoint, bucket):
    with pytest.raises(Exception, match="no parquet objects|PATH_NOT_FOUND"):
        _read(spark, s3_endpoint, "s3://graft/nope").limit(1).collect()


def test_projection_and_stats_pruning_reduce_transfer(s3_endpoint, bucket):
    """Round-9 user-declared pushdown: a column projection must transfer
    FEWER bytes (only the projected columns' pages), and a filter whose
    refutation is provable from footer min/max stats must plan FEWER row
    groups and transfer fewer bytes — with identical surviving rows.
    Byte accounting is exact: every executor-side GET goes through the
    module's _client hook, recorded per Range header against live moto."""
    from datafusion_ray_spark.sources import s3store

    real_client = s3store._client

    class Recorder:
        def __init__(self, inner):
            self.inner, self.data_bytes, self.calls = inner, 0, []

        def get_object(self, **kw):
            rng = kw["Range"][len("bytes="):]
            lo, hi = rng.split("-")
            self.data_bytes += int(hi) - int(lo) + 1
            self.calls.append(kw["Range"])
            return self.inner.get_object(**kw)

        def __getattr__(self, attr):
            return getattr(self.inner, attr)

    base_opts = {
        "path": "s3://graft/big/pushdown.parquet",
        "endpoint_url": s3_endpoint,
        "access_key": "testing", "secret_key": "testing",
        "region": "us-east-1",
    }

    def run(**extra):
        opts = dict(base_opts, **extra)
        rec = Recorder(real_client(opts))
        s3store._client = lambda _o: rec
        try:
            reader = s3store._S3ParquetReader(None, opts)
            parts = reader.partitions()
            rows = cols = 0
            for p in parts:
                for batch in reader.read(p):
                    rows += batch.num_rows
                    cols = batch.num_columns
            return rec, len(parts), rows, cols
        finally:
            s3store._client = real_client

    full, n_full, rows_full, cols_full = run(partition_bytes=1)
    assert n_full == 8 and rows_full == 200_000

    # projection: same rows, two columns, strictly fewer bytes (only the
    # projected columns' pages are ranged-GET; the wide string column
    # never transfers)
    proj, n_proj, rows_proj, cols_proj = run(
        partition_bytes=1, columns="k,v"
    )
    assert rows_proj == rows_full and cols_proj == 2 < cols_full
    assert proj.data_bytes < full.data_bytes * 0.8, (
        f"projection transferred {proj.data_bytes} vs {full.data_bytes}"
    )

    # stats pruning: k is ascending, so row-group min/max are tight and a
    # 150k threshold refutes 6 of the 8 row groups driver-side
    import json

    filt, n_filt, rows_filt, _ = run(
        partition_bytes=1,
        filters=json.dumps([["k", ">=", 150_000]]),
    )
    assert n_filt == 2, f"stats pruning kept {n_filt} of 8 partitions"
    assert filt.data_bytes < full.data_bytes / 2
    # lossless: every row >= cutoff survives (surviving row groups may
    # carry extras below the cutoff; exact filtering happens above)
    assert 50_000 <= rows_filt < rows_full


def test_all_row_groups_pruned_returns_empty(spark, s3_endpoint, bucket):
    """An all-excluding filter (k >= max+1: every row group's footer
    stats refute it) plans ZERO partitions; pyspark substitutes [None]
    for an empty plan, so read(None) must yield nothing instead of
    crashing (advisor round-9 medium)."""
    df = _read(
        spark, s3_endpoint, "s3://graft/big/pushdown.parquet",
        partition_bytes=1, filters='[["k", ">=", 200000]]',
    )
    assert df.count() == 0
    assert df.columns == ["k", "v", "s"]


def test_facade_projection_filters_identical_results(
    spark, s3_endpoint, bucket
):
    """The facade contract: register_parquet(columns=..., filters=...)
    over the boto3 tier returns EXACTLY the same rows as the equivalent
    select/where over the local parquet (the filters become exact — the
    where() above the stats-pruned scan drops row-group survivors)."""
    from datafusion_ray_spark.context import DFRayContext

    ctx = DFRayContext(spark=spark)
    ctx.register_parquet(
        "cust_s3_pushdown", "s3://graft/multi/customer.parquet",
        endpoint_url=s3_endpoint, access_key="testing",
        secret_key="testing", region="us-east-1",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
        filters=[["c_mktsegment", "=", "BUILDING"], ["c_acctbal", ">", 0]],
    )
    got = sorted(
        map(tuple, spark.table("cust_s3_pushdown").collect())
    )
    want_df = (
        spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .where("c_mktsegment = 'BUILDING' AND c_acctbal > 0")
    )
    assert got == sorted(map(tuple, want_df.collect()))
    assert len(got) > 0


def test_ranged_file_tail_cache_one_get_per_footer():
    """Planner cost contract: parsing one object's parquet FOOTER costs
    exactly ONE Range GET (the cached tail), not one per pyarrow read —
    the round trips the driver pays per file while planning a prefix.
    Data-page reads outside the tail still issue their own ranged GETs."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_ray_spark.sources.s3store import (
        _FOOTER_PROBE,
        _RangedS3File,
    )

    sink = pa.BufferOutputStream()
    pq.write_table(
        pa.table({"a": list(range(200_000)), "b": ["x"] * 200_000}),
        sink,
        row_group_size=50_000,
    )
    blob = sink.getvalue().to_pybytes()
    assert len(blob) > _FOOTER_PROBE  # data pages live outside the tail

    class CountingClient:
        def __init__(self, payload: bytes):
            self.payload = payload
            self.calls: list[str] = []

        def get_object(self, Bucket, Key, Range):
            self.calls.append(Range)
            lo, hi = Range[len("bytes="):].split("-")
            return {"Body": _io.BytesIO(self.payload[int(lo): int(hi) + 1])}

    client = CountingClient(blob)
    pf = pq.ParquetFile(_RangedS3File(client, "b", "k", len(blob)))
    assert pf.metadata.num_row_groups == 4
    assert len(client.calls) == 1, f"footer parse issued {client.calls}"

    # reading a row group fetches data bytes with fresh GETs and matches
    # the original table's rows
    got = pf.read_row_group(0)
    assert got.num_rows == 50_000
    assert len(client.calls) > 1


def test_pushfilters_triples_conversion():
    """Catalyst Filter objects -> pruner triples: supported shapes map,
    unsupported shapes (nested columns, Not over inequality) are skipped
    — safe because every filter is returned to Spark unconsumed."""
    from pyspark.sql.datasource import (
        EqualNullSafe, EqualTo, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, Not,
    )

    from datafusion_ray_spark.sources.s3store import _triples_from_pushed

    got = _triples_from_pushed([
        GreaterThanOrEqual(("k",), 10),
        EqualTo(("v",), 3.5),
        Not(EqualTo(("v",), 7.0)),
        In(("k",), (1, 2, 3)),
        IsNull(("s",)),
        IsNotNull(("k",)),
        EqualTo(("a", "b"), 1),          # nested: skipped
        Not(LessThan(("k",), 5)),        # Not over inequality: skipped
        # NOT(a <=> v) is TRUE for null rows; min/max stats cannot refute
        # it, so it must never become a pruning triple
        Not(EqualNullSafe(("v",), 7.0)),
    ])
    assert got == [
        ("k", ">=", 10),
        ("v", "=", 3.5),
        ("v", "!=", 7.0),
        ("k", "in", (1, 2, 3)),
        ("s", "isnull", None),
        ("k", "notnull", None),
    ]


def test_pushfilters_byte_reduction_no_declared_filters(s3_endpoint, bucket):
    """Round-10 automatic pushdown: the reader's pushFilters (fed exactly
    what Catalyst would push for `WHERE k >= 150000`) must prune 6 of 8
    row groups and halve transferred bytes — with NO user-declared
    filters option. Byte accounting via the module's _client hook against
    live moto, same harness as the round-9 user-declared test. Every
    filter must be returned unconsumed (by reference) so Spark keeps
    exact filtering above the scan."""
    from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull

    from datafusion_ray_spark.sources import s3store

    real_client = s3store._client

    class Recorder:
        def __init__(self, inner):
            self.inner, self.data_bytes = inner, 0

        def get_object(self, **kw):
            lo, hi = kw["Range"][len("bytes="):].split("-")
            self.data_bytes += int(hi) - int(lo) + 1
            return self.inner.get_object(**kw)

        def __getattr__(self, attr):
            return getattr(self.inner, attr)

    opts = {
        "path": "s3://graft/big/pushdown.parquet",
        "endpoint_url": s3_endpoint,
        "access_key": "testing", "secret_key": "testing",
        "region": "us-east-1", "partition_bytes": "1",
    }

    def run(pushed):
        rec = Recorder(real_client(opts))
        s3store._client = lambda _o: rec
        try:
            reader = s3store._S3ParquetReader(None, dict(opts))
            if pushed is not None:
                returned = reader.pushFilters(pushed)
                assert [f is g for f, g in zip(returned, pushed)] == (
                    [True] * len(pushed)
                ), "filters must be returned unconsumed, by reference"
            parts = reader.partitions()
            rows = 0
            for p in parts:
                for batch in reader.read(p):
                    rows += batch.num_rows
            return rec.data_bytes, len(parts), rows
        finally:
            s3store._client = real_client

    full_bytes, n_full, rows_full = run(None)
    assert n_full == 8 and rows_full == 200_000

    pushed = [IsNotNull(("k",)), GreaterThanOrEqual(("k",), 150_000)]
    filt_bytes, n_filt, rows_filt = run(pushed)
    assert n_filt == 2, f"pushFilters pruning kept {n_filt} of 8 partitions"
    assert filt_bytes < full_bytes / 2
    assert 50_000 <= rows_filt < rows_full  # lossless, exact filter above


def test_pushfilters_e2e_plain_where(spark, s3_endpoint, bucket):
    """Full Spark path: .where() on the s3parquet table with NO filters
    option — the executed scan fans out over only the surviving row
    groups and the answer is exact."""
    from pyspark.sql import functions as F

    df = _read(
        spark, s3_endpoint, "s3://graft/big/pushdown.parquet",
        partition_bytes=1,
    ).where("k >= 150000")
    nparts = (
        df.withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert nparts == 2, f"executed scan planned {nparts} partitions"
    agg = df.agg(
        F.count("*").alias("n"), F.min("k").alias("mn"),
        F.max("k").alias("mx"),
    ).collect()[0]
    assert (agg["n"], agg["mn"], agg["mx"]) == (50_000, 150_000, 199_999)


def test_redact_url_strips_query_string():
    from datafusion_ray_spark.sources.s3store import redact_url

    signed = ("https://b.s3.amazonaws.com/k.csv?X-Amz-Signature=SECRET"
              "&X-Amz-Credential=AKIAXXX")
    assert redact_url(signed) == "https://b.s3.amazonaws.com/k.csv?<redacted>"
    assert "SECRET" not in redact_url(signed)
    assert redact_url("https://b/k.csv") == "https://b/k.csv"


def test_presigned_csv_hygiene_and_expiry_refresh(spark, s3_endpoint, bucket):
    """Round-10 presign hygiene: the signed URL is a bearer credential, so
    (a) it must not surface in provenance or plan output, and (b) a
    long-lived registration must keep working past presign_expiry —
    sql() re-presigns against the stored s3:// metadata shortly before
    the URL would expire."""
    import io
    import time

    from datafusion_ray_spark.context import DFRayContext

    client = boto3.client("s3", endpoint_url=s3_endpoint)
    rows = "".join(f"{i},{i * 2}\n" for i in range(100))
    client.put_object(
        Bucket="graft", Key="csv/expiring.csv",
        Body=io.BytesIO(f"a,b\n{rows}".encode()).read(),
    )
    ctx = DFRayContext(spark=spark)
    ctx.register_csv(
        "expiring_s3", "s3://graft/csv/expiring.csv",
        endpoint_url=s3_endpoint, access_key="testing",
        secret_key="testing", region="us-east-1",
        presign_expiry=2,
    )
    # provenance records the s3:// path, never the signed URL
    assert ctx.tables()["expiring_s3"] == "s3://graft/csv/expiring.csv"
    df = ctx.sql("SELECT COUNT(*) AS n, SUM(b) AS s FROM expiring_s3")
    plan = str(df.execution_plan())
    assert "X-Amz-Signature" not in plan and "X-Amz-Credential" not in plan
    row = df.collect()[0].to_pydict()
    assert row["n"] == [100] and row["s"] == [sum(2 * i for i in range(100))]

    # past the refresh point (expiry 2s -> margin 1s), sql() re-presigns:
    # the stored metadata's refresh_at must ADVANCE and the query answer
    first_refresh_at = ctx._presigned["expiring_s3"]["refresh_at"]
    time.sleep(1.2)
    row = ctx.sql(
        "SELECT COUNT(*) AS n FROM expiring_s3"
    ).collect()[0].to_pydict()
    assert row["n"] == [100]
    assert ctx._presigned["expiring_s3"]["refresh_at"] > first_refresh_at
    assert ctx.tables()["expiring_s3"] == "s3://graft/csv/expiring.csv"


def test_range_split_protocol_large_listing(s3_endpoint, bucket):
    """Round-10 Hadoop split protocol: beyond footer_planning_max_files
    the planner emits byte-range partitions from the LISTING alone —
    zero driver GETs — and each task reads its own footer, claiming row
    groups by byte midpoint (exactly-once across tiling ranges) with the
    same lossless stats pruning applied task-side."""
    from datafusion_ray_spark.sources import s3store

    real_client = s3store._client

    class Recorder:
        def __init__(self, inner):
            self.inner, self.gets, self.data_bytes = inner, 0, 0

        def get_object(self, **kw):
            self.gets += 1
            lo, hi = kw["Range"][len("bytes="):].split("-")
            self.data_bytes += int(hi) - int(lo) + 1
            return self.inner.get_object(**kw)

        def __getattr__(self, attr):
            return getattr(self.inner, attr)

    opts = {
        "path": "s3://graft/big/pushdown.parquet",
        "endpoint_url": s3_endpoint,
        "access_key": "testing", "secret_key": "testing",
        "region": "us-east-1",
        # force range mode for this single object, ~4 ranges
        "footer_planning_max_files": "0",
        "partition_bytes": str(800_000),
    }

    def run(pushed=None, opts=opts):
        rec = Recorder(real_client(opts))
        s3store._client = lambda _o: rec
        try:
            reader = s3store._S3ParquetReader(None, dict(opts))
            if pushed is not None:
                reader.pushFilters(pushed)
            parts = reader.partitions()
            plan_gets = rec.gets  # GETs issued by PLANNING alone
            rows = 0
            for p in parts:
                assert len(p.value) == 4, "expected byte-range partitions"
                for batch in reader.read(p):
                    rows += batch.num_rows
            return plan_gets, len(parts), rows, rec.data_bytes
        finally:
            s3store._client = real_client

    plan_gets, n_parts, rows, full_bytes = run()
    assert plan_gets == 0, f"planner issued {plan_gets} GETs in range mode"
    assert n_parts > 1, "expected multiple byte ranges"
    assert rows == 200_000, f"midpoint rule lost/duplicated rows: {rows}"

    # task-side stats pruning still cuts transferred data bytes
    from pyspark.sql.datasource import GreaterThanOrEqual

    _, _, rows_f, filt_bytes = run([GreaterThanOrEqual(("k",), 150_000)])
    assert 50_000 <= rows_f < 200_000
    assert filt_bytes < full_bytes / 2

    # footer mode (threshold back at default) returns identical rows
    opts_footer = dict(opts, footer_planning_max_files="256")
    reader = s3store._S3ParquetReader(None, opts_footer)
    rows_footer = sum(
        b.num_rows for p in reader.partitions() for b in reader.read(p)
    )
    assert rows_footer == rows


# ---------------------------------------------------------------------------
# Explicit-object scans: the `paths` option (round-11, the form
# sources/objectindex.py's manifest-committed reads resolve to)


def test_paths_option_reads_explicit_objects(spark, s3_endpoint, bucket):
    """A JSON object list replaces prefix listing entirely — the same
    rows as the prefix scan of the two supplier parts."""
    import json

    want = _read(spark, s3_endpoint, "s3://graft/dir")
    got = _read(
        spark, s3_endpoint, "s3://graft/dir",
        paths=json.dumps(
            ["s3://graft/dir/part-0.parquet", "s3://graft/dir/part-1.parquet"]
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_paths_sized_entries_skip_all_discovery(s3_endpoint, bucket):
    """[url, size] pairs: planning issues ZERO ListObjects and HEADs only
    the entries whose size the declaration omitted."""
    import json

    from datafusion_ray_spark.sources import s3store

    client = boto3.client("s3", endpoint_url=s3_endpoint)
    size0 = client.head_object(Bucket="graft", Key="dir/part-0.parquet")[
        "ContentLength"
    ]

    real_client = s3store._client
    counts = {"list_objects_v2": 0, "head_object": 0}

    class Recorder:
        def __init__(self, inner):
            self.inner = inner

        def list_objects_v2(self, **kw):
            counts["list_objects_v2"] += 1
            return self.inner.list_objects_v2(**kw)

        def head_object(self, **kw):
            counts["head_object"] += 1
            return self.inner.head_object(**kw)

        def __getattr__(self, attr):
            return getattr(self.inner, attr)

    opts = {
        "endpoint_url": s3_endpoint, "access_key": "testing",
        "secret_key": "testing", "region": "us-east-1",
        "paths": json.dumps(
            [["s3://graft/dir/part-0.parquet", size0],
             "s3://graft/dir/part-1.parquet"]  # size omitted -> one HEAD
        ),
    }
    s3store._client = lambda _o: Recorder(real_client(_o))
    try:
        reader = s3store._S3ParquetReader(None, dict(opts))
        rows = sum(
            b.num_rows for p in reader.partitions() for b in reader.read(p)
        )
    finally:
        s3store._client = real_client
    assert rows > 0
    assert counts == {"list_objects_v2": 0, "head_object": 1}

    # fully sized: zero discovery of any kind
    counts.update(list_objects_v2=0, head_object=0)
    size1 = client.head_object(Bucket="graft", Key="dir/part-1.parquet")[
        "ContentLength"
    ]
    opts["paths"] = json.dumps(
        [["s3://graft/dir/part-0.parquet", size0],
         ["s3://graft/dir/part-1.parquet", size1]]
    )
    s3store._client = lambda _o: Recorder(real_client(_o))
    try:
        reader = s3store._S3ParquetReader(None, dict(opts))
        rows2 = sum(
            b.num_rows for p in reader.partitions() for b in reader.read(p)
        )
    finally:
        s3store._client = real_client
    assert rows2 == rows
    assert counts == {"list_objects_v2": 0, "head_object": 0}


def test_paths_validation_errors():
    import pytest as _pytest

    from datafusion_ray_spark.sources.s3store import _bucket_and_objects

    with _pytest.raises(ValueError, match="empty list"):
        _bucket_and_objects(None, {"paths": "[]"})
    with _pytest.raises(ValueError, match="span buckets"):
        _bucket_and_objects(
            None,
            {"paths": '[["s3://a/x.parquet", 1], ["s3://b/y.parquet", 1]]'},
        )

"""Sinks (parquet/csv/json writes, SQL DDL/DML), LocalValidator oracle
facade, prettify, and stage introspection."""

from __future__ import annotations

import pyarrow as pa

from datafusion_ray_spark import DFRayContext
from datafusion_ray_spark.validator import LocalValidator, prettify


def test_write_parquet_roundtrip(spark, sf_dir, tmp_path):
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_out")
    df = ctx.sql("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5")
    df.write_parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert set(back.columns) == {"n_nationkey", "n_name"}


def test_write_csv_json_roundtrip(spark, sf_dir, tmp_path):
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("region", f"{sf_dir}/region.parquet")
    df = ctx.sql("SELECT r_regionkey, r_name FROM region")
    df.write_csv(str(tmp_path / "r_csv"))
    df.write_json(str(tmp_path / "r_json"))
    assert spark.read.option("header", True).csv(str(tmp_path / "r_csv")).count() == 5
    assert spark.read.json(str(tmp_path / "r_json")).count() == 5


def test_sql_ddl_dml_sink(spark, sf_dir, tmp_path):
    """CREATE TABLE ... USING parquet + INSERT (reference: COPY TO / DML /
    CREATE EXTERNAL TABLE — datafusion.proto:61,65,43)."""
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("region", f"{sf_dir}/region.parquet")
    loc = str(tmp_path / "region_copy")
    ctx.sql(
        f"""
        CREATE TABLE region_copy USING parquet LOCATION '{loc}'
            AS SELECT * FROM region WHERE r_regionkey < 3;
        INSERT INTO region_copy SELECT * FROM region WHERE r_regionkey >= 3
        """
    )
    assert ctx.sql("SELECT COUNT(*) AS c FROM region_copy").to_pandas()["c"][0] == 5
    spark.sql("DROP TABLE region_copy")


def test_copy_to_statement(spark, sf_dir, tmp_path):
    """Literal COPY TO syntax through ctx.sql (reference: datafusion.proto:61;
    DataFusion DML `COPY { table | (query) } TO 'path' STORED AS fmt`)."""
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    # query form + STORED AS
    out1 = str(tmp_path / "n1.parquet")
    n = ctx.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 7) "
        f"TO '{out1}' STORED AS PARQUET"
    ).to_pandas()
    assert n["count"][0] == 7
    assert spark.read.parquet(out1).count() == 7
    # table form, format inferred from extension
    out2 = str(tmp_path / "n2.csv")
    n = ctx.sql(f"COPY nation TO '{out2}'").to_pandas()
    assert n["count"][0] == 25
    # round-trip: COPY output is registrable like any table
    ctx.register_parquet("n1_back", out1)
    assert ctx.sql("SELECT COUNT(*) AS c FROM n1_back").to_pandas()["c"][0] == 7


def test_copy_to_compression_option(spark, sf_dir, tmp_path):
    """COPY ... OPTIONS (compression 'zstd') reaches the parquet writer
    (the reference's own fixtures are zstd, tpch/make_data.py); the
    footer's column codec proves it wasn't silently dropped."""
    import glob

    import pyarrow.parquet as pq

    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nz.parquet")
    n = ctx.sql(
        f"COPY nation TO '{out}' STORED AS PARQUET "
        f"OPTIONS (compression 'zstd(3)')"
    ).to_pandas()
    assert n["count"][0] == 25
    part = glob.glob(f"{out}/*.parquet")[0]
    meta = pq.ParquetFile(part).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"


def test_copy_to_partitioned_by(spark, sf_dir, tmp_path):
    """COPY ... PARTITIONED BY (col) writes hive-style directories with
    one file per partition (repartition discipline) that read back with
    partition pruning like any partitioned table."""
    import glob
    import os

    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "n_part")
    n = ctx.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation) "
        f"TO '{out}' STORED AS PARQUET PARTITIONED BY (n_regionkey)"
    ).to_pandas()
    assert n["count"][0] == 25
    dirs = sorted(glob.glob(os.path.join(out, "n_regionkey=*")))
    assert len(dirs) == 5
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    back = spark.read.parquet(out)
    assert back.where("n_regionkey = 2").count() == 5


def test_local_validator_matches_spark(spark, sf_dir):
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    v = LocalValidator()
    v.register_parquet("nation", f"{sf_dir}/nation.parquet")
    q = "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS c FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
    s = pa.Table.from_batches(ctx.sql(q).collect()).to_pylist()
    o = pa.Table.from_batches(v.collect_sql(q)).to_pylist()
    assert s == o


def test_prettify_renders_table(sf_dir):
    v = LocalValidator()
    v.register_parquet("region", f"{sf_dir}/region.parquet")
    text = prettify(v.collect_sql("SELECT r_name FROM region ORDER BY r_name"))
    assert "AFRICA" in text and "EUROPE" in text
    assert prettify([]) == "(empty)"


def test_stages_split_on_exchange(spark, sf_dir):
    ctx = DFRayContext(spark=spark)
    ctx.register_parquet("lineitem", f"{sf_dir}/lineitem.parquet")
    df = ctx.sql(
        "SELECT l_returnflag, COUNT(*) AS c FROM lineitem GROUP BY l_returnflag ORDER BY c"
    )
    stages = df.stages()
    # agg + sort => at least two exchange-separated fragments
    assert len(stages) >= 2
    assert any("Scan" in s for s in stages)

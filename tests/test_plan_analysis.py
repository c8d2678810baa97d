"""plans/ analysis API: structured predicates over physical plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_ray_spark import plans
from datafusion_ray_spark.sources.tables import load_table


def test_shuffle_count_and_broadcast_exclusion(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    agg = joined.groupBy("n_name").count()
    # broadcast join -> no shuffle for the join itself; one for the groupBy
    assert plans.shuffle_count(agg) == 1
    assert plans.join_strategies(agg) == ["BroadcastHashJoin"]


def test_pushed_filters_and_scan_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_quantity") < 5).select("l_orderkey")
    pushed = plans.pushed_filters(q)
    assert any("l_quantity" in f for f in pushed)
    cols = plans.scan_columns(q)
    assert "l_orderkey" in cols and "l_comment" not in cols


def test_uses_python_workers_detection(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    jvm_only = docs.groupBy("lang").count()
    assert not plans.uses_python_workers(jvm_only)

    from datafusion_ray_spark.operators import multimodal as mm

    decoded = mm.decode_features(mm.with_binary_payload(docs))
    assert plans.uses_python_workers(decoded)

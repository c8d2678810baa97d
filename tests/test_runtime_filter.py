"""Runtime bloom-filter join pruning: the non-partitioned cousin of DPP.

Dynamic partition pruning (tests/test_partitioned_sink.py) prunes whole
directories when the join key IS the partition column. When it isn't,
Spark's InjectRuntimeFilter does the row-level analogue: build a bloom
filter from the filtered dim side's join keys at run time and apply
``might_contain`` on the fact side BEFORE the shuffle — at 100 TB this
drops the non-qualifying fact rows at the scan stage instead of carrying
them through exchange + join.

The default application-side threshold is 10 GB (the optimization only
pays off on big scans), so test data never triggers it organically; the
test lowers the threshold to prove the engine configuration leaves the
path AVAILABLE — a regression here (e.g. a session conf disabling the
rule) would silently cost a full-fact shuffle at scale.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from datafusion_ray_spark.sources.tables import load_table


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_filter_rule_enabled_by_default(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    confs = {
        # scans here are KBs; drop the 10 GB floor so the rule fires
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        # force a shuffle join: runtime filters skip broadcast joins
        # (the broadcast itself already prunes)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with _confs(spark, **confs):
        df = (
            li.join(
                part.where(F.col("p_size") < 5),
                li.l_partkey == part.p_partkey,
            )
            .groupBy("p_brand")
            .agg(F.count("*").alias("n"))
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, (
        "fact side of the shuffle join must carry a runtime bloom filter "
        "(might_contain) built from the filtered dim keys"
    )

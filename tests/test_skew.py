"""Skew resilience, demonstrated instead of assumed.

The driver's sf* testdata is roughly uniform, so nothing in the standard
gates ever exercises hot keys: AQE's skew-join split
(``spark.sql.adaptive.skewJoin``, on in session defaults) never fires, and
window/groupBy operators never see one partition dwarfing the rest. This
suite runs on a zipfian fixture (``testing.generate_skewed_testdata``: one
user owns 50% of 400k events with incompressible payloads; one documents
source owns 60% of docs, stuffed with template near-duplicates):

- certifies ``join_range``, ``ev_sessionize``, and ``dedup_groups``
  against the same DuckDB oracles the uniform gate uses — correctness
  under skew, not just survival;
- proves AQE's skew-join split ENGAGES (SortMergeJoin(skew=true) /
  "skewed" AQEShuffleRead in the final adaptive plan) on a hot-key join
  once partition sizes cross the thresholds — the runtime counterpart of
  the reference's static repartitioning (/root/reference/src/physical.rs:69);
- certifies the static salting path (``operators/skew.py:salted_join``)
  produces results identical to the unsalted join on the same hot key.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.sources.tables import duckdb_register, load_table
from datafusion_ray_spark.testing import (
    assert_frames_match,
    generate_skewed_testdata,
)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory) -> str:
    return generate_skewed_testdata(str(tmp_path_factory.mktemp("skewdata")))


@pytest.fixture(scope="module")
def skew_oracle(skew_dir):
    con = duckdb.connect()
    duckdb_register(con, skew_dir, tables=("events", "documents"))
    yield con
    con.close()


# dedup_url: regression for the advisor-r7 totality bug — its synthetic URL
# expression CAST a digit parsed out of `source`, so this fixture's `hotsrc`
# crashed BOTH engines; the TLD index now hashes the source (suite7._url_expr)
# and this case certifies it on exactly the data that used to throw.
@pytest.mark.parametrize(
    "name", ["join_range", "ev_sessionize", "dedup_groups", "dedup_url"]
)
def test_oracle_certified_on_skewed_data(name, spark, skew_dir, skew_oracle):
    entry = build_registry()[name]
    spark_pdf = entry.run(spark, skew_dir).toPandas()
    oracle_pdf = skew_oracle.sql(entry.oracle).df()
    assert len(spark_pdf) == len(oracle_pdf) > 0
    assert_frames_match(spark_pdf, oracle_pdf, name=f"{name}@skew")
    spark.catalog.clearCache()


def test_aqe_skew_join_split_engages(spark, skew_dir):
    """One hot user ≫ rest: with test-scale thresholds the final adaptive
    plan must carry the skew markers (at production defaults the same
    mechanics engage at 256MB partitions — the knob is scale, not code)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.files.maxPartitionBytes",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1048576",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "262144"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"
        )
        # keep the dim off the broadcast path so the join is a genuine SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # The fixture is one parquet file; a single map task means a reduce
        # partition has no mapper sub-ranges for the skew reader to split
        # on. Split the file like the multi-file layout a real table has.
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")

        ev = load_table(spark, skew_dir, "events")
        # Materialize the dim side first: OptimizeSkewedJoin can only split
        # a hot partition when BOTH join children are plain shuffle reads —
        # replicating the matching right partition through an in-flight
        # aggregate would double-count, so Spark (correctly) declines. A
        # real pipeline's dim is a materialized table; model that.
        users = (
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .localCheckpoint(eager=True)
        )
        # keep the fat incompressible props column IN the join output:
        # Catalyst would push any reduction of it (length etc.) below the
        # exchange, deflating the hot partition the test needs oversized.
        joined = ev.join(users, "user_id").select(
            "user_id", "event_id", "n_events", "props"
        )
        # collect() (not count()) so THIS DataFrame's plan is the one
        # executed — count() builds a separate aggregate plan and leaves
        # joined's own adaptive plan unfinalized.
        assert len(joined.collect()) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE skew-join split did not engage on the hot-key join:\n"
            + "\n".join(
                line for line in plan.splitlines() if "Join" in line
            )
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_unsalted_on_hot_key(spark, skew_dir):
    from datafusion_ray_spark.operators.skew import salted_join

    ev = load_table(spark, skew_dir, "events").select("user_id", "value")
    dim = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 0)
    )
    plain = (
        ev.join(dim, "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"), F.max("n").alias("n"))
        .orderBy("user_id")
        .toPandas()
    )
    salted = (
        salted_join(ev, dim, "user_id", n_salt=8)
        .groupBy("user_id")
        .agg(F.count("*").alias("c"), F.max("n").alias("n"))
        .orderBy("user_id")
        .toPandas()
    )
    assert_frames_match(salted, plain, name="salted_join@skew")

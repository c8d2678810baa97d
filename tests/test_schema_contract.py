"""Schema-drift canary + adverse-session defense.

Round 2 post-mortem: the driver regenerated ``events.parquet`` with ``ts``
as plain ``timestamp[us]`` (Spark 4 reads TIMESTAMP_NTZ), the loader's
nanos-only normalization never fired, and the breakage surfaced as seven
scattered test failures plus two silently-wrong streaming readers.  These
tests make the NEXT silent testdata regeneration fail loudly in one obvious
place, and prove the loaders defend themselves when the caller's session
carries adverse confs (non-UTC timezone, no engine settings) — the driver
contract runs ``queries()`` under a session this repo did not build.
"""

from __future__ import annotations

import os

import pytest

from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.sources.tables import ALL_TABLES, load_table
from datafusion_ray_spark.testing import assert_frames_match

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# The engine-canonical dtype contract load_table must yield REGARDLESS of how
# the parquet files physically encode values (int64 nanos, NTZ micros, tz'd
# micros — all three have shipped at some point).  Date-like TPC-H columns
# stay NTZ deliberately: wall-clock dates are timezone-free, and every
# consumer treats them as dates.  events.ts is canonical TIMESTAMP (UTC
# instant) because epoch extraction (unix_micros) and interval joins need an
# instant, not a wall clock.
EXPECTED_DTYPES = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),  # the round-2 regression point
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("sf", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("table", ALL_TABLES)
def test_canonical_dtypes(spark, sf, table):
    assert load_table(spark, sf, table).dtypes == EXPECTED_DTYPES[table], (
        f"schema drift in {sf}/{table}.parquet — if the testdata generator "
        "changed an encoding, extend sources/tables.py normalization "
        "(NOT the per-operator call sites)"
    )


# Timezone-sensitive and formerly-NTZ-broken entries, plus one TPC-H anchor.
_ADVERSE_QUERIES = [
    "q1",
    "join_range",
    "join_asof_forward",
    "ev_session_window",
    "ev_tumbling_window",
    "ev_daily_pivot",
    "ev_resample_fill",
    "sim_semdedup",
]


@pytest.fixture(scope="module")
def adverse_spark(spark):
    """A session with the confs a naive caller would have: non-UTC timezone,
    no nanosAsLong.  newSession() shares the JVM but has isolated SQL conf,
    which is exactly the surface load_table must defend."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


@pytest.mark.parametrize("name", _ADVERSE_QUERIES)
def test_queries_survive_adverse_session(adverse_spark, oracle, sf_dir, name):
    entry = build_registry()[name]
    result = entry.run(adverse_spark, sf_dir)
    assert_frames_match(result.toPandas(), oracle.sql(entry.oracle).df(), name=name)

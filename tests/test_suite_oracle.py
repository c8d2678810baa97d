"""End-to-end oracle gate: every registry query, Spark vs DuckDB.

Mirrors the reference's CI validation loop (all queries, engine vs local
oracle, hard-fail on mismatch — ``/root/reference/tpch/tpcbench.py:133-157``
and ``.github/workflows/main.yml`` "validate tpch").
"""

from __future__ import annotations

import pytest

from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.testing import assert_frames_match

REGISTRY = build_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    entry = REGISTRY[name]
    result = entry.run(spark, sf_dir)
    spark_pdf = result.toPandas()
    if entry.oracle is None:
        # Non-SQL-expressible op: driver records a rows-only check.
        assert result.columns, f"{name}: no schema"
        return
    oracle_pdf = oracle.sql(entry.oracle).df()
    assert len(spark_pdf) > 0 or len(oracle_pdf) == 0, f"{name}: empty result"
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


def test_registry_nonempty():
    assert len(REGISTRY) >= 22

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H q1 shape) at sf0.001.
- ``queries()``: one callable per implemented operator/query from
  SURVEY.md §2 (TPC-H suite + operator coverage + extension operators).
- ``oracle_sql()``: DuckDB-equivalent SQL for every oracle-checkable entry.

Backed by :mod:`datafusion_ray_spark.queries.registry` — the same registry
the test suite and bench harness run.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_ray_spark.queries.registry import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["q1"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.run for name, e in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in _REGISTRY.items() if e.oracle is not None}

"""Physical-plan analysis — programmatic access to the plan properties the
engine's scale contract depends on.

The reference exposes plan introspection as strings
(``df.execution_plan()`` / ``display_execution_plan`` —
``/root/reference/datafusion_ray/core.py:483-504``, pretty printer
``src/util.rs:383-411``). This module goes further: structured predicates
over Spark's formatted plan so tests (tests/test_plans.py) and users can
ASSERT the plan shape — pushdown reached the scan, the dimension broadcast,
the pipeline stayed JVM-side — instead of eyeballing explain output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as ``df.explain("formatted")``)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_tree(df: DataFrame) -> str:
    """Just the operator tree (first block of the formatted plan)."""
    return formatted_plan(df).split("\n\n")[0]


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan tree (broadcast exchanges
    excluded — they move only the small side)."""
    tree = plan_tree(df)
    return sum(
        1
        for line in tree.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter expressions pushed into file scans."""
    out: list[str] = []
    for chunk in formatted_plan(df).split("PushedFilters: [")[1:]:
        body = chunk.split("]")[0].strip()
        if body:
            out.extend(f.strip() for f in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from file scans (ReadSchema) — the column-pruning
    ground truth."""
    cols: list[str] = []
    for chunk in formatted_plan(df).split("ReadSchema:")[1:]:
        schema = chunk.splitlines()[0]
        inner = schema.split("<", 1)[-1].rsplit(">", 1)[0]
        for field in inner.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin, SortMergeJoin, ...)."""
    out = []
    for line in plan_tree(df).splitlines():
        token = line.strip().lstrip("+-*: ").split(" ")[0]
        if "Join" in token:
            out.append(token)
    return out


def uses_python_workers(df: DataFrame) -> bool:
    """True when the plan evaluates any Python/Pandas UDF stage — the slow
    path the 100 TB design rules reserve for genuinely non-relational work."""
    plan = formatted_plan(df)
    return any(
        marker in plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )

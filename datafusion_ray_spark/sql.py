"""Multi-statement SQL script runner.

The reference's benchmark harness splits query files on ``;`` and executes
each statement, returning the last non-empty result
(``/root/reference/tpch/tpcbench.py:110-121``); its own Spark harness also
rewrites ``create view`` to ``create temp view``
(``/root/reference/k8s/spark_tpcbench.py:91``). Same contract here, with a
splitter that respects string literals.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_CREATE_VIEW = re.compile(r"^\s*create\s+view\s+", re.IGNORECASE)
_DROP_VIEW = re.compile(r"^\s*drop\s+view\s+(if\s+exists\s+)?(?P<name>[\w.]+)", re.IGNORECASE)


def split_statements(script: str) -> list[str]:
    """Split on ``;`` outside single/double-quoted literals and outside
    ``-- ...`` / ``/* ... */`` comments; drop empties."""
    statements: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            i += 1
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
            i += 1
        elif script.startswith("--", i):
            j = script.find("\n", i)
            j = n if j == -1 else j
            buf.append(script[i:j])
            i = j
        elif script.startswith("/*", i):
            j = script.find("*/", i + 2)
            j = n if j == -1 else j + 2
            buf.append(script[i:j])
            i = j
        elif ch == ";":
            statements.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    statements.append("".join(buf))
    return [s.strip() for s in statements if s.strip()]


def rewrite_statement(stmt: str) -> str:
    """``create view`` -> ``create or replace temp view`` (reference's own
    Spark harness rewrite)."""
    if _CREATE_VIEW.match(stmt):
        return _CREATE_VIEW.sub("CREATE OR REPLACE TEMP VIEW ", stmt)
    return stmt


def run_script(spark: SparkSession, script: str) -> DataFrame:
    """Execute every statement; return the last statement's DataFrame.

    DDL statements (views) execute eagerly; the final SELECT stays lazy.
    """
    statements = split_statements(script)
    if not statements:
        raise ValueError("empty SQL script")
    result: DataFrame | None = None
    for stmt in statements:
        result = spark.sql(rewrite_statement(stmt))
    assert result is not None
    return result

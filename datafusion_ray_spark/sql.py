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
#: DataFusion COPY statement (datafusion.proto:61; public syntax
#: ``COPY { table | (query) } TO 'path' [STORED AS fmt] [OPTIONS (...)]``).
_COPY = re.compile(
    r"^\s*copy\s+(?:\((?P<query>.*)\)|(?P<table>[\w.]+))\s+to\s+"
    r"'(?P<path>[^']+)'"
    r"(?:\s+stored\s+as\s+(?P<fmt>\w+))?"
    r"(?:\s+partitioned\s+by\s*\((?P<partcols>[^)]*)\))?"
    r"(?:\s+options\s*\((?P<options>.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: OPTIONS entries: DataFusion accepts ``key value`` / ``key 'value'`` /
#: ``'key' 'value'`` pairs, comma-separated; keys may be dotted
#: (``format.compression``).
_COPY_OPT = re.compile(r"'?([\w.]+)'?\s+'?([\w.\-()]+)'?")


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
    return [s.strip() for s in statements if not _is_blank(s)]


_COMMENT_SPANS = re.compile(r"--[^\n]*|/\*.*?\*/", re.DOTALL)


def _is_blank(stmt: str) -> bool:
    """True if the statement is only whitespace and/or comments (a trailing
    ``-- note`` after the final ``;`` must not reach ``spark.sql``)."""
    return not _COMMENT_SPANS.sub("", stmt).strip()


def rewrite_statement(stmt: str) -> str:
    """``create view`` -> ``create or replace temp view`` (reference's own
    Spark harness rewrite)."""
    if _CREATE_VIEW.match(stmt):
        return _CREATE_VIEW.sub("CREATE OR REPLACE TEMP VIEW ", stmt)
    return stmt


def run_copy(spark: SparkSession, stmt: str) -> DataFrame | None:
    """Execute a ``COPY ... TO 'path'`` statement (DataFusion DML surface,
    ``datafusion.proto:61``); returns a 1-row (count) DataFrame like the
    reference engine, or None if the statement is not a COPY.

    Spark writes a directory of part files at ``path`` (the distributed
    sink — at scale a single output file would serialize the write), which
    Spark/DuckDB readers and ``register_parquet`` accept transparently.
    Format comes from STORED AS, else the path extension, else parquet.

    DataFusion's ``PARTITIONED BY (cols)`` clause maps to
    ``DataFrameWriter.partitionBy`` (hive-style directories, pruned on
    read — see operators/sinks.py), with the one-file-per-partition
    repartition discipline applied. ``OPTIONS (...)`` pairs are honored
    for the compression codec (``compression 'zstd'`` or DataFusion's
    dotted ``format.compression``; the reference's own fixtures are
    zstd parquet, ``/root/reference/tpch/make_data.py``); unknown keys
    are ignored like DataFusion's format-specific passthroughs.
    """
    m = _COPY.match(stmt)
    if m is None:
        return None
    src = spark.sql(m.group("query")) if m.group("query") else spark.table(m.group("table"))
    path = m.group("path")
    fmt = m.group("fmt")
    if not fmt:
        tail = path.rstrip("/").rsplit("/", 1)[-1]
        fmt = tail.rsplit(".", 1)[-1] if "." in tail else "parquet"
    fmt = fmt.lower()
    opts = dict(_COPY_OPT.findall(m.group("options") or ""))
    partcols = [c.strip() for c in (m.group("partcols") or "").split(",") if c.strip()]
    if partcols:
        src = src.repartition(*partcols)
    writer = src.write.mode("overwrite")
    if partcols:
        writer = writer.partitionBy(*partcols)
    compression = opts.get("compression") or opts.get("format.compression")
    if compression:
        # DataFusion spells levels inline (zstd(3)); Spark takes the codec
        writer = writer.option("compression", compression.split("(")[0])
    if fmt == "parquet":
        writer.parquet(path)
        written = spark.read.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
        written = spark.read.option("header", "true").csv(path)
    elif fmt in ("json", "ndjson"):
        writer.json(path)
        written = spark.read.json(path)
    else:
        raise ValueError(f"unsupported COPY format: {fmt}")
    # Read-back count: matches the reference's rows-written result and
    # doubles as a write validation (parquet counts from footer metadata).
    return spark.createDataFrame([(written.count(),)], "count: bigint")


def run_script(spark: SparkSession, script: str) -> DataFrame:
    """Execute every statement; return the last statement's DataFrame.

    DDL statements (views) execute eagerly; the final SELECT stays lazy.
    ``COPY ... TO`` statements execute eagerly and yield a rows-written
    count.
    """
    statements = split_statements(script)
    if not statements:
        raise ValueError("empty SQL script")
    result: DataFrame | None = None
    for stmt in statements:
        copied = run_copy(spark, stmt)
        result = copied if copied is not None else spark.sql(rewrite_statement(stmt))
    assert result is not None
    return result

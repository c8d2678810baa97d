"""Operator-coverage queries beyond the 22 TPC-H shapes.

SURVEY.md §2.2 lists relational operators the reference can plan and execute
via DataFusion 45 that the TPC-H suite does not exercise (window functions —
``datafusion.proto:532``/``:1129-1139``; grouping sets/rollup —
``:1163-1164``; set operations — ``:717,724`` and logical intersect/except;
cross join — ``:714``; distinct — ``:55``; limit/offset — ``:1169-1179``;
values lists — ``:48``; unnest — ``:728``). Each gets a dedicated
oracle-checked query here so the inventory line-items are individually
verified. Dual-dialect rules follow queries/tpch.py; ROW_NUMBER/RANK are
cast to INT (DuckDB returns BIGINT, Spark INT) and NULLS FIRST is explicit
wherever rollup introduces NULL group keys (the engines' defaults differ).
"""

from __future__ import annotations

from .tpch import QueryDef, cents, isum, whole

_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description,
                        oracle=oracle.strip() if oracle else None)


# Window functions: ROW_NUMBER / RANK / DENSE_RANK with deterministic
# ordering keys; top-2 rows per supplier.
_q(
    "win_rank",
    """
SELECT l_suppkey, l_orderkey, l_linenumber, rn, rnk, drnk
FROM (
    SELECT
        l_suppkey, l_orderkey, l_linenumber,
        CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INT) AS rn,
        CAST(RANK() OVER (PARTITION BY l_suppkey ORDER BY CAST(l_quantity AS INT) DESC) AS INT) AS rnk,
        CAST(DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY CAST(l_quantity AS INT) DESC) AS INT) AS drnk
    FROM lineitem
) ranked
WHERE rn <= 2
ORDER BY l_suppkey, rn
""",
    "window ranking: row_number/rank/dense_rank per partition",
)

# Window analytics: LAG/LEAD and a running (cumulative) sum over an ordered
# frame — deterministic because the ordering key (o_orderkey) is unique and
# the summed values are integer-valued doubles cast via decimal.
_q(
    "win_lag_lead",
    """
SELECT
    o_custkey,
    o_orderkey,
    CAST(LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS prev_order,
    CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS next_order,
    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS running_total
FROM orders
WHERE o_custkey < 20
ORDER BY o_custkey, o_orderkey
""",
    "window analytics: lag/lead + running sum over ROWS frame",
)

# Grouping sets via ROLLUP; NULLS FIRST pinned (engine defaults differ).
_q(
    "rollup_agg",
    f"""
SELECT
    l_returnflag,
    l_linestatus,
    {isum(whole('l_quantity'), 'sum_qty')},
    CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    "rollup: hierarchical grouping sets with NULL group keys",
)

# CUBE over two dimensions.
_q(
    "cube_agg",
    f"""
SELECT
    l_returnflag,
    l_linestatus,
    {isum(cents('l_extendedprice'), 'sum_price', 100)}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    "cube: full cross-product grouping sets",
)

# Set operations. UNION deduplicates; UNION ALL concatenates.
_q(
    "setop_union",
    """
SELECT nk, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 4000
    UNION ALL
    SELECT s_nationkey AS nk FROM supplier
) u
GROUP BY nk
ORDER BY nk
""",
    "union all: bag concatenation + reaggregation",
)

_q(
    "setop_union_distinct",
    """
SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 4000
UNION
SELECT s_nationkey AS nk FROM supplier
ORDER BY nk
""",
    "union distinct: set semantics",
)

_q(
    "setop_intersect",
    """
SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 4000
INTERSECT
SELECT s_nationkey AS nk FROM supplier
ORDER BY nk
""",
    "intersect: distinct set intersection",
)

_q(
    "setop_except",
    """
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier WHERE s_suppkey <= 20
ORDER BY nk
""",
    "except: distinct set difference (supplier side bounded so the result "
    "is non-empty at every test SF — an empty EXCEPT certifies nothing)",
)

# DISTINCT projection.
_q(
    "distinct_proj",
    """
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
ORDER BY c_mktsegment, c_nationkey
""",
    "distinct: multi-column deduplication",
)

# Cross join (datafusion.proto:714).
_q(
    "cross_join",
    """
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
    "cross join: cartesian product",
)

# Non-equi (theta) join -> Spark BroadcastNestedLoopJoin; the reference
# forces NestedLoopJoinExec onto its own stage (src/dataframe.rs:159-179).
_q(
    "theta_join",
    """
SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS richer_customers
FROM supplier JOIN customer ON c_acctbal > s_acctbal
GROUP BY s_suppkey
ORDER BY s_suppkey
""",
    "theta join: inequality predicate -> nested-loop/broadcast join",
)

# LIMIT + OFFSET (GlobalLimitExec skip+fetch, datafusion.proto:1169-1179).
_q(
    "limit_offset",
    """
SELECT c_custkey, c_name
FROM customer
ORDER BY c_custkey
LIMIT 10 OFFSET 5
""",
    "limit/offset: global limit with skip",
)

# VALUES inline relation (datafusion.proto:48). Spark and DuckDB accept
# different FROM VALUES spellings -> per-engine texts.
_q(
    "values_inline",
    """
SELECT t.k, t.v, r_name
FROM VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma') AS t(k, v)
JOIN region ON r_regionkey = t.k
ORDER BY t.k
""",
    "values list: inline relation joined to a table",
    oracle="""
SELECT t.k, t.v, r_name
FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS t(k, v)
JOIN region ON r_regionkey = t.k
ORDER BY t.k
""",
)

# UNNEST / explode of an array column (datafusion.proto:728 UnnestExec).
# Spark: LATERAL VIEW posexplode; DuckDB: unnest WITH ORDINALITY equivalent.
_q(
    "unnest_explode",
    """
SELECT vec_id, CAST(pos AS INT) AS pos, CAST(val AS DOUBLE) AS val
FROM embeddings
LATERAL VIEW posexplode(embedding) t AS pos, val
WHERE vec_id < 3
ORDER BY vec_id, pos
""",
    "unnest: array explode with ordinality",
    oracle="""
SELECT vec_id, pos, val
FROM (
    SELECT vec_id,
           CAST(UNNEST(range(len(embedding))) AS INT) AS pos,
           CAST(UNNEST(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 3
) t
ORDER BY vec_id, pos
""",
)

# Scalar function surface: string/math/date kernels in one projection
# (DataFusion's scalar library; exercised minimally by TPC-H).
_q(
    "scalar_funcs",
    """
SELECT
    n_nationkey,
    UPPER(n_name) AS uname,
    LOWER(n_name) AS lname,
    CAST(LENGTH(n_name) AS INT) AS name_len,
    SUBSTRING(n_name, 1, 6) AS prefix,
    REPLACE(n_name, 'NATION', 'N') AS short_name,
    CONCAT(n_name, '-', CAST(n_nationkey AS STRING)) AS tagged,
    ABS(n_nationkey - 12) AS dist_from_12,
    ROUND(SQRT(CAST(n_nationkey AS DOUBLE)), 4) AS sqrt_key,
    CAST(n_nationkey % 5 AS INT) AS mod5
FROM nation
ORDER BY n_nationkey
""",
    "scalar functions: string/math kernels in projection",
    oracle="""
SELECT
    n_nationkey,
    UPPER(n_name) AS uname,
    LOWER(n_name) AS lname,
    CAST(LENGTH(n_name) AS INT) AS name_len,
    SUBSTRING(n_name, 1, 6) AS prefix,
    REPLACE(n_name, 'NATION', 'N') AS short_name,
    CONCAT(n_name, '-', CAST(n_nationkey AS VARCHAR)) AS tagged,
    ABS(n_nationkey - 12) AS dist_from_12,
    ROUND(SQRT(CAST(n_nationkey AS DOUBLE)), 4) AS sqrt_key,
    CAST(n_nationkey % 5 AS INT) AS mod5
FROM nation
ORDER BY n_nationkey
""",
)

# Date/time kernel surface over the timestamp columns.
_q(
    "datetime_funcs",
    """
SELECT
    CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
    CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
    CAST(EXTRACT(day FROM o_orderdate) AS INT) AS d,
    CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
    CAST(o_orderdate + INTERVAL '1' MONTH AS DATE) AS next_month,
    CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders
WHERE o_orderdate < TIMESTAMP '1995-04-01'
GROUP BY 1, 2, 3, 4, 5
ORDER BY y, m, d
""",
    "datetime functions: extract/date_trunc/interval arithmetic",
)


COVERAGE_QUERIES: dict[str, QueryDef] = dict(_Q)

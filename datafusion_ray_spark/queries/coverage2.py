"""Operator coverage, batch 2: join variants and the wider aggregate
function library.

Extends SURVEY.md §2.2 coverage: explicit outer/semi/anti join forms (the
reference's join-type enum — ``datafusion_common.proto:78-88``), and the
DataFusion aggregate-function library surface beyond TPC-H (carried as named
UDAFs in the reference's wire format, ``datafusion.proto:531``):
variance/stddev, percentiles, min_by/max_by, string agg, bool/bit aggs,
grouping sets with GROUPING(). Determinism rules as in tpch.py (integer
sums for money; explicit tiebreaks; engine-specific spellings only where the
dialects force it).
"""

from __future__ import annotations

from .tpch import QueryDef, cents

_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description,
                        oracle=oracle.strip() if oracle else None)


# FULL OUTER join with both-null-side aggregation. Each side is
# pre-aggregated to one row per nation BEFORE the join: the previous form
# full-outer-joined the BASE tables on the 25-value nationkey, which makes
# |customers_n| x |suppliers_n| intermediate rows per nation — quadratic in
# scale factor (the r6 100x sweep measured 63x wall on exactly that). The
# aggregate-then-join shape is the plan you'd want at 100 TB (two
# map-side-combinable shuffles + a 25x25 join) and still exercises
# null-preservation on both sides: the acctbal filter can empty a nation's
# customer side entirely.
_q(
    "join_full_outer",
    """
SELECT COALESCE(cn, sn) AS nk,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
FROM (SELECT c_nationkey AS cn, COUNT(*) AS n_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey AS sn, COUNT(*) AS n_supp
                 FROM supplier GROUP BY s_nationkey) s ON cn = sn
ORDER BY nk
""",
    "full outer join: null-preserving both sides (pre-aggregated inputs)",
)

# RIGHT OUTER join (datafusion_common.proto:81).
_q(
    "join_right_outer",
    """
SELECT n_name, CAST(COUNT(s_suppkey) AS BIGINT) AS n_supp
FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    "right outer join: unmatched right rows kept",
)

# Explicit LEFT SEMI / LEFT ANTI join syntax (Spark-specific keywords; the
# oracle states the same semantics with EXISTS / NOT EXISTS, which is what
# Catalyst rewrites them from).
_q(
    "join_semi_anti",
    """
SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer LEFT SEMI JOIN orders ON c_custkey = o_custkey) AS n_with_orders,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer LEFT ANTI JOIN orders ON c_custkey = o_custkey) AS n_without_orders
""",
    "left semi + left anti join keywords",
    oracle="""
SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
""",
)

# Sample variance / stddev via exact integer sums — deterministic, unlike
# the engines' native one-pass var_samp over doubles.
_q(
    "agg_stats",
    f"""
SELECT c_nationkey,
       CAST(n AS BIGINT) AS n,
       ROUND((sx2 - sx * sx / n) / (n - 1), 4) AS var_acctbal,
       ROUND(SQRT((sx2 - sx * sx / n) / (n - 1)), 4) AS stddev_acctbal
FROM (
    SELECT c_nationkey,
           COUNT(*) AS n,
           CAST(SUM({cents('c_acctbal')}) AS DOUBLE) / 100 AS sx,
           CAST(SUM({cents('c_acctbal')} * {cents('c_acctbal')}) AS DOUBLE) / 10000 AS sx2
    FROM customer
    GROUP BY c_nationkey
) s
WHERE n > 1
ORDER BY c_nationkey
""",
    "variance/stddev from exact integer moments",
)

# Exact interpolated percentiles (Spark `percentile`, DuckDB
# `quantile_cont` — same linear-interpolation definition).
# SCALE NOTE: Spark's exact `percentile` buffers every group value in the
# aggregation state (the ~5 MB shuffled for 6 output rows in
# BENCH_DETAIL is the full column riding inside agg buffers) — correct
# as the small-scale oracle but NOT the 100 TB plan. The scale paths are
# `agg_approx_percentile` (GK sketch, bounded state, error-bound-tested
# against this exact form) and the distributed-CDF counting idiom
# (join_value_band's range-count rewrite) when exactness is required.
_q(
    "agg_percentile",
    """
SELECT l_returnflag,
       ROUND(PERCENTILE(l_quantity, 0.5), 6) AS median_qty,
       ROUND(PERCENTILE(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    "exact percentiles: median + p90",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

# min_by / max_by with a unique ordering key (deterministic).
_q(
    "agg_min_max_by",
    """
SELECT c_nationkey,
       MIN_BY(c_name, c_custkey) AS first_customer,
       MAX_BY(c_name, c_custkey) AS last_customer,
       MAX_BY(c_custkey, c_acctbal) AS richest_custkey
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    "min_by/max_by: argmin/argmax aggregates",
)

# Ordered string aggregation (listagg family).
_q(
    "agg_listagg",
    """
SELECT c_mktsegment,
       ARRAY_JOIN(ARRAY_SORT(COLLECT_SET(CAST(c_nationkey AS STRING))), ',') AS nations
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    "ordered string aggregation over distinct values",
    oracle="""
SELECT c_mktsegment,
       STRING_AGG(DISTINCT CAST(c_nationkey AS VARCHAR), ',' ORDER BY CAST(c_nationkey AS VARCHAR)) AS nations
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)

# Boolean and bitwise aggregates.
_q(
    "agg_bool_bit",
    """
SELECT n_regionkey,
       BOOL_AND(n_nationkey >= 0) AS all_nonneg,
       BOOL_OR(n_nationkey > 20) AS any_gt20,
       CAST(BIT_AND(n_nationkey) AS INT) AS band,
       CAST(BIT_OR(n_nationkey) AS INT) AS bor,
       CAST(BIT_XOR(n_nationkey) AS INT) AS bxor
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    "bool_and/bool_or + bit_and/bit_or/bit_xor aggregates",
)

# Explicit GROUPING SETS with the GROUPING() marker function.
_q(
    "grouping_sets",
    """
SELECT l_returnflag,
       l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    "explicit grouping sets + GROUPING() marker",
)

# Conditional / null-handling scalar functions.
_q(
    "cond_null_funcs",
    """
SELECT n_nationkey,
       COALESCE(NULLIF(n_name, 'NATION_3'), 'was_three') AS cname,
       LEAST(n_nationkey, n_regionkey) AS lo,
       GREATEST(n_nationkey, n_regionkey) AS hi,
       CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
       IF(n_regionkey = 0, 'africa', 'other') AS reg0
FROM nation
ORDER BY n_nationkey
""",
    "coalesce/nullif/least/greatest/case/if",
    oracle="""
SELECT n_nationkey,
       COALESCE(NULLIF(n_name, 'NATION_3'), 'was_three') AS cname,
       LEAST(n_nationkey, n_regionkey) AS lo,
       GREATEST(n_nationkey, n_regionkey) AS hi,
       CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
       IF(n_regionkey = 0, 'africa', 'other') AS reg0
FROM nation
ORDER BY n_nationkey
""",
)

# approx_count_distinct: HLL estimates are engine-specific, so the raw
# sketch values can't be hash-compared — instead the query returns the EXACT
# distinct counts (oracle-comparable) plus booleans asserting the HLL
# estimate landed within 2x its configured rsd (0.05). HLL is deterministic
# for a fixed dataset, so the booleans are stable, and the oracle's TRUE
# literals make the driver's hash gate enforce the error bound.
#
# One single-distinct subquery per column, NOT one SELECT with two distinct
# columns: two distinct groups force Catalyst's RewriteDistinctAggregates
# Expand — every fact row duplicated per group and shuffled (the r6 100x
# sweep measured 416x shuffle-byte growth on exactly that). Each subquery
# plans as planAggregateWithOneDistinct (partial distinct map-side, no
# Expand); the two column-pruned scans are the cheap part at 100 TB.
# Measured at sf0.1: 2.0 s -> 0.84 s, Expand gone, identical results.
_q(
    "agg_approx_distinct",
    """
SELECT o.exact_orders, p.exact_parts,
       ABS(o.approx_orders - o.exact_orders) <= 0.1 * o.exact_orders
           AS orders_within_bound,
       ABS(p.approx_parts - p.exact_parts) <= 0.1 * p.exact_parts
           AS parts_within_bound
FROM (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             CAST(APPROX_COUNT_DISTINCT(l_orderkey, 0.05) AS DOUBLE)
                 AS approx_orders
      FROM lineitem) o
CROSS JOIN
     (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(APPROX_COUNT_DISTINCT(l_partkey, 0.05) AS DOUBLE)
                 AS approx_parts
      FROM lineitem) p
""",
    "approx_count_distinct (HLL) with oracle-enforced error bound",
    oracle="""
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS orders_within_bound,
       TRUE AS parts_within_bound
FROM lineitem
""",
)


COVERAGE2_QUERIES: dict[str, QueryDef] = dict(_Q)

"""Operator coverage, batch 3: window frames, regex/string kernels,
array/map higher-order functions, JSON extraction.

Completes the scalar-expression surface of SURVEY.md §2.2: window frames
(``WindowExprNode`` partition/order/frame — ``datafusion.proto:528-540``),
the string/regex function library, LIST/MAP construction and higher-order
transforms (Arrow LIST/MAP types — ``datafusion_common.proto:351-357``),
and JSON field extraction over the ``events.props`` column. Dialect rules
as in tpch.py: identical spelling where the engines agree, separate oracle
text where they differ (DuckDB ``list_*`` vs Spark ``transform/filter``,
``strpos`` vs ``instr``, ``json_extract_string`` vs ``get_json_object``).
"""

from __future__ import annotations

from .tpch import QueryDef, cents, whole

_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description,
                        oracle=oracle.strip() if oracle else None)


# Window frames: ROWS moving window, ROWS running total, RANGE running
# total (peer rows included), frame-bounded FIRST/LAST_VALUE, NTILE /
# PERCENT_RANK / CUME_DIST distribution functions. Exact integer cents make
# the running sums associative and engine-identical; every ORDER BY key is
# unique within its partition so frames are deterministic.
_q(
    "win_frames",
    f"""
SELECT c_nationkey, c_custkey,
       CAST(SUM({cents('c_acctbal')}) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents,
       CAST(SUM({cents('c_acctbal')}) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents,
       CAST(SUM({cents('c_acctbal')}) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS range_cents,
       FIRST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
       LAST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_custkey), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_custkey), 6) AS cume
FROM customer
WHERE c_custkey <= 300
ORDER BY c_nationkey, c_custkey
""",
    "window frames: ROWS/RANGE running + moving aggregates, ntile/percent_rank/cume_dist",
)

# Regex + string kernel surface (Java regex vs RE2: patterns restricted to
# the common subset — char classes, +, anchors).
_q(
    "str_regex_funcs",
    """
SELECT p_partkey,
       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
       REGEXP_REPLACE(p_name, '[aeiou]', '_') AS devoweled,
       LPAD(CAST(p_partkey AS STRING), 8, '0') AS padded_key,
       RPAD(p_brand, 12, '.') AS padded_brand,
       TRANSLATE(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
       REPEAT('-', CAST(p_size % 5 AS INT)) AS dashes,
       REVERSE(p_brand) AS rev_brand,
       CAST(INSTR(p_name, 'a') AS INT) AS first_a,
       LEFT(p_name, 5) AS name_l5,
       RIGHT(p_name, 5) AS name_r5,
       CAST(LENGTH(TRIM(p_name)) AS INT) AS trim_len
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
""",
    "regex extract/replace + lpad/rpad/translate/repeat/reverse/instr/left/right",
    oracle="""
SELECT p_partkey,
       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
       REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       RPAD(p_brand, 12, '.') AS padded_brand,
       TRANSLATE(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
       REPEAT('-', CAST(p_size % 5 AS INT)) AS dashes,
       REVERSE(p_brand) AS rev_brand,
       CAST(STRPOS(p_name, 'a') AS INT) AS first_a,
       LEFT(p_name, 5) AS name_l5,
       RIGHT(p_name, 5) AS name_r5,
       CAST(LENGTH(TRIM(p_name)) AS INT) AS trim_len
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
""",
)

# LIST construction + higher-order functions (transform/filter/aggregate —
# Spark HOFs stay in codegen; DuckDB spells them list_*).
_q(
    "array_map_funcs",
    """
SELECT n_nationkey,
       ARRAY_JOIN(TRANSFORM(ARRAY(n_nationkey, n_regionkey, n_nationkey + n_regionkey), x -> CAST(x AS STRING)), ',') AS trip,
       ARRAY_JOIN(TRANSFORM(SEQUENCE(1, CAST(n_regionkey + 2 AS INT)), x -> CAST(x AS STRING)), ',') AS seq,
       ARRAY_JOIN(TRANSFORM(SEQUENCE(1, CAST(n_regionkey + 2 AS INT)), x -> CAST(x * x AS STRING)), ',') AS squares,
       ARRAY_JOIN(TRANSFORM(FILTER(SEQUENCE(1, CAST(n_nationkey % 6 + 1 AS INT)), x -> x % 2 = 0), x -> CAST(x AS STRING)), ',') AS evens,
       CAST(AGGREGATE(SEQUENCE(1, CAST(n_nationkey % 6 + 1 AS INT)), 0, (acc, x) -> acc + x) AS INT) AS seq_sum,
       ARRAY_CONTAINS(ARRAY(n_nationkey, n_regionkey), 3) AS has_three,
       ARRAY_JOIN(TRANSFORM(SORT_ARRAY(ARRAY(n_nationkey, n_regionkey), false), x -> CAST(x AS STRING)), ',') AS sorted_desc,
       ARRAY_JOIN(TRANSFORM(SLICE(SEQUENCE(1, 10), CAST(n_regionkey + 1 AS INT), 3), x -> CAST(x AS STRING)), ',') AS sliced,
       ELEMENT_AT(MAP('nk', n_nationkey, 'rk', n_regionkey), 'rk') AS map_rk
FROM nation
ORDER BY n_nationkey
""",
    "array/map construction + transform/filter/aggregate higher-order funcs"
    " (arrays serialized to CSV strings: the driver's pandas canonicalizer"
    " cannot sort/hash list cells — round-5 verdict item 1)",
    oracle="""
SELECT n_nationkey,
       ARRAY_TO_STRING([n_nationkey, n_regionkey, n_nationkey + n_regionkey], ',') AS trip,
       ARRAY_TO_STRING(range(1, CAST(n_regionkey + 3 AS INT)), ',') AS seq,
       ARRAY_TO_STRING(list_transform(range(1, CAST(n_regionkey + 3 AS INT)), x -> x * x), ',') AS squares,
       COALESCE(ARRAY_TO_STRING(list_filter(range(1, CAST(n_nationkey % 6 + 2 AS INT)), x -> x % 2 = 0), ','), '') AS evens,
       CAST(list_sum(range(1, CAST(n_nationkey % 6 + 2 AS INT))) AS INT) AS seq_sum,
       list_contains([n_nationkey, n_regionkey], 3) AS has_three,
       ARRAY_TO_STRING(list_reverse_sort([n_nationkey, n_regionkey]), ',') AS sorted_desc,
       ARRAY_TO_STRING(list_slice(range(1, 11), CAST(n_regionkey + 1 AS INT), CAST(n_regionkey + 3 AS INT)), ',') AS sliced,
       MAP(['nk', 'rk'], [n_nationkey, n_regionkey])['rk'][1] AS map_rk
FROM nation
ORDER BY n_nationkey
""",
)

# JSON extraction over events.props ('{"k": <int>}') — the semi-structured
# column path a training-data pipeline hits constantly.
_q(
    "json_funcs",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(GET_JSON_OBJECT(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(GET_JSON_OBJECT(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(GET_JSON_OBJECT(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "JSON field extraction + typed aggregation over a JSON string column",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)


# Pearson correlation + sample covariance from exact integer moments
# (native one-pass CORR/COVAR over doubles is engine-order-dependent; the
# moment formulation is exact, associative, and partial-agg safe). The
# squared-cents moments are ~1e14/row, so the sums run in DECIMAL(38,0):
# BIGINT sums overflowed at the 10x scale gate (scale_check.py), and
# decimal keeps the moments exact to ~1e38 (~1e24 rows/group).
_q(
    "agg_corr_covar",
    f"""
SELECT l_returnflag,
       ROUND((n * sxy - sx * sy) / (n - 1) / n, 4) AS covar_qty_price,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS corr_qty_price
FROM (
    SELECT l_returnflag,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST({whole('l_quantity')} AS DECIMAL(38,0))) AS DOUBLE) AS sx,
           CAST(SUM(CAST({cents('l_extendedprice')} AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sy,
           CAST(SUM(CAST({whole('l_quantity')} * {whole('l_quantity')} AS DECIMAL(38,0))) AS DOUBLE) AS sx2,
           CAST(SUM(CAST({cents('l_extendedprice')} * {cents('l_extendedprice')} AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS sy2,
           CAST(SUM(CAST({whole('l_quantity')} * {cents('l_extendedprice')} AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sxy
    FROM lineitem
    GROUP BY l_returnflag
) m
ORDER BY l_returnflag
""",
    "correlation + covariance from exact integer moments",
)

# approx_percentile: GK-sketch values are engine-specific, so the raw
# estimates can't be hash-compared — instead the query returns EXACT
# interpolated percentiles (oracle = DuckDB quantile_cont, same definition)
# plus booleans asserting the sketch estimate landed within a small bound of
# the exact value (rank error 1/accuracy=1e-4 -> value error well inside 1
# quantity unit / 1% of p90 price). Deterministic for a fixed dataset; the
# oracle's TRUE literals make the hash gate enforce the bound.
_q(
    "agg_approx_percentile",
    """
SELECT l_returnflag,
       ROUND(PERCENTILE(l_quantity, 0.5), 6) AS exact_median_qty,
       ROUND(PERCENTILE(l_extendedprice, 0.9), 4) AS exact_p90_price,
       ABS(APPROX_PERCENTILE(l_quantity, 0.5, 10000)
           - PERCENTILE(l_quantity, 0.5)) <= 1.0 AS median_within_bound,
       ABS(APPROX_PERCENTILE(l_extendedprice, 0.9, 10000)
           - PERCENTILE(l_extendedprice, 0.9))
           <= 0.01 * PERCENTILE(l_extendedprice, 0.9) AS p90_within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    "approx_percentile (GK sketch) with oracle-enforced error bound",
    oracle="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS exact_median_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS exact_p90_price,
       TRUE AS median_within_bound,
       TRUE AS p90_within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)


# Hypertable-style multi-resolution rollup: hour/day/total aggregates of the
# events stream in ONE scan via grouping sets (the continuous-aggregate
# pattern; at scale each resolution would be materialized incrementally, but
# the single-pass grouping-sets plan is the batch/backfill form).
_q(
    "ev_multi_rollup",
    """
SELECT day, hour,
       CAST(GROUPING(day) AS INT) AS g_day,
       CAST(GROUPING(hour) AS INT) AS g_hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
    SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
           DATE_TRUNC('hour', ts) AS hour,
           value
    FROM events
) t
GROUP BY GROUPING SETS ((day, hour), (day), ())
ORDER BY day NULLS FIRST, hour NULLS FIRST
""",
    "multi-resolution time rollup (hour/day/total) in one grouping-sets scan",
)


# Bag-semantics set operations (multiset EXCEPT ALL / INTERSECT ALL keep
# duplicate multiplicities — the distinct variants are in coverage.py).
_q(
    "setop_bag_all",
    """
SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey <= 400
    EXCEPT ALL
    SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey <= 200
) t GROUP BY v
UNION ALL
SELECT v + 100 AS v, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey <= 400
    INTERSECT ALL
    SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey <= 200
) t GROUP BY v
ORDER BY v
""",
    "EXCEPT ALL / INTERSECT ALL: multiset semantics with multiplicities",
)

# LATERAL correlated subquery (top-2 customers per nation) — plans as a
# lateral join; deterministic via unique (acctbal, custkey) tiebreak.
_q(
    "lateral_topk",
    """
SELECT n_name, t.c_name, t.bal_cents
FROM nation,
LATERAL (
    SELECT c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE c_nationkey = n_nationkey
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 2
) t
ORDER BY n_name, bal_cents DESC, c_name
""",
    "LATERAL subquery: per-group top-k via correlated derived table",
)


COVERAGE3_QUERIES: dict[str, QueryDef] = dict(_Q)

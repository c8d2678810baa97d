"""TPC-H-derived query suite, adapted to the driver's trimmed star schema.

The reference's correctness gate runs the 22 SQLBench-H queries
(``/root/reference/tpch/queries/q1.sql .. q22.sql``) and validates every
result against a single-process oracle
(``/root/reference/tpch/tpcbench.py:133-139``). This module reproduces that
suite against the driver testdata schema (FIXTURES.md), which omits
``partsupp`` and the comment/address/phone columns — queries whose predicates
relied on those (q2, q4, q9, q11, q12, q13, q16, q19, q20, q21, q22) are
re-expressed with predicates over existing columns while keeping the exact
operator shape of the original (correlated scalar subqueries, EXISTS /
NOT EXISTS, IN / NOT IN, left outer joins, HAVING over aggregates,
CASE-WHEN conditional aggregation, top-k, views/CTEs, interval arithmetic).

Dual-dialect texts: every query here is a single SQL string executed verbatim
by BOTH Spark SQL and the DuckDB oracle. Cross-engine hash-equality of
floating-point aggregates is guaranteed by the integer-cents idiom (see
:func:`cents` / :func:`isum`): the 2-decimal money columns are recovered as
exact BIGINTs, all arithmetic and aggregation stays 64-bit integer (exact,
associative — shuffle/partial-agg order cannot change the result), and the
final conversion to dollars is the identical double expression in both
engines. Plain SUM/AVG over doubles would differ between engines in the
last ulps depending on accumulation order; wide-DECIMAL sums are exact but
benched ~5x slower than the integer path because they leave Spark's compact
long-backed decimal representation.

Every ORDER BY ... LIMIT carries a unique tiebreaker column so the selected
row *set* is deterministic (the reference relies on same-engine comparison
and does not need this; a cross-engine oracle does — SURVEY.md §7.4.4).
Timestamp outputs are projected as DATE (the TPC-H columns are semantically
dates; the driver testdata stores them as timestamp[ms]) so the oracle
comparison never depends on timezone metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QueryDef:
    """One suite query: a dual-dialect SQL text plus optional per-engine
    overrides (used when Spark and DuckDB need different surface syntax)."""

    name: str
    sql: str
    description: str = ""
    oracle: str | None = None  # defaults to `sql`
    tables: tuple[str, ...] = field(default=())
    rows_only: bool = False  # engine-specific result (e.g. HLL): no oracle

    @property
    def oracle_sql(self) -> str | None:
        if self.rows_only:
            return None
        return self.oracle or self.sql


def dsum(expr: str, alias: str, scale: int = 6) -> str:
    """Deterministic cross-engine double sum (see module docstring)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE) AS {alias}"


def cents(col: str) -> str:
    """Exact integer-cents view of a 2-decimal column stored as double.

    The stored double is within 1e-10 of the true cent value, so
    ROUND(x*100) recovers that integer exactly in both engines (never near
    a .5 boundary). All downstream arithmetic is 64-bit integer: exact,
    associative (partial aggregation safe), engine-independent, AND on the
    fast codegen path — wide-decimal aggregation benched ~5x slower.
    """
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def whole(col: str) -> str:
    """Exact integer view of an integral-valued double column."""
    return f"CAST(ROUND({col}) AS BIGINT)"


def isum(expr_int: str, alias: str, div: int = 1) -> str:
    """Deterministic money sum: exact BIGINT sum, converted to dollars.

    Both engines compute the identical integer sum, then the identical
    double conversion/division. Overflow headroom: the widest unit here is
    1e-6 dollars (sum_charge), ~3e10/row — safe to ~3e8 rows per group
    (≈TPC-H SF500 per group). Beyond that, pre-aggregate per partition
    before the final merge or fall back to DECIMAL sums.
    """
    body = f"CAST(SUM({expr_int}) AS DOUBLE)"
    return f"{body} / {div} AS {alias}" if div != 1 else f"{body} AS {alias}"


#: Exact integer forms of the TPC-H money expressions.
#: DISC_PRICE_INT is in 1e-4 dollars; CHARGE_INT in 1e-6 dollars.
DISC_PRICE_INT = f"{cents('l_extendedprice')} * (100 - {cents('l_discount')})"
CHARGE_INT = f"({DISC_PRICE_INT}) * (100 + {cents('l_tax')})"


_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description, oracle=oracle)


# --------------------------------------------------------------------------
# q1 — pricing summary report: scan + filter + grouped agg (sum/avg/count).
# Reference: tpch/queries/q1.sql (date cutoff shifted to this data's range).
_q(
    "q1",
    f"""
SELECT
    l_returnflag,
    l_linestatus,
    {isum(whole('l_quantity'), 'sum_qty')},
    {isum(cents('l_extendedprice'), 'sum_base_price', 100)},
    {isum(DISC_PRICE_INT, 'sum_disc_price', 10000)},
    {isum(CHARGE_INT, 'sum_charge', 1000000)},
    CAST(SUM({whole('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
    CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
    CAST(SUM({cents('l_discount')}) AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
    CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-12-01' - INTERVAL '90' DAY
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "pricing summary: filter + group-by + sum/avg/count (ref q1.sql)",
)

# q2 — min-cost supplier: correlated scalar subquery + multi-column sort +
# top-k. Reference q2.sql used partsupp/ps_supplycost; adapted to min
# s_acctbal among suppliers that shipped the part, same subquery shape.
_q(
    "q2",
    """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (
      SELECT MIN(s2.s_acctbal)
      FROM supplier s2, lineitem l2, nation n2, region r2
      WHERE l2.l_partkey = p_partkey
        AND s2.s_suppkey = l2.l_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    "min-cost supplier: correlated scalar MIN subquery + top-k (ref q2.sql)",
)

# q3 — shipping priority: 3-way join + grouped agg + top-k by revenue.
_q(
    "q3",
    f"""
SELECT
    l_orderkey,
    {isum(DISC_PRICE_INT, 'revenue', 10000)},
    CAST(o_orderdate AS DATE) AS o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    "shipping priority: join + group + top-k (ref q3.sql)",
)

# q4 — order priority checking: EXISTS correlated subquery. Reference used
# l_commitdate < l_receiptdate; adapted to "shipped >30 days after order".
_q(
    "q4",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT * FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL '30' DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "order priority: correlated EXISTS -> semi join (ref q4.sql)",
)

# q5 — local supplier volume: 6-way join through region.
_q(
    "q5",
    f"""
SELECT n_name, {isum(DISC_PRICE_INT, 'revenue', 10000)}
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    "local supplier volume: 6-way join + agg (ref q5.sql)",
)

# q6 — forecasting revenue change: pure scan-filter-agg.
_q(
    "q6",
    f"""
SELECT {isum(cents("l_extendedprice") + " * " + cents("l_discount"), "revenue", 10000)}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "forecast revenue: scan + multi-predicate filter + global agg (ref q6.sql)",
)

# q7 — volume shipping: self-joined nation pair + year extraction.
_q(
    "q7",
    f"""
SELECT supp_nation, cust_nation, l_year, {isum('volume', 'revenue', 10000)}
FROM (
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        {DISC_PRICE_INT} AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    "volume shipping: nation self-join pair + EXTRACT(year) (ref q7.sql)",
)

# q8 — national market share: 8-way join + conditional share-of-total.
_q(
    "q8",
    f"""
SELECT
    o_year,
    CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
      / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
    SELECT
        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        {DISC_PRICE_INT} AS volume,
        n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    "market share: 8-way join + CASE share-of-total (ref q8.sql)",
)

# q9 — product type profit: LIKE filter + year rollup. Reference used
# ps_supplycost (partsupp); profit re-expressed as discounted revenue.
_q(
    "q9",
    f"""
SELECT nation, o_year, {isum('amount', 'sum_profit', 10000)}
FROM (
    SELECT
        n_name AS nation,
        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        {DISC_PRICE_INT} AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    "product profit: LIKE + multi-join + group by nation/year (ref q9.sql)",
)

# q10 — returned item reporting: top-20 customers by lost revenue.
_q(
    "q10",
    f"""
SELECT
    c_custkey,
    c_name,
    {isum(DISC_PRICE_INT, 'revenue', 10000)},
    c_acctbal,
    n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    "returned items: join + group + top-20 (ref q10.sql)",
)

# q11 — important stock: HAVING against a global scalar subquery. Reference
# grouped partsupp value by part; adapted to lineitem value per part.
_q(
    "q11",
    f"""
SELECT
    l_partkey,
    CAST(SUM({cents("l_extendedprice")} * {whole("l_quantity")}) AS DOUBLE) / 100 AS part_value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_regionkey IN (0, 1)
GROUP BY l_partkey
HAVING CAST(SUM({cents("l_extendedprice")} * {whole("l_quantity")}) AS DOUBLE) > (
    SELECT CAST(SUM({cents("l_extendedprice")} * {whole("l_quantity")}) AS DOUBLE) * 0.005
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey IN (0, 1))
ORDER BY part_value DESC, l_partkey
""",
    "important stock: HAVING > global scalar subquery (ref q11.sql)",
)

# q12 — shipping modes: CASE-WHEN conditional counts. Reference grouped by
# l_shipmode with commit/receipt lateness; adapted to returnflag + lateness
# vs order date.
_q(
    "q12",
    """
SELECT
    l_returnflag,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL '60' DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    "late shipments: CASE-WHEN conditional counts (ref q12.sql)",
)

# q13 — customer distribution: LEFT OUTER JOIN + double aggregation.
# Reference filtered o_comment NOT LIKE; adapted to a priority filter.
_q(
    "q13",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "customer distribution: left join + nested aggregation (ref q13.sql)",
)

# q14 — promotion effect: conditional share of revenue.
_q(
    "q14",
    f"""
SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE_INT} ELSE 0 END) AS DOUBLE) * 100
      / CAST(SUM({DISC_PRICE_INT}) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    "promotion effect: CASE share of revenue (ref q14.sql)",
)

# q15 — top supplier: CTE (reference uses CREATE VIEW; the view form is
# exercised via DFRayContext.sql in tests) + scalar MAX subquery with exact
# double equality (safe: both sides derive from the same decimal sum).
_q(
    "q15",
    f"""
WITH revenue0 AS (
    SELECT l_suppkey AS supplier_no, {isum(DISC_PRICE_INT, 'total_revenue', 10000)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
    "top supplier: CTE/view + scalar MAX subquery (ref q15.sql)",
)

# q16 — part/supplier relationship: COUNT(DISTINCT) + NOT IN subquery.
# Reference used partsupp + comment LIKE; adapted via lineitem + acctbal.
_q(
    "q16",
    """
SELECT
    p_brand,
    p_type,
    p_size,
    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25, 28)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    "parts/supplier: COUNT DISTINCT + NOT IN anti-join (ref q16.sql)",
)

# q17 — small-quantity-order revenue: correlated scalar AVG subquery.
# (AVG over integral-valued doubles is exact, so the 0.2*avg threshold is
# engine-independent.)
_q(
    "q17",
    f"""
SELECT CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) / 100 / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
""",
    "small-qty revenue: correlated scalar AVG subquery (ref q17.sql)",
)

# q18 — large volume customers: IN over grouped HAVING subquery + top-k.
_q(
    "q18",
    f"""
SELECT
    c_name,
    c_custkey,
    o_orderkey,
    CAST(o_orderdate AS DATE) AS o_orderdate,
    o_totalprice,
    {isum(whole('l_quantity'), 'sum_qty')}
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 150)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
    "large-volume customers: IN + HAVING subquery + top-k (ref q18.sql)",
)

# q19 — discounted revenue: disjunction of conjunctive range predicates.
# Reference used p_container/l_shipmode; adapted to brand/size/quantity.
_q(
    "q19",
    f"""
SELECT {isum(DISC_PRICE_INT, 'revenue', 10000)}
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
       AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
       AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
       AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
""",
    "discounted revenue: OR-of-ANDs join predicates (ref q19.sql)",
)

# q20 — potential part promotion: nested IN + grouped HAVING threshold.
_q(
    "q20",
    """
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 50)
  AND s_nationkey = n_nationkey
  AND n_regionkey IN (0, 1, 2)
ORDER BY s_name
""",
    "part promotion: nested IN + HAVING threshold (ref q20.sql)",
)

# q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS self-joins.
# "Late" re-expressed as shipped >45 days after order date.
_q(
    "q21",
    """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL '45' DAY
  AND EXISTS (
      SELECT * FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT * FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL '45' DAY)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_1'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    "waiting suppliers: EXISTS + NOT EXISTS self-joins (ref q21.sql)",
)

# q22 — global sales opportunity: SUBSTRING buckets + uncorrelated AVG
# subquery + NOT EXISTS anti-join. Reference used c_phone country codes;
# adapted to the trailing digit of c_name.
_q(
    "q22",
    f"""
SELECT
    cntrycode,
    CAST(COUNT(*) AS BIGINT) AS numcust,
    {isum(cents('c_acctbal'), 'totacctbal', 100)}
FROM (
    SELECT SUBSTRING(c_name, 18, 1) AS cntrycode, c_custkey, c_acctbal
    FROM customer
    WHERE SUBSTRING(c_name, 18, 1) IN ('1', '2', '3', '4', '5', '6', '7')
      AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer
          WHERE c_acctbal > 0.00
            AND SUBSTRING(c_name, 18, 1) IN ('1', '2', '3', '4', '5', '6', '7'))
) custsale
WHERE NOT EXISTS (
    SELECT * FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
ORDER BY cntrycode
""",
    "sales opportunity: SUBSTRING + AVG subquery + NOT EXISTS (ref q22.sql)",
)


TPCH_QUERIES: dict[str, QueryDef] = dict(_Q)

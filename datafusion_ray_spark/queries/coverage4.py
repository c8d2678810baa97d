"""Operator coverage, batch 4: math/bitwise kernels, FILTER-clause
aggregates, recursive CTEs.

Completes the DataFusion scalar/aggregate surface the earlier batches left:
the math function library (`datafusion.proto` carries these as named scalar
UDFs), conditional aggregation via the standard FILTER clause, and
WITH RECURSIVE (supported by both Spark 4 and DuckDB; DataFusion exposes
recursive CTEs too). Float math is rounded to 6 decimals — JVM and DuckDB
libm agree to the ulp at these magnitudes. Bitwise spellings differ
(Spark ``SHIFTLEFT``/``^`` vs DuckDB ``<<``/``xor``), so those get oracle
overrides.
"""

from __future__ import annotations

from .tpch import QueryDef, cents

_Q: dict[str, QueryDef] = {}


def _q(name: str, sql: str, description: str, oracle: str | None = None) -> None:
    _Q[name] = QueryDef(name=name, sql=sql.strip(), description=description,
                        oracle=oracle.strip() if oracle else None)


_MATH_COMMON = """
SELECT p_partkey,
       ROUND(LN(p_retailprice), 6) AS ln_p,
       ROUND(LOG10(p_retailprice), 6) AS log10_p,
       ROUND(EXP(p_size / 25.0), 6) AS exp_s,
       ROUND(POWER(CAST(p_size AS DOUBLE), 2), 1) AS pow_s,
       CAST(SIGN(p_size - 25) AS INT) AS sgn,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS flr,
       CAST(CEIL(p_retailprice) AS BIGINT) AS cl,
       ROUND(SIN(p_size / 10.0), 6) AS sin_s,
       ROUND(ATAN2(CAST(p_size AS DOUBLE), 10.0), 6) AS at2,
       ROUND(DEGREES(1.0), 4) AS deg,
       CAST(p_size & 12 AS INT) AS band,
       CAST(p_size | 3 AS INT) AS bor,
       {shl} AS shl,
       {shr} AS shr,
       {bxor} AS bxor
FROM part
WHERE p_partkey <= 100
ORDER BY p_partkey
"""

_q(
    "math_bit_funcs",
    _MATH_COMMON.format(
        shl="CAST(SHIFTLEFT(p_size, 2) AS INT)",
        shr="CAST(SHIFTRIGHT(p_size, 1) AS INT)",
        bxor="CAST(p_size ^ 21 AS INT)",
    ),
    "math library (ln/log/exp/pow/trig) + bitwise and/or/xor/shifts",
    oracle=_MATH_COMMON.format(
        shl="CAST(p_size << 2 AS INT)",
        shr="CAST(p_size >> 1 AS INT)",
        bxor="CAST(xor(p_size, 21) AS INT)",
    ),
)

# Standard-SQL conditional aggregation (FILTER clause).
_q(
    "agg_filter_clause",
    f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(SUM({cents('o_totalprice')}) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents,
       CAST(MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'F') AS DATE) AS first_finished
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "FILTER (WHERE ...) conditional aggregates",
)

# Recursive CTE: factorial table joined against a real table to prove the
# recursion composes with scans.
_q(
    "recursive_cte",
    """
WITH RECURSIVE fact(n, f) AS (
    SELECT 1, CAST(1 AS BIGINT)
    UNION ALL
    SELECT n + 1, f * (n + 1) FROM fact WHERE n < 12
)
SELECT fact.n, fact.f AS factorial, r.r_name
FROM fact LEFT JOIN region r ON fact.n - 1 = r.r_regionkey
ORDER BY fact.n
""",
    "WITH RECURSIVE: iterative CTE composed with a table join",
)



# --- LLM-pipeline entries expressible as pure SQL over `documents` --------

# Deterministic hash-based train/eval split (the standard "split by content
# hash so reshuffles and re-runs keep rows in the same split" pattern).
# First md5 hex char < 'd' selects 13/16 ~ 81% for train; string comparison
# is identical across engines.
_q(
    "split_train_test",
    """
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT CASE WHEN SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 1) < 'd'
                THEN 'train' ELSE 'eval' END AS split,
           n_chars
    FROM documents
) t
GROUP BY split
ORDER BY split
""",
    "deterministic md5-hash train/eval split",
    oracle="""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
    SELECT CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
                THEN 'train' ELSE 'eval' END AS split,
           n_chars
    FROM documents
) t
GROUP BY split
ORDER BY split
""",
)

# Text normalization: strip non-alphanumerics, collapse whitespace, case-
# fold; emit the normalized fingerprint (what exact-dedup would key on
# after normalization).
_q(
    "text_normalize",
    """
SELECT doc_id,
       CAST(LENGTH(norm) AS INT) AS norm_len,
       MD5(norm) AS norm_hash
FROM (
    SELECT doc_id,
           LOWER(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', ''), ' +', ' '))) AS norm
    FROM documents
) t
""",
    "text normalization: strip/casefold/collapse + normalized hash "
    "(no cosmetic global sort: range-partition sampling would re-execute "
    "the regex projection — measured 2x wall at 100x)",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(norm) AS INT) AS norm_len,
       MD5(norm) AS norm_hash
FROM (
    SELECT doc_id,
           LOWER(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm
    FROM documents
) t
""",
)

# Benchmark-contamination check: flag documents containing any blocklisted
# phrase (broadcast join against the tiny phrase table; POSITION spelling is
# shared by both engines).
_q(
    "contamination_check",
    """
WITH blocklist AS (
    SELECT 'table value part' AS phrase
    UNION ALL SELECT 'data column agg'
    UNION ALL SELECT 'no such phrase anywhere'
)
SELECT d.doc_id,
       CAST(COUNT(b.phrase) AS BIGINT) AS n_hits,
       COUNT(b.phrase) > 0 AS contaminated
FROM documents d
LEFT JOIN blocklist b ON POSITION(b.phrase IN d.text) > 0
GROUP BY d.doc_id
ORDER BY d.doc_id
""",
    "contamination check: phrase-blocklist hits per document",
)


# IGNORE NULLS window navigation (gap-filling / last-observation-carried-
# forward — the time-series pattern). NULLs synthesized with NULLIF.
_q(
    "win_ignore_nulls",
    """
SELECT c_custkey,
       LAST_VALUE(v) IGNORE NULLS OVER w AS locf,
       FIRST_VALUE(v) IGNORE NULLS OVER w AS first_seen,
       LEAD(v) IGNORE NULLS OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS next_v
FROM (
    SELECT c_custkey, c_nationkey,
           NULLIF(CAST(ROUND(c_acctbal * 100) AS BIGINT) % 7, 0) AS v
    FROM customer
    WHERE c_custkey <= 200
) t
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY c_custkey
""",
    "IGNORE NULLS window navigation (LOCF gap-fill pattern)",
    oracle="""
SELECT c_custkey,
       LAST_VALUE(v IGNORE NULLS) OVER w AS locf,
       FIRST_VALUE(v IGNORE NULLS) OVER w AS first_seen,
       LEAD(v IGNORE NULLS) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS next_v
FROM (
    SELECT c_custkey, c_nationkey,
           NULLIF(CAST(ROUND(c_acctbal * 100) AS BIGINT) % 7, 0) AS v
    FROM customer
    WHERE c_custkey <= 200
) t
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY c_custkey
""",
)

# NULL semantics: null-safe equality, IS DISTINCT FROM, NULL grouping.
_q(
    "null_semantics",
    """
SELECT g,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS DISTINCT FROM 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_from_1,
       CAST(SUM(CASE WHEN v <=> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_1
FROM (
    SELECT NULLIF(n_nationkey % 3, 2) AS g,
           NULLIF(n_regionkey % 2, 0) AS v
    FROM nation
) t
GROUP BY g
ORDER BY g NULLS FIRST
""",
    "null semantics: IS DISTINCT FROM, null-safe equality, NULL group keys",
    oracle="""
SELECT g,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       CAST(SUM(CASE WHEN v IS DISTINCT FROM 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_from_1,
       CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_1
FROM (
    SELECT NULLIF(n_nationkey % 3, 2) AS g,
           NULLIF(n_regionkey % 2, 0) AS v
    FROM nation
) t
GROUP BY g
ORDER BY g NULLS FIRST
""",
)

# SQL PIVOT clause (the relational spelling of ev_daily_pivot's DataFrame
# groupBy().pivot()); oracle states the same matrix as portable CASE sums.
_q(
    "pivot_sql",
    """
SELECT o_orderpriority,
       CAST(COALESCE(f, 0) AS BIGINT) AS n_f,
       CAST(COALESCE(o, 0) AS BIGINT) AS n_o,
       CAST(COALESCE(p, 0) AS BIGINT) AS n_p
FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
PIVOT (COUNT(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
ORDER BY o_orderpriority
""",
    "SQL PIVOT clause: status-count matrix per priority",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# SQL UNPIVOT clause (wide -> long); oracle as UNION ALL stack.
_q(
    "unpivot_sql",
    """
SELECT n_nationkey, metric, val
FROM (
    SELECT n_nationkey,
           CAST(n_regionkey AS BIGINT) AS region_key,
           CAST(LENGTH(n_name) AS BIGINT) AS name_len
    FROM nation
)
UNPIVOT (val FOR metric IN (region_key, name_len))
ORDER BY n_nationkey, metric
""",
    "SQL UNPIVOT clause: wide-to-long metric stack",
    oracle="""
SELECT n_nationkey, metric, val FROM (
    SELECT n_nationkey, 'region_key' AS metric, CAST(n_regionkey AS BIGINT) AS val FROM nation
    UNION ALL
    SELECT n_nationkey, 'name_len' AS metric, CAST(LENGTH(n_name) AS BIGINT) AS val FROM nation
) t
ORDER BY n_nationkey, metric
""",
)

# Deterministic stratified sampling: per-stratum md5-hash rate (reproducible
# across runs/engines, unlike TABLESAMPLE). 'en' strata keep first hex char
# < '8' (8/16 = 50%); other languages keep < '4' (25%).
_q(
    "sample_stratified",
    """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 1)
      < CASE WHEN lang = 'en' THEN '8' ELSE '4' END
GROUP BY lang
ORDER BY lang
""",
    "deterministic stratified sampling via per-stratum hash rates",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1)
      < CASE WHEN lang = 'en' THEN '8' ELSE '4' END
GROUP BY lang
ORDER BY lang
""",
)

# RFM (recency/frequency/monetary) segmentation — the customer-analytics
# staple: per-user metrics then deterministic NTILE(4) quartiles (ties
# broken by user_id so the assignment is engine-exact; quartile 1 = most
# recent / most frequent / highest spend). Monetary is summed in integer
# micro-units.
_q(
    "ev_user_rfm",
    """
WITH m AS (
    SELECT user_id,
           MAX(unix_micros(ts)) AS last_us,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS mon_us
    FROM events GROUP BY user_id
),
q AS (
    -- ORDER BY (now_us - last_us, user_id) with the corpus-constant
    -- now_us is the identical total order as (last_us DESC NULLS FIRST,
    -- user_id) — a NULL last_us made the subtraction NULL, which sorts
    -- first ascending — so the recency quartile needs no global-max CTE:
    -- the old g leg re-planned the whole per-user aggregate (a second
    -- events scan) for one subtrahend that cancels out of the ordering
    -- (r11).
    SELECT user_id,
           CAST(NTILE(4) OVER (ORDER BY last_us DESC NULLS FIRST, user_id)
                AS INT) AS r_q,
           CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS INT) AS f_q,
           CAST(NTILE(4) OVER (ORDER BY mon_us DESC, user_id) AS INT) AS m_q,
           freq, mon_us
    FROM m
)
SELECT user_id, r_q, f_q, m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code,
       freq, mon_us
FROM q
ORDER BY user_id
""",
    "RFM segmentation: per-user quartiles with deterministic tie-break",
    oracle="""
WITH m AS (
    SELECT user_id,
           MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS mon_us
    FROM events GROUP BY user_id
),
g AS (SELECT MAX(last_us) AS now_us FROM m),
q AS (
    SELECT user_id,
           CAST(NTILE(4) OVER (ORDER BY now_us - last_us, user_id) AS INT) AS r_q,
           CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS INT) AS f_q,
           CAST(NTILE(4) OVER (ORDER BY mon_us DESC, user_id) AS INT) AS m_q,
           freq, mon_us
    FROM m CROSS JOIN g
)
SELECT user_id, r_q, f_q, m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm_code,
       freq, mon_us
FROM q
ORDER BY user_id
""",
)

COVERAGE4_QUERIES: dict[str, QueryDef] = dict(_Q)

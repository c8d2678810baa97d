"""Round-3 extension-suite additions: temporal interval/nearest joins,
event derivations (SCD-2, EWMA, winsorize, funnel), SQ8 ANN, PageRank.

Same contract as ``suite.py``: every entry pairs a Spark callable with an
independently-written DuckDB oracle recomputing identical semantics, with
all value paths either integer-exact or rounded at 6 dp so the driver's
value-hash comparison certifies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .eventops import EWMA_WEIGHTS


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Interval-overlap join

INTERVAL_L_MIN = 360  # view intervals: [ts, ts + 6 h]
INTERVAL_R_MIN = 180  # click intervals: [ts, ts + 3 h]


def run_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .rangejoin import interval_overlap_join

    ev = _events(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return interval_overlap_join(
        views, clicks,
        left_minutes=INTERVAL_L_MIN, right_minutes=INTERVAL_R_MIN,
    ).orderBy("l_event_id", "r_event_id")


INTERVAL_JOIN_ORACLE = f"""
WITH v AS (
    SELECT event_id, user_id, epoch_us(ts) AS s,
           epoch_us(ts) + {INTERVAL_L_MIN * 60 * 1_000_000} AS e
    FROM events WHERE event_type = 'view'
),
c AS (
    SELECT event_id, user_id, epoch_us(ts) AS s,
           epoch_us(ts) + {INTERVAL_R_MIN * 60 * 1_000_000} AS e
    FROM events WHERE event_type = 'click'
)
SELECT v.event_id AS l_event_id, c.event_id AS r_event_id,
       CAST((least(v.e, c.e) - greatest(v.s, c.s)) // 1000000 AS BIGINT)
           AS overlap_s
FROM v JOIN c ON v.user_id = c.user_id AND v.s <= c.e AND c.s <= v.e
ORDER BY l_event_id, r_event_id
"""


# ---------------------------------------------------------------------------
# Nearest-direction as-of join (tolerance 45 min)

NEAREST_TOL_MIN = 45


def run_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        clicks, views, direction="nearest",
        tolerance_seconds=NEAREST_TOL_MIN * 60,
    ).orderBy("event_id")


ASOF_NEAREST_ORACLE = f"""
WITH clicks AS (
    SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
views AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'view'
),
b AS (
    SELECT c.event_id, v.ts AS bts, v.value AS bval
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
),
f AS (
    SELECT c.event_id, v.ts AS fts, v.value AS fval
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts <= v.ts
),
j AS (
    SELECT c.event_id, c.user_id, c.ts, c.value,
           CASE WHEN b.bts IS NOT NULL
                 AND c.ts - b.bts <= INTERVAL {NEAREST_TOL_MIN} MINUTE
                THEN b.bts END AS obts,
           CASE WHEN b.bts IS NOT NULL
                 AND c.ts - b.bts <= INTERVAL {NEAREST_TOL_MIN} MINUTE
                THEN b.bval END AS obval,
           CASE WHEN f.fts IS NOT NULL
                 AND f.fts - c.ts <= INTERVAL {NEAREST_TOL_MIN} MINUTE
                THEN f.fts END AS ofts,
           CASE WHEN f.fts IS NOT NULL
                 AND f.fts - c.ts <= INTERVAL {NEAREST_TOL_MIN} MINUTE
                THEN f.fval END AS ofval
    FROM clicks c
    JOIN b ON b.event_id = c.event_id
    JOIN f ON f.event_id = c.event_id
)
SELECT event_id, user_id, ts, value,
       CASE WHEN obts IS NOT NULL
             AND (ofts IS NULL OR (ts - obts) <= (ofts - ts))
            THEN obts ELSE ofts END AS r_ts,
       CASE WHEN obts IS NOT NULL
             AND (ofts IS NULL OR (ts - obts) <= (ofts - ts))
            THEN obval ELSE ofval END AS r_value
FROM j
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# SCD-2 snapshot (CDC -> validity intervals)


def run_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eventops import scd2_snapshot

    ev = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    # no cosmetic global sort on the corpus-scaled snapshot (SCALE.md
    # round-6 rule: range-partition sampling re-executes the two-window
    # child; gates sort canonically)
    return scd2_snapshot(ev)


SCD2_ORACLE = """
WITH p AS (
    SELECT user_id, event_id, ts,
           CAST(floor(value) AS BIGINT) % 5 AS tier
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT *,
           CASE WHEN LAG(tier) OVER w IS NULL
                  OR tier != LAG(tier) OVER w THEN 1 ELSE 0 END AS chg
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
v AS (
    SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS version
    FROM c
),
s AS (
    SELECT user_id, version, tier, MIN(ts) AS valid_from,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM v GROUP BY user_id, version, tier
)
SELECT user_id, CAST(version AS BIGINT) AS version, tier, valid_from,
       LEAD(valid_from) OVER wv AS valid_to,
       LEAD(valid_from) OVER wv IS NULL AS is_current,
       n_events
FROM s
WINDOW wv AS (PARTITION BY user_id ORDER BY version)
ORDER BY user_id, version
"""


# ---------------------------------------------------------------------------
# Bounded-frame EWMA feature


def run_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eventops import ewma_feature

    ev = _events(spark, sf_dir).where(F.col("event_type") == "purchase")
    return ewma_feature(ev)  # unordered: corpus-scaled output (r6 rule)


_W_LIST = "[" + ", ".join(str(w) for w in EWMA_WEIGHTS) + "]"

EWMA_ORACLE = f"""
WITH p AS (
    SELECT user_id, event_id, ts, value,
           CAST(floor(value * 1000000) AS BIGINT) AS xus,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
    FROM events WHERE event_type = 'purchase'
),
j AS (
    SELECT a.user_id, a.event_id, a.ts, a.value, b.xus,
           ({_W_LIST})[(a.rn - b.rn) + 1] AS w
    FROM p a JOIN p b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
)
SELECT user_id, event_id, ts, value,
       ROUND(SUM(xus * w) / SUM(w) / 1000000.0, 6) AS ewma
FROM j
GROUP BY user_id, event_id, ts, value
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# Percentile winsorization report


def run_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eventops import winsorize_stats

    return winsorize_stats(_events(spark, sf_dir)).orderBy("event_type")


WINSORIZE_ORACLE = """
WITH b AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS plo,
           quantile_cont(value, 0.95) AS phi
    FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(plo), 6) AS p_lo,
       ROUND(MIN(phi), 6) AS p_hi,
       CAST(SUM(CASE WHEN value < plo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_lo,
       CAST(SUM(CASE WHEN value > phi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_hi,
       ROUND(SUM(CAST(floor(least(greatest(value, plo), phi) * 1000000)
                      AS BIGINT)) / COUNT(*) / 1000000.0, 6)
           AS mean_winsorized
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


# ---------------------------------------------------------------------------
# Ordered-step funnel


def run_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .eventops import funnel_steps

    return funnel_steps(_events(spark, sf_dir)).orderBy("step_no")


FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t0 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t1
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t0
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t1
    GROUP BY e.user_id
)
SELECT CAST(1 AS INT) AS step_no, 'view' AS step,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT CAST(2 AS INT), 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT CAST(3 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
ORDER BY step_no
"""


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized ANN


def run_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import similarity
    from .shared import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sq8_ann_topk(
        emb, _query_vec(spark, sf_dir), k=10, exclude_vec_id=0
    )


def sq8_oracle(k: int = 10) -> str:
    from .similarity import DIM, SQ_LEVELS

    return f"""
WITH x AS (
    SELECT vec_id,
           list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xus
    FROM embeddings
),
u AS (
    SELECT vec_id, CAST(t.i AS INT) AS pos, xus[CAST(t.i AS INT)] AS v
    FROM x, range(1, {DIM + 1}) t(i)
),
st AS (
    SELECT pos, MIN(v) AS mn, MAX(v) - MIN(v) AS rg FROM u GROUP BY pos
),
codes AS (
    SELECT u.vec_id, u.pos,
           CASE WHEN st.rg = 0 THEN 0
                ELSE ((u.v - st.mn) * {SQ_LEVELS}) // st.rg END AS c
    FROM u JOIN st USING (pos)
),
q AS (SELECT pos, c AS qc FROM codes WHERE vec_id = 0)
SELECT codes.vec_id, CAST(SUM((c - qc) * (c - qc)) AS BIGINT) AS dist_u
FROM codes JOIN q USING (pos)
WHERE codes.vec_id != 0
GROUP BY codes.vec_id
ORDER BY dist_u ASC, vec_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Fixed-point PageRank over the nation trade graph


def run_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import pagerank_fixed_point, trade_edges

    t = {n: load_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "supplier", "nation")}
    edges = trade_edges(t["lineitem"], t["orders"], t["customer"],
                        t["supplier"], t["nation"])
    nodes = t["nation"].select(F.col("n_name").alias("node"))
    return pagerank_fixed_point(edges, nodes).orderBy(
        F.desc("rank_micro"), "node"
    )


def pagerank_oracle() -> str:
    from .graph import DAMP_MICRO, PAGERANK_ITERS, SCALE

    base_cte = """
e0 AS (
    SELECT n1.n_name AS src, n2.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
),
ow AS (SELECT src, SUM(w) AS outw FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, e0.w, ow.outw FROM e0 JOIN ow USING (src)),
nodes AS (SELECT n_name AS node FROM nation),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node,
              CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r
       FROM nodes)""".format(scale=SCALE)
    iters = []
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
r{i} AS (
    SELECT n.node,
           CAST((CAST({SCALE} - {DAMP_MICRO} AS BIGINT) * {SCALE}
                 // (SELECT n FROM nn)) // {SCALE}
                + (CAST({DAMP_MICRO} AS BIGINT)
                   * COALESCE(SUM((p.r * e.w) // e.outw), 0))
                  // {SCALE} AS BIGINT) AS r
    FROM nodes n
    LEFT JOIN e ON e.dst = n.node
    LEFT JOIN r{i - 1} p ON p.node = e.src
    GROUP BY n.node
)""")
    return (
        "WITH " + base_cte + "," + ",".join(iters)
        + f"\nSELECT node, r AS rank_micro FROM r{PAGERANK_ITERS} "
        f"ORDER BY rank_micro DESC, node"
    )


def extension_entries2() -> list:
    """Entries aggregated by queries/registry.py alongside the other suites."""
    from ..queries.registry import SuiteEntry

    return [
        SuiteEntry("join_interval", run_interval_join, INTERVAL_JOIN_ORACLE,
                   "interval×interval overlap join via bucketized "
                   "equi-join (exactly-once pairing, linear shuffle)"),
        SuiteEntry("join_asof_nearest", run_asof_nearest,
                   ASOF_NEAREST_ORACLE,
                   "nearest-direction as-of join with 45-min tolerance "
                   "(pandas direction='nearest'), single shuffle"),
        SuiteEntry("ev_scd2", run_scd2, SCD2_ORACLE,
                   "SCD type-2 build: change stream -> compressed "
                   "validity intervals (CDC dimension snapshot)"),
        SuiteEntry("ev_ewma", run_ewma, EWMA_ORACLE,
                   "per-user EWMA feature over last-8 frame, "
                   "integer-exact fixed-point weights"),
        SuiteEntry("ev_winsorize", run_winsorize, WINSORIZE_ORACLE,
                   "per-type percentile winsorization report "
                   "(broadcast bounds join)"),
        SuiteEntry("ev_funnel", run_funnel, FUNNEL_ORACLE,
                   "ordered-step conversion funnel (strictly-after "
                   "step matching, co-partitioned step joins)"),
        SuiteEntry("sim_ann_sq8", run_ann_sq8, sq8_oracle(),
                   "SQ8 scalar-quantized ANN: per-dim int8 codes, "
                   "integer inner-product scoring (4x compression)"),
        SuiteEntry("graph_pagerank", run_pagerank, pagerank_oracle(),
                   "fixed-point integer PageRank over the derived "
                   "nation trade graph (10 checkpointed iterations)"),
        SuiteEntry("sim_ann_sq8_rerank", run_ann_sq8_rerank,
                   sq8_rerank_oracle(),
                   "retrieve-then-rerank: SQ8 code prefilter to 50 "
                   "candidates, exact cosine rerank (FAISS refine shape)"),
    ]


# ---------------------------------------------------------------------------
# SQ8 prefilter + exact rerank (retrieve-then-rerank)

RERANK_CANDIDATES = 50


def run_ann_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import similarity
    from .shared import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sq8_rerank_topk(
        emb, _query_vec(spark, sf_dir), k=10,
        n_candidates=RERANK_CANDIDATES, exclude_vec_id=0,
    )


def sq8_rerank_oracle(k: int = 10) -> str:
    from .similarity import DIM, SQ_LEVELS
    from .shared import _DOT_DEC, _NORM_X

    return f"""
WITH x AS (
    SELECT vec_id,
           list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xus
    FROM embeddings
),
u AS (
    SELECT vec_id, CAST(t.i AS INT) AS pos, xus[CAST(t.i AS INT)] AS v
    FROM x, range(1, {DIM + 1}) t(i)
),
st AS (
    SELECT pos, MIN(v) AS mn, MAX(v) - MIN(v) AS rg FROM u GROUP BY pos
),
codes AS (
    SELECT u.vec_id, u.pos,
           CASE WHEN st.rg = 0 THEN 0
                ELSE ((u.v - st.mn) * {SQ_LEVELS}) // st.rg END AS c
    FROM u JOIN st USING (pos)
),
qc AS (SELECT pos, c AS qcode FROM codes WHERE vec_id = 0),
cand AS (
    SELECT codes.vec_id
    FROM codes JOIN qc USING (pos)
    WHERE codes.vec_id != 0
    GROUP BY codes.vec_id
    ORDER BY SUM((c - qcode) * (c - qcode)) ASC, vec_id
    LIMIT {RERANK_CANDIDATES}
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
prod AS (
    SELECT e.vec_id,
           CAST(unnest(e.embedding) AS DOUBLE) AS x,
           CAST(unnest((SELECT qe FROM q)) AS DOUBLE) AS y
    FROM embeddings e JOIN cand USING (vec_id)
),
agg AS (
    SELECT vec_id, {_DOT_DEC} AS dot, {_NORM_X} AS norm2
    FROM prod GROUP BY vec_id
),
qn AS (
    SELECT SQRT(CAST(SUM(CAST(CAST(u AS DOUBLE) * CAST(u AS DOUBLE)
        AS DECIMAL(28,14))) AS DOUBLE)) AS qnorm
    FROM (SELECT unnest(qe) AS u FROM q) t
)
SELECT vec_id, ROUND(dot / (SQRT(norm2) * (SELECT qnorm FROM qn)), 6) AS cosine
FROM agg
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""

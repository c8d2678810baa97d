"""Iterative graph analytics: fixed-point PageRank over a derived trade
graph.

The reference has no graph operators at all; label-propagation connected
components already live in ``dedup.py:dedup_groups``. This module adds the
second classic iterative algorithm, PageRank, in the same Spark-first
shape: the EXPENSIVE part (extracting the edge list from raw fact tables —
at 100 TB, the lineitem→orders→customer/supplier join) is one declarative
aggregation Catalyst plans with broadcast dims; the ITERATION then runs on
the aggregated graph, which is smaller by the full fan-in of the
aggregation, with ``localCheckpoint`` pinning each round to keep the plan
O(1)-deep exactly as ``dedup_groups`` does.

Determinism: ranks are int64 FIXED-POINT micro-units and every per-step op
is integer (multiply, floor-div, sum of ints) — so the result is bit-equal
under any partitioning, join order, or engine, and the DuckDB oracle
(10 unrolled iterations of the same integer recurrence) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping factor 0.85 in micro-units, and (1-d)/N base mass for N=25.
DAMP_MICRO = 850_000
SCALE = 1_000_000
PAGERANK_ITERS = 10


def trade_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Directed nation→nation edge list: customer's nation → supplier's
    nation, weighted by lineitem count (who buys from whom, TPC-H q7's
    join shape reduced to the graph).

    Plan: lineitem⋈orders is the one big shuffle; customer/supplier/nation
    are broadcast dims. Output is at most 25×25 rows.
    """
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def pagerank_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = PAGERANK_ITERS,
) -> DataFrame:
    """PageRank in int64 micro-units, ``iters`` fixed iterations.

    Recurrence (all integer):
        contrib(u→v) = (r_u * w_uv) DIV outw_u
        r'_v = base + (DAMP * Σ_u contrib(u→v)) DIV SCALE
    with base = ((SCALE - DAMP) * SCALE DIV N) DIV SCALE spread uniformly.
    Dangling nodes (no out-edges) keep only the base term, standard for
    the simplified formulation; the graph here has none.

    Each iteration is one co-partitioned join + aggregate on a graph
    already reduced by edge aggregation; ``localCheckpoint`` truncates
    lineage so the plan does not deepen with ``iters``.
    """
    n_nodes = nodes.count()
    base = ((SCALE - DAMP_MICRO) * SCALE // n_nodes) // SCALE
    out_w = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = (
        edges.join(out_w, "src")
        .select("src", "dst", "w", "outw")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select(
        F.col("node"), F.lit(SCALE // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(r * w) DIV outw").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_MICRO} * coalesce(inflow, 0L)) DIV {SCALE}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("node"), F.col("r").alias("rank_micro"))

"""Skew-mitigation operators: salting patterns for hot keys.

The engine's first line of defense is AQE — ``spark.sql.adaptive.skewJoin``
is on in the session defaults (session.py) and splits oversized join
partitions at runtime. Salting is the *static* counterpart for the cases AQE
does not cover:

- **aggregation skew** where the reduce-side per-key state is large
  (collect_list / distinct-heavy aggregates): a two-phase salted aggregate
  splits one hot key across ``n_salt`` reducers, then merges.
- **join skew** on engines/paths without AQE, or when the hot keys are known
  ahead of time: replicate the small side ``n_salt``× and scatter the large
  side, turning one hot partition into ``n_salt`` even ones.

Both transformations are semantics-preserving for the algebraic aggregates
used here (the tests assert equality against the unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(
    df: DataFrame, key: str, value: str, n_salt: int = 8, alias: str | None = None
) -> DataFrame:
    """Two-phase skew-safe sum: groupBy(key, salt) partial -> groupBy(key)
    final. One hot key's rows land on ``n_salt`` reducers instead of one.

    For plain sums Spark's map-side partial aggregation usually suffices;
    use this when the partial-combine ratio is poor (high-cardinality
    pre-aggregation keys) or the aggregate state is wide.
    """
    out = alias or f"sum_{value}"
    salted = df.withColumn("_salt", (F.rand(42) * n_salt).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salt: int = 8
) -> DataFrame:
    """Skew-safe equi-join: the (small) ``dim`` side is replicated
    ``n_salt``x with a salt column, the (large) ``fact`` side scatters its
    rows across salts, and the join key becomes (key, salt).

    Shuffle volume: |fact| + n_salt·|dim| rows — the dim replication is the
    price for splitting each hot fact key across n_salt partitions. Prefer
    ``F.broadcast(dim)`` when dim fits in memory (no shuffle at all); prefer
    AQE skew-join when running adaptive. This helper is the explicit form
    for the remaining cases.
    """
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    fact_salted = fact.withColumn("_salt", (F.rand(7) * n_salt).cast("int"))
    return fact_salted.join(dim_rep, [key, "_salt"]).drop("_salt")

"""Sequence packing: assign documents to fixed token-budget context bins.

The pretraining data layout step: concatenate the corpus in a deterministic
order and cut it every ``budget`` tokens — each document lands in the bin
where its first token falls, and may straddle the boundary into the next
(the standard "pack then split" semantics).  The reference engine has no
such operator; this is part of the training-data-pipeline surface this repo
adds on top of the relational core.

Scale design: the global running token offset is a prefix sum over the
whole corpus — as a single ``ORDER BY doc_id`` window it would serialize
100 TB through one partition.  Instead this is the textbook two-level
distributed prefix sum:

1. bucket each doc by a contiguous id range (``doc_id DIV bucket_width``),
2. aggregate per-bucket token totals (``n_docs / bucket_width`` rows),
   cumsum THOSE in one partition to get each bucket's starting offset,
3. broadcast-join the bucket offsets back and run the within-bucket cumsum
   as a ``PARTITION BY bucket`` window — fully parallel.

``bucket_width`` defaults to ``~sqrt(n_docs)`` (floor 64), which bounds
BOTH single-partition stages — the level-1 cumsum table and each level-2
partition — at ~sqrt(n) rows (~1e6 at a trillion docs). A fixed width
leaves the level-1 table at n/width rows, i.e. corpus-scale again. The
output is width-INVARIANT (the offsets are exact either way), so the
default can scale freely without touching the oracle.

Every step is deterministic, so the output is oracle-checkable against a
plain global-window cumsum in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_bins(
    docs: DataFrame,
    budget: int = 256,
    bucket_width: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bin assignment: (doc_id, n_tok, bin_id, straddle).

    ``bin_id = floor(start_offset / budget)`` where ``start_offset`` is the
    corpus-wide running token count before this doc (order: ``id_col``);
    ``straddle`` marks docs whose tokens cross a bin boundary.
    ``bucket_width=None`` scales it to ~sqrt(corpus) (module docstring).
    """
    if bucket_width is None:
        import math

        bucket_width = max(64, math.isqrt(docs.count()))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tok"),
        (F.col(id_col) / F.lit(bucket_width)).cast("long").alias("bucket"),
    )

    # Level 1: per-bucket totals, cumsum over the (tiny) bucket table.
    bucket_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("bucket")
        .agg(F.sum("n_tok").alias("bucket_tok"))
        .withColumn("bucket_offset", F.coalesce(F.sum("bucket_tok").over(bucket_w), F.lit(0)))
        .select("bucket", "bucket_offset")
    )

    # Level 2: within-bucket cumsum (parallel) + broadcast bucket offsets.
    doc_w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("bucket_offset") + F.coalesce(F.sum("n_tok").over(doc_w), F.lit(0))
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("start_offset", start)
        .withColumn("bin_id", (F.col("start_offset") / budget).cast("long"))
        .withColumn(
            "straddle",
            (F.col("start_offset") / budget).cast("long")
            != ((F.col("start_offset") + F.col("n_tok") - 1) / budget).cast("long"),
        )
        .select("doc_id", "n_tok", "bin_id", "straddle")
    )


def pack_stats(
    docs: DataFrame, budget: int = 256, bucket_width: int | None = None
) -> DataFrame:
    """Per-bin packing summary: docs, tokens, boundary-straddling docs."""
    return (
        assign_bins(docs, budget=budget, bucket_width=bucket_width)
        .groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
            F.sum(F.col("straddle").cast("long")).cast("long").alias("n_straddle"),
        )
        .orderBy("bin_id")
    )


def pack_oracle(budget: int = 256) -> str:
    """DuckDB oracle: the same bins from a plain global-window cumsum."""
    return f"""
WITH d AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
),
ofs AS (
    SELECT doc_id, n_tok,
           COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
    FROM d
)
SELECT CAST(prev // {budget} AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       CAST(SUM(CASE WHEN prev // {budget} <> (prev + n_tok - 1) // {budget}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
FROM ofs
GROUP BY 1
ORDER BY 1
""".strip()

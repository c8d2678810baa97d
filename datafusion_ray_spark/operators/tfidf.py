"""TF-IDF term scoring over the ``documents`` table.

North-star extension (training-data pipelines rank/select corpus terms for
vocabulary induction, keyword extraction, and relevance filtering). All
JVM-side ``pyspark.sql.functions``: tokenize -> per-(doc,term) counts ->
document frequencies -> smoothed idf -> top-k per document.

Scale: two narrow shuffles — (doc_id, term) partial-aggregated counts, then
a (term) shuffle for document frequencies joined back by term. The doc-count
N is a driver scalar (one count job). Per-doc top-k is a bounded window
(rank <= k) — never a global sort. At 100 TB every stage is
map-side-combinable and keyed narrowly; no all-pairs, no Python.

idf uses the sklearn-style smoothed form ``ln((N+1)/(df+1)) + 1`` so unseen
terms stay finite; score = (tf / doc_len) * idf, rounded to 6 decimals for
cross-engine determinism (DuckDB oracle uses the identical formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def tfidf_topk(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document:
    (doc_id, term, tf_count, df_count, score, rank)."""
    n_docs = docs.count()  # driver scalar — one value, folded as a literal
    tc = (
        docs.select("doc_id", F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf_count"))
    )
    doc_len = Window.partitionBy("doc_id")
    tc = tc.withColumn("doc_len", F.sum("tf_count").over(doc_len))
    dfc = tc.groupBy("term").agg(F.count("*").cast("long").alias("df_count"))
    scored = tc.join(dfc, "term").withColumn(
        "score",
        F.round(
            (F.col("tf_count").cast("double") / F.col("doc_len"))
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df_count") + 1.0)) + 1.0),
            6,
        ),
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
        ),
    )
    return ranked.where(F.col("rank") <= k).select(
        "doc_id",
        "term",
        F.col("tf_count").cast("long").alias("tf_count"),
        "df_count",
        "score",
        F.col("rank").cast("int").alias("rank"),
    )

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


def tfidf_topk(docs: DataFrame, text_col: str = "text", k: int = 5,
               n_docs: int | None = None) -> DataFrame:
    """Top-k TF-IDF terms per document:
    (doc_id, term, tf_count, df_count, score, rank).

    ``n_docs``: pass the corpus row count when the caller can compute it
    more cheaply than ``docs.count()`` (r11: the registry wrapper counts
    the raw scan instead of routing the count through spread()'s
    round-robin exchange — same value, one less full-table shuffle)."""
    if n_docs is None:
        n_docs = docs.count()  # driver scalar — folded as a literal
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


#: Okapi BM25 parameters (Robertson & Zaragoza, "The Probabilistic
#: Relevance Framework: BM25 and Beyond", FnTIR 2009).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs: DataFrame, query_terms: list[str],
                text_col: str = "text", k: int = 20) -> DataFrame:
    """BM25 ranking of documents for a fixed bag-of-terms query — the
    lexical-search counterpart of the vector ANN operators.

    Shape: per-document term frequencies are ARRAY-SIDE (``filter``/``size``
    over the token array — no explode, no shuffle); corpus statistics
    (doc count, total length, per-term document frequencies) are ONE tiny
    aggregate row broadcast back; scoring is a pure projection. The only
    ordering is the final top-k. At 100 TB: one scan for stats, one for
    scoring, zero wide shuffles — the classic two-pass scoring plan.

    idf uses the Lucene form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive); ROUND(6) makes scores hash-comparable cross-engine.
    """
    from .text import tokens

    base = docs.select("doc_id", tokens(text_col).alias("_w"))

    def _tf(term: str):
        # NB: a two-arg lambda would make F.filter pass (element, index).
        return F.filter(F.col("_w"), lambda t: t == F.lit(term))

    tf_cols = [
        F.size(_tf(q)).cast("long").alias(f"tf_{i}")
        for i, q in enumerate(query_terms)
    ]
    per_doc = base.select(
        "doc_id", F.size("_w").cast("long").alias("dl"), *tf_cols
    )
    stats = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    norm = BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
    score = None
    matched = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        term_score = idf * tf * (BM25_K1 + 1) / (tf + norm)
        hit = (F.col(f"tf_{i}") > 0).cast("int")
        score = term_score if score is None else score + term_score
        matched = hit if matched is None else matched + hit
    return (
        joined.select(
            "doc_id",
            F.col("dl").alias("doc_len"),
            matched.alias("n_matched_terms"),
            F.round(score, 6).alias("bm25"),
        )
        .where(F.col("n_matched_terms") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )

"""Model-based document quality classification — the trained-filter stage
of modern corpus pipelines (fastText quality filters in GPT-3/CCNet;
FineWeb-Edu's educational-quality classifier), expressed on Spark ML.

Shape: hashed bag-of-words features (``HashingTF`` — the same feature-
hashing trick as ``text.hash_embedding``, model size bounded by the
bucket count regardless of vocabulary) into ``LogisticRegression``.
Training is distributed L-BFGS over the feature matrix; scoring is one
broadcast of the (n_features + 1)-coefficient model and a per-row dot
product — embarrassingly parallel, no shuffle.

Weak supervision helper: ``gopher_weak_labels`` turns the rule-based
Gopher gate into training labels, the standard bootstrap when no human
labels exist (rules label the extremes, the model generalizes).

No oracle entry: training is iterative/non-SQL (same lane as
``kmeans_centroids`` / PCA — behavioral tests instead); the SCORING side
is deterministic given a frozen model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 4096


def weak_labels(docs: DataFrame, rule) -> DataFrame:
    """(doc_id, text, label) from any boolean rule Column — rule-derived
    weak supervision (rules label the data, the model generalizes)."""
    return docs.select(
        "doc_id", "text", rule.cast("double").alias("label")
    )


def gopher_weak_labels(docs: DataFrame) -> DataFrame:
    """Weak labels from the full Gopher gate (label 1.0 iff every rule
    passes). NOTE: on a corpus where the strict gate rejects everything
    (short-document corpora fail the 50-word minimum wholesale) the labels
    degenerate to one class — pick a better-distributed rule via
    :func:`weak_labels` in that case."""
    from .text import gopher_rules

    flags = gopher_rules(docs).select("doc_id", "keep")
    return weak_labels(docs.join(flags, "doc_id"), F.col("keep"))


def train_quality_classifier(labeled: DataFrame, n_features: int = N_FEATURES,
                             max_iter: int = 20, reg_param: float = 0.01):
    """Fit tokenizer -> HashingTF -> LogisticRegression on (text, label).

    Returns the fitted ``PipelineModel``; model size is O(n_features)
    coefficients — broadcastable by construction, like every other model
    artifact in this engine (DSIR table, LM probs, PQ codebooks).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol="text", outputCol="_toks",
                           pattern=r"\s+", minTokenLength=1),
            HashingTF(inputCol="_toks", outputCol="_feat",
                      numFeatures=n_features),
            LogisticRegression(featuresCol="_feat", labelCol="label",
                               maxIter=max_iter, regParam=reg_param),
        ]
    )
    return pipe.fit(labeled)


def score_quality(model, docs: DataFrame) -> DataFrame:
    """(doc_id, quality_prob, quality_pred) for every document — the
    broadcast-model scoring pass a 100 TB corpus runs after training on a
    sample."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select("doc_id", "text"))
    return scored.select(
        "doc_id",
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )

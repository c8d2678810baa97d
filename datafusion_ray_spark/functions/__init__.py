"""Engine function library + SQL-callable UDF registration.

The reference exposes **no** user-defined-function surface at all (its plan
protocol can carry named UDF references but the Python API has no
registration call — SURVEY.md §2.6, ``/root/reference/datafusion_ray/
core.py:558-663``). Spark provides one natively, so this module exceeds
parity in two tiers:

- **Column-expression helpers** (the fast path): pure ``pyspark.sql.functions``
  compositions that stay inside whole-stage codegen — re-exported from the
  operator modules so users can build their own pipelines.
- **Registered SQL functions** (the flexible path): Arrow-vectorized
  ``pandas_udf`` implementations registered on the session so plain SQL can
  call them. These are the documented slow path — per the 100 TB design
  rules, use the column-expression forms in hot paths and the UDFs only
  where SQL-callability matters.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Fast-path column helpers (JVM-side; no Python at execution time).
from ..operators.dedup import shingles  # noqa: F401
from ..operators.similarity import dot, norm, with_cosine  # noqa: F401


@pandas_udf(T.DoubleType())
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine similarity between two array<float> columns."""
    import numpy as np

    def one(x, y):
        if x is None or y is None:
            return None
        xv, yv = np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
        d = float(np.sqrt(xv @ xv) * np.sqrt(yv @ yv))
        return float(xv @ yv) / d if d else None

    return pd.Series([one(x, y) for x, y in zip(a, b)])


@pandas_udf(T.DoubleType())
def jaccard_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized Jaccard similarity between two array<string> columns."""

    def one(x, y):
        if x is None or y is None:
            return None
        sx, sy = set(x), set(y)
        u = len(sx | sy)
        return len(sx & sy) / u if u else None

    return pd.Series([one(x, y) for x, y in zip(a, b)])


@pandas_udf(T.IntegerType())
def bpe_token_estimate(text: pd.Series) -> pd.Series:
    """Arrow-vectorized BPE-ish token-count estimate (ceil(len/4) per word,
    matching operators/text.py's JVM-side estimate)."""
    return pd.Series(
        [
            None
            if t is None
            else sum(math.ceil(len(w) / 4) for w in t.split())
            for t in text
        ],
        dtype="Int32",
    )


SQL_FUNCTIONS = {
    "cosine_sim": cosine_sim,
    "jaccard_sim": jaccard_sim,
    "bpe_token_estimate": bpe_token_estimate,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the UDF library on a session; returns the registered names.

    After this, plain SQL can call e.g.
    ``SELECT cosine_sim(embedding, embedding) FROM embeddings``.
    """
    for name, fn in SQL_FUNCTIONS.items():
        spark.udf.register(name, fn)
    return sorted(SQL_FUNCTIONS)

"""Distributed linear algebra over embedding columns.

Two layers:

- ``covariance_entries``: EXACT fixed-point covariance sums for a leading
  block of dimensions, pure JVM expressions — deterministic across
  engines, so it certifies against a DuckDB oracle (the repo's hash gate).
- ``pca_components`` / ``pca_project``: full-width PCA via per-partition
  Gram-matrix partials (``mapInPandas`` + numpy, the 100 TB shape: each
  task reduces its rows to one d×d matrix, the driver combines k
  matrices of d² floats — never row data) and a broadcast projection.

Scale notes: everything aggregated is O(d²) per PARTITION, independent of
row count; the only full-width per-row work is the final projection,
which is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for covariance certification: components are
#: quantized to micro-units so all cross-moment sums are exact integers
#: (float sums are order-dependent; integer sums are not). With |x| <= ~8
#: and n <= ~1e6 rows, |sum(X_i * X_j)| < 6.4e13 * 1e6 — within int64.
EMB_SCALE = 1_000_000


def _q(x: Column) -> Column:
    return F.round(x.cast("double") * EMB_SCALE).cast("long")


def covariance_entries(df: DataFrame, emb_col: str = "embedding",
                       dims: int = 8) -> DataFrame:
    """Upper-triangle covariance entries for the first ``dims`` components.

    Per row, the dims*(dims+1)/2 quantized products are emitted array-side
    (one posexplode, no per-dimension self-join); one map-side-combinable
    aggregation produces exact integer moment sums, and the covariance is
    a single double expression over those exact integers — bit-identical
    across engines. At full width prefer ``pca_components``'s Gram-partial
    path (O(d²) per partition, no row explosion).
    """
    e = F.col(emb_col)
    pairs = []
    for i in range(dims):
        for j in range(i, dims):
            pairs.append(
                F.struct(
                    F.lit(i).alias("i"),
                    F.lit(j).alias("j"),
                    (_q(e[i]) * _q(e[j])).alias("xy"),
                    _q(e[i]).alias("x"),
                    _q(e[j]).alias("y"),
                )
            )
    exploded = df.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
    s = EMB_SCALE
    agg = exploded.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum("xy").alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    cov = (
        F.col("sxy") / (s * s) - (F.col("sx") / s) * (F.col("sy") / s) / F.col("n")
    ) / F.col("n")
    return agg.select(
        "i",
        "j",
        F.col("n").cast("long").alias("n"),
        F.round(cov, 9).alias("cov"),
    )


def gram_partials(df: DataFrame, emb_col: str = "embedding"):
    """Reduce the corpus to (n, sum-vector, Gram matrix) — numpy partials
    per partition via mapInPandas, combined on the driver. The driver
    receives one (1 + d + d²)-float row PER PARTITION, never row data."""
    import numpy as np

    d = len(df.select(emb_col).first()[0])

    def partial(batches):
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            x = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    rows = (
        df.select(emb_col)
        .mapInPandas(partial, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def pca_components(df: DataFrame, k: int = 4, emb_col: str = "embedding"):
    """Top-k principal components (eigh of the combined covariance).

    Returns (mean, components) as numpy arrays — k×d floats on the
    driver, legitimately driver-sized like the k-means centroids.
    Component sign is fixed (largest-|coord| entry positive) so the basis
    is deterministic up to eigenvalue ties.
    """
    import numpy as np

    n, s, g = gram_partials(df, emb_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return mean, comps


def pca_project(df: DataFrame, k: int = 4, emb_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Project every embedding onto the top-k components (centered).

    The k×d component matrix rides to executors as a plain closure
    broadcast; projection is one numpy matmul per Arrow batch.
    """
    import numpy as np

    mean, comps = pca_components(df, k, emb_col)
    comps_t = comps.T.copy()

    def project(batches):
        import pandas as pd

        for pdf in batches:
            x = np.stack(pdf[emb_col].to_numpy()).astype(np.float64) - mean
            proj = x @ comps_t
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": [list(r) for r in proj]}
            )

    return df.select(id_col, emb_col).mapInPandas(
        project, schema=f"{id_col} long, proj array<double>"
    )

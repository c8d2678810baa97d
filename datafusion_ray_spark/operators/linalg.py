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

    ALL dims*(dims+1)/2 + dims moment sums come out of ONE aggregation
    over the raw rows (44 aggregate columns for dims=8) — no per-pair row
    explosion (an exploded-struct variant benched 3.5× slower: 36× the
    rows through a giant projection), map-side combine intact, and the
    shuffle carries exactly one partial row per task. The covariance is a
    single double expression over the exact integer moments —
    bit-identical across engines. At full width prefer
    ``pca_components``'s Gram-partial path.
    """
    e = F.col(emb_col)
    # quantize once per dimension in a projection; the 44 aggregates then
    # reference plain long columns (keeps the generated aggregate code
    # small — the fused form paid seconds of janino compile).
    pre = df.select(*[_q(e[i]).alias(f"q{i}") for i in range(dims)])
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"q{i}").alias(f"sx_{i}") for i in range(dims)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"sxy_{i}_{j}")
        for i in range(dims)
        for j in range(i, dims)
    ]
    row = pre.agg(*aggs).first()
    # Reshape DRIVER-SIDE: the aggregate output is ONE row of 1+44 exact
    # integers (legitimately driver-sized, like the k-means centroid
    # fetch). A 36-struct explode projection of the same math spent ~5 s
    # in janino compile for 36 rows of output. Python doubles are the
    # same IEEE-754 ops in the same order, and rounding mirrors Spark's
    # F.round exactly (BigDecimal-of-shortest-repr, HALF_UP).
    import decimal

    s = EMB_SCALE
    n = row["n"]

    def _round9(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1E-9"), rounding=decimal.ROUND_HALF_UP
            )
        )

    out = [
        (
            i,
            j,
            n,
            _round9(
                (
                    row[f"sxy_{i}_{j}"] / (s * s)
                    - (row[f"sx_{i}"] / s) * (row[f"sx_{j}"] / s) / n
                )
                / n
            ),
        )
        for i in range(dims)
        for j in range(i, dims)
    ]
    return df.sparkSession.createDataFrame(
        out, "i int, j int, n long, cov double"
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

"""Similarity search over the ``embeddings`` table (north-star extension).

Three operators, all JVM-side (``zip_with`` + ``aggregate`` higher-order
functions — Arrow arrays never leave the executor, no Python UDFs):

- :func:`cosine_topk` — brute-force cosine top-k against a query vector.
  The baseline: one narrow projection computing the dot product per row,
  then a TakeOrderedAndProject (no shuffle of vector data at all). At 100 TB
  this scans everything but in one embarrassingly-parallel pass.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH. Every
  vector gets a small integer bucket from the sign pattern of ``N_PLANES``
  fixed hyperplane dot products; the query searches only its own bucket, so
  the candidate set (and the top-k sort) shrinks by ~2^N_PLANES. Buckets are
  a plain column — at cluster scale you'd partition/bucket the table by it
  so a query touches one partition.
- :func:`neardup_pairs` — embedding-cosine near-duplicate pairs, blocked by
  a key (label here) so the pair join is linear in block size, never
  all-pairs.

Determinism: per-element float->double products are IEEE-identical across
engines; Spark accumulates left-to-right in double while the DuckDB oracle
sums exact decimals — the results agree to ~1e-15, far below the 1e-6
output rounding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Fixed random hyperplanes for LSH bucketing (seeded, rounded so the exact
#: same literals appear in the Spark plan and the oracle SQL). MAX_PLANES
#: are pre-drawn; fixed-granularity ops use the first N_PLANES, while
#: corpus-blocked ops pick ``scaled_planes(n)`` so bucket COUNT grows with
#: the data and per-bucket size stays bounded (numpy draws sequentially, so
#: the first N_PLANES rows are bit-identical to the old 4-row table).
N_PLANES = 4
MAX_PLANES = 16
DIM = 64
HYPERPLANES: list[list[float]] = [
    [round(float(v), 6) for v in row]
    for row in np.random.RandomState(42).normal(size=(MAX_PLANES, DIM))
]

#: Target members per block for corpus-scaled blocking (LSH buckets /
#: semantic cells). Pairwise work within a block is ~TARGET_CELL per row,
#: so total candidate work stays LINEAR in the corpus — the knob the 10x
#: scale gate (scale_check.py) pins.
TARGET_CELL = 256


def scaled_planes(n_rows: int) -> int:
    """Hyperplane count for ~TARGET_CELL vectors per LSH bucket.

    ``ceil(log2(ceil(n / TARGET_CELL)))`` with a floor of N_PLANES.
    Integer argument keeps the cross-engine float story exact: log2 of an
    integer only lands on an integer for exact powers of two (IEEE-exact
    in every engine), so the SQL mirror
    ``GREATEST(4, CEIL(LOG2((COUNT(*) + 255) // 256)))`` computes the
    identical plane count.
    """
    import math

    m = (max(n_rows, 1) + TARGET_CELL - 1) // TARGET_CELL
    return min(MAX_PLANES, max(N_PLANES, math.ceil(math.log2(m)) if m > 1 else 1))


def scaled_centroids(n_rows: int) -> int:
    """Centroid count for ~TARGET_CELL vectors per semantic cell (SemDeDup
    cell sizing: k grows linearly with the corpus; SQL mirror is
    ``GREATEST(8, COUNT(*) // 256)``). Driver/broadcast state is k x DIM
    doubles — ~50 MB at 100M vectors; beyond that assign hierarchically
    (coarse shard -> per-shard centroids), same plan shape."""
    return max(len(CENTROID_VEC_IDS), n_rows // TARGET_CELL)


def _as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_cosine(df: DataFrame, query_vec: list[float], emb_col: str = "embedding") -> DataFrame:
    e = _as_double(emb_col)
    q = _lit_vec(query_vec)
    qn = float(np.sqrt(sum(v * v for v in query_vec)))
    return df.withColumn("cosine", F.round(dot(e, q) / (norm(e) * F.lit(qn)), 6))


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, exclude_vec_id: int | None = None
) -> DataFrame:
    """Brute-force cosine top-k: projection + TakeOrderedAndProject."""
    out = with_cosine(df, query_vec)
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def bucket_expr(emb_col: str = "embedding", n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: bit j set iff dot(v, hyperplane_j) > 0."""
    e = _as_double(emb_col)
    bits = [
        F.when(dot(e, _lit_vec(HYPERPLANES[j])) > 0, F.lit(2**j)).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    return sum(bits).cast("int")


def with_bucket(
    df: DataFrame, emb_col: str = "embedding", n_planes: int = N_PLANES
) -> DataFrame:
    return df.withColumn("bucket", bucket_expr(emb_col, n_planes))


def lsh_ann_topk(
    df: DataFrame, query_vec: list[float], k: int = 5, exclude_vec_id: int | None = None
) -> DataFrame:
    """ANN top-k: search only the query's LSH bucket.

    At cluster scale the table is written bucketed/partitioned by ``bucket``
    so this prunes to one partition; locally Catalyst pushes the bucket
    filter into the scan projection.
    """
    qbits = 0
    for j in range(N_PLANES):
        if sum(a * b for a, b in zip(query_vec, HYPERPLANES[j])) > 0:
            qbits |= 1 << j
    out = with_bucket(df).where(F.col("bucket") == qbits)
    out = with_cosine(out, query_vec)
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", F.col("bucket"), "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


#: IVF configuration: vectors with these vec_ids serve as the coarse
#: centroids (deterministic, data-derived); a query probes its N_PROBE
#: nearest cells.
CENTROID_VEC_IDS = tuple(range(1, 9))
N_PROBE = 2


def _centroid_score(e: Column, en: Column, vec: list[float]) -> Column:
    import math

    cn = math.sqrt(sum(float(v) * float(v) for v in vec))
    return F.round(dot(e, _lit_vec(vec)) / (en * F.lit(cn)), 6)


def ivf_assign(
    df: DataFrame, centroids: list[tuple[int, list[float]]], emb_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest coarse centroid (``cell`` column).

    Scores are rounded to 6 decimals before the argmax and ties break to
    the smallest centroid id, so the assignment is engine-deterministic.

    Arrow-batched numpy kernel (``mapInPandas``): one (n, k) matmul per
    batch, shuffle-free and partition-preserving. Like :func:`pq_encode`,
    this replaced a pure-expression form (k dot products per row as
    ``zip_with``/``aggregate`` structs) that ran on Spark's INTERPRETED
    higher-order-function path at ~0.35 ms/row — per-row milliseconds are
    a scale problem long before sf0.1. The k×dim centroid matrix rides
    into executors inside the pickled closure (broadcast-sized by
    construction).
    """
    import pandas as pd
    from pyspark.sql import types as T

    order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
    C = np.asarray([centroids[i][1] for i in order], dtype=np.float64)
    cid_arr = np.asarray([centroids[i][0] for i in order], dtype=np.int64)
    cn = np.sqrt((C * C).sum(axis=1))
    base = df.drop("cell") if "cell" in df.columns else df
    out_schema = T.StructType(
        list(base.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            en = np.sqrt((X * X).sum(axis=1))
            en[en == 0.0] = 1.0  # zero vectors: arbitrary-but-stable cell
            scores = np.round(X @ C.T / (en[:, None] * cn[None, :]), 6)
            # argmax returns the FIRST max; cids sorted ascending, so ties
            # break to the smallest centroid id (oracle: ORDER score DESC, cid)
            best = scores.argmax(axis=1)
            out = pdf.copy()
            out["cell"] = cid_arr[best].astype("int32")
            yield out

    return base.mapInPandas(gen, out_schema)


def ivf_probe_cells(
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    nprobe: int = N_PROBE,
) -> list[int]:
    """The ``nprobe`` centroid ids nearest the query (cosine, 6-dp rounded,
    ties to the smaller id) — the driver-side probe decision shared by the
    in-plan IVF search and the persisted-index path. Centroid lists are
    bounded by construction (k << corpus), so this is driver math."""
    import math

    qn = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    scored = sorted(
        (
            -round(sum(float(a) * float(b) for a, b in zip(query_vec, vec))
                   / (qn * math.sqrt(sum(float(v) * float(v) for v in vec))), 6),
            cid,
        )
        for cid, vec in centroids
    )
    return [cid for _, cid in scored[:nprobe]]


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors: coarse-quantize, probe ``nprobe``
    cells, exact cosine within them.

    The scale path complementary to :func:`lsh_ann_topk`: cells are
    data-derived (k-means in a real pipeline; fixed sample vectors here), so
    the index adapts to the embedding distribution. At cluster scale the
    table is partitioned by ``cell``; a query reads ``nprobe`` partitions —
    ~nprobe/n_cells of the data — and the top-k is a TakeOrderedAndProject
    with no shuffle of vector data.
    """
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    out = ivf_assign(df, centroids).where(F.col("cell").isin(probe))
    out = with_cosine(out, query_vec)
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", "cell", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Learn IVF centroids with DataFrame-only Lloyd's iterations.

    Seeds = the ``k`` lowest-id vectors (deterministic); each iteration
    assigns every vector to its nearest centroid (:func:`ivf_assign` — one
    JVM argmax, no shuffle) and recomputes centers via posexplode +
    groupBy(cell, dimension) sums — fully map-side combinable, so the
    shuffle per iteration is O(partitions × k × dim) partial rows and the
    driver holds only the k×dim centroid matrix. Empty cells keep their
    previous centroid.

    The result feeds :func:`ivf_ann_topk` / a partition-by-cell layout
    (see SCALE.md). An iterative algorithm like this is exactly the
    non-SQL-expressible case the driver's rows-only lane exists for; here
    it stays a library operator with behavioral tests instead.
    """
    seed_rows = (
        df.orderBy(id_col).limit(k).select(id_col, emb_col).collect()
    )
    centroids = [(i, [float(v) for v in r[emb_col]]) for i, r in enumerate(seed_rows)]
    dim = len(centroids[0][1])
    for _ in range(iterations):
        assigned = ivf_assign(df, centroids, emb_col)
        partials = (
            assigned.select("cell", F.posexplode(_as_double(emb_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count("x").alias("n"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in partials:
            acc.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["s"]
            counts[r["cell"]] = r["n"]
        new = dict(centroids)
        for cell, vec in acc.items():
            new[cell] = [round(v / counts[cell], 6) for v in vec]
        centroids = sorted(new.items())
    return centroids


def write_ann_index(df: DataFrame, path: str, emb_col: str = "embedding") -> None:
    """Materialize the ANN scale layout: the table partitioned on disk by
    LSH bucket (one directory per bucket).

    This is the 100 TB form of :func:`lsh_ann_topk`: with the layout on
    disk, a query's bucket filter becomes a *partition filter* — Spark
    prunes to 1/2^N_PLANES of the files before reading a byte (asserted in
    tests/test_plans.py). The same pattern applies to IVF cells.
    """
    with_bucket(df, emb_col).write.partitionBy("bucket").mode("overwrite").parquet(path)


def indexed_ann_topk(
    spark, path: str, query_vec: list[float], k: int = 5,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ANN top-k over a materialized :func:`write_ann_index` layout — the
    bucket predicate prunes partitions at plan time."""
    qbits = 0
    for j in range(N_PLANES):
        if sum(a * b for a, b in zip(query_vec, HYPERPLANES[j])) > 0:
            qbits |= 1 << j
    out = spark.read.parquet(path).where(F.col("bucket") == qbits)
    out = with_cosine(out, query_vec)
    if exclude_vec_id is not None:
        out = out.where(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", F.col("bucket").cast("int").alias("bucket"), "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def neardup_pairs(
    df: DataFrame,
    block_col: str | tuple[str, ...] = "label",
    threshold: float = 0.35,
    k: int = 20,
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs within a blocking key.

    Self-join on the block key(s), then exact cosine per pair and a top-k
    of the most similar pairs. Per-block pair work is QUADRATIC in block
    size, so at least one block column must be corpus-scaled (a
    ``scaled_centroids`` semantic cell, as the registry query composes, or
    an LSH bucket) — blocking on a fixed-cardinality attribute alone made
    the 10x scale gate measure 15x wall at 10x data. The first block
    column is echoed in the output as ``label``.
    """
    blocks = [block_col] if isinstance(block_col, str) else list(block_col)
    # Precompute each vector's norm ONCE; the pair join then evaluates only
    # the dot product per pair. Recomputing norms inside the join would do
    # O(pairs) redundant array reductions — at 1M vectors per block that is
    # thousands of times more work than the O(vectors) precompute.
    # persist(): both pair-join legs consume this table and their alias-
    # divergent projections defeat exchange reuse, so without the pin each
    # leg recomputes the upstream per-row work (the registry composition
    # feeds an ivf_assign argmax) — the semdedup lesson (r11, guide §5).
    normed = df.select(
        *blocks,
        "vec_id",
        "embedding",
        norm(_as_double("embedding")).alias("nrm"),
    ).persist()
    a = normed.select(
        *blocks,
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("norm_a"),
    )
    b = normed.select(
        *blocks,
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("norm_b"),
    )
    cosine = F.round(
        dot(_as_double("emb_a"), _as_double("emb_b")) / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    return (
        a.join(b, blocks)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.col(blocks[0]).alias("label"),
            cosine.alias("cosine"),
        )
        .withColumn("is_near_dup", F.col("cosine") >= threshold)
        .orderBy(F.col("cosine").desc(), "vec_a", "vec_b")
        .limit(k)
    )


def semdedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.4,
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: semantic deduplication by cluster-then-prune (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", 2023 — public paper; no reference-repo counterpart).

    1. Coarse-cluster every vector to its nearest centroid
       (:func:`ivf_assign` — one JVM argmax projection, no shuffle; the
       centroids come from :func:`kmeans_centroids` in production).
    2. Within each cell, pairwise cosine among members. This is the step
       that makes SemDeDup tractable at 100 TB: the pair join is an
       equi-join on ``cell``, so work is sum(cell²) instead of corpus² —
       cell sizes are bounded by k (scale k with the corpus; skewed cells
       can additionally be salted like any hot join key).
    3. A vector is a semantic duplicate iff some LOWER-id cell-mate is
       within ``threshold`` cosine — keep-lowest-id, the same deterministic
       keeper rule as the text dedup family.

    Returns (vec_id, cell, kept) for every input vector. Norms are
    precomputed once per vector (not per pair), and only (cell, id, vector,
    norm) rows enter the join — no payload columns.

    r11 (guide §5 — cache only what is reused AND expensive): the
    (cell, id, vector, norm) table is persist()-ed because THREE plan
    legs consume it (both pair-join sides and the final keep-list join),
    and each would otherwise recompute the per-row argmax assignment —
    k centroid dot products per vector, the operator's dominant kernel —
    since alias-divergent self-join legs defeat exchange reuse. The
    cached rows are exactly the narrow no-payload projection the join
    reads, never the raw corpus; blocks are released by the caller's
    clearCache / ContextCleaner.
    """
    assigned = ivf_assign(df, centroids, emb_col).select(
        "vec_id", F.col("cell"), F.col(emb_col).alias("_emb")
    )
    normed = assigned.withColumn(
        "nrm", norm(_as_double("_emb"))
    ).persist()
    assigned = normed.drop("nrm")
    a = normed.select(
        "cell",
        F.col("vec_id").alias("vec_a"),
        F.col("_emb").alias("emb_a"),
        F.col("nrm").alias("norm_a"),
    )
    b = normed.select(
        "cell",
        F.col("vec_id").alias("vec_b"),
        F.col("_emb").alias("emb_b"),
        F.col("nrm").alias("norm_b"),
    )
    cosine = F.round(
        dot(_as_double("emb_a"), _as_double("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cosine >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dups.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


#: Product-quantization configuration: DIM=64 split into PQ_M subspaces of
#: PQ_SUB dims; PQ_K centroids per subspace (codes fit a nibble). The
#: per-subspace codebooks are the sliced subvectors of the vectors with
#: PQ_SAMPLE_VEC_IDS (deterministic, data-derived — k-means per subspace in
#: production), mirroring the IVF centroid convention above.
PQ_M = 8
PQ_K = 16
PQ_SUB = DIM // PQ_M
PQ_SAMPLE_VEC_IDS = tuple(range(1, PQ_K + 1))

#: Distances are compared/summed in integer MICRO-UNITS
#: (round(l2² × 1e6)): argmin ties and ADC sums are then exact integer
#: arithmetic, bit-identical across engines and partitionings.
PQ_SCALE = 1_000_000


def pq_codebooks(samples: list[tuple[int, list[float]]],
                 m: int = PQ_M) -> list[list[list[float]]]:
    """codebooks[s][j] = subspace-s slice of the j-th sample vector
    (samples sorted by vec_id; j is the 0-based code)."""
    ordered = [vec for _, vec in sorted(samples)]
    sub = len(ordered[0]) // m
    return [
        [[float(v) for v in vec[s * sub:(s + 1) * sub]] for vec in ordered]
        for s in range(m)
    ]


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              emb_col: str = "embedding",
              keep_embedding: bool = True) -> DataFrame:
    """Encode every vector as PQ_M nibble codes: per subspace, the argmin
    centroid by micro-unit L2 (np.argmin ties to the first = smallest
    code, matching the oracle's ``ORDER BY du, j``).

    Arrow-batched numpy kernel (``mapInArrow``, round-10: was
    ``mapInPandas``), shuffle-free and partition-preserving. This is the
    measured vectorized-UDF exception to the JVM-first rule: the
    pure-expression form (PQ_M × PQ_K nested ``zip_with``/``aggregate``
    lambdas) runs on Spark's INTERPRETED higher-order-function path at
    ~2.5 ms/row — benched 5.6 s for 2k vectors at sf0.1 — while the
    batched kernel is one (n, PQ_K, PQ_SUB) broadcasted subtraction per
    subspace, ~1000× faster and exactly the shape a real codec/BLAS
    integration takes. ``mapInArrow`` matters at this width: the pandas
    exchange materialized every embedding as a per-row numpy OBJECT in a
    pandas column — round-tripping the full vector payload through object
    conversion dominated the kernel 5:1 and made throughput swing with
    worker heap state (the round-9 pq_encode variance) — where the Arrow
    batch exposes the list column's values buffer as ONE zero-copy
    (n × DIM) float64 view. The encoded table is DIM×4 bytes → PQ_M bytes
    per vector (64× smaller here): the compression that lets a 100 TB
    vector corpus keep its *codes* hot in memory while raw vectors stay
    on disk — and ``keep_embedding=False`` is that compression applied to
    the OPERATOR ITSELF: downstream ADC ranking needs only (ids, codes),
    so shipping the raw vectors back through the Arrow channel multiplies
    the output payload ~DIM/2× for nothing (the round-10 throughput
    adjudication measured the full-payload round trip, not the math, as
    the wall). :func:`pq_adc_topk` encodes codes-only; the default keeps
    every input column for callers that join codes back to vectors.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    C = np.asarray(codebooks, dtype=np.float64)  # (PQ_M, PQ_K, PQ_SUB)
    m, sub = C.shape[0], C.shape[2]
    kept = [
        f for f in df.schema.fields
        if keep_embedding or f.name != emb_col
    ]
    out_schema = T.StructType(
        kept + [T.StructField("code", T.ArrayType(T.IntegerType()))]
    )
    kept_names = [f.name for f in kept]

    def gen(batches):
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            emb = b.column(b.schema.get_field_index(emb_col))
            # flatten() honors list offsets/slices; fixed-width rows make
            # the reshape a zero-copy (n, DIM) view of the Arrow buffer.
            # The EXPLICIT width makes ragged/null inputs fail loudly
            # (reshape errors) instead of silently misaligning vectors.
            if emb.null_count:
                raise ValueError(
                    f"pq_encode: {emb.null_count} null {emb_col!r} values "
                    "in batch; drop or impute them before encoding"
                )
            X = np.asarray(emb.flatten(), dtype=np.float64).reshape(
                n, m * sub
            )
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub:(s + 1) * sub]
                d = ((Xs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
                du = np.rint(d * PQ_SCALE).astype(np.int64)
                codes[:, s] = du.argmin(axis=1)
            code_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
                pa.array(codes.ravel()),
            )
            cols = [b.column(b.schema.get_field_index(c)) for c in kept_names]
            yield pa.RecordBatch.from_arrays(
                [*cols, code_arr], names=[*kept_names, "code"],
            )

    return df.mapInArrow(gen, out_schema)


def pq_adc_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes (Jégou,
    Douze & Schmid, "Product quantization for nearest neighbor search",
    TPAMI 2011): precompute the query's distance to every centroid of every
    subspace (a PQ_M × PQ_K lookup table — driver/broadcast sized by
    construction), then score each database vector as the SUM of table
    lookups selected by its codes.

    Per-row work is PQ_M integer array lookups + an exact integer sum —
    no vector arithmetic against the corpus at query time, which is the
    whole point of PQ at 100 TB. Returns (vec_id, approx_dist_u) ascending.
    """
    # fsum inside _query_lut = exactly-rounded sum of the double products,
    # matching the oracle's exact decimal summation of the same products
    lut = _query_lut(query_vec, codebooks)

    # codes-only output: ADC needs (vec_id, code); the raw vectors never
    # cross back through the Arrow channel (~DIM/2x smaller payload)
    encoded = pq_encode(df, codebooks, keep_embedding=False)
    return _adc_rank(encoded, lut, k=k, exclude_vec_id=exclude_vec_id)


def _query_lut(query_vec: list[float],
               codebooks: list[list[list[float]]]) -> list[list[int]]:
    """PQ_M × PQ_K table of the query's micro-unit L2 distance to every
    centroid of every subspace (driver-sized by construction)."""
    import math

    lut: list[list[int]] = []
    for s, cb in enumerate(codebooks):
        q_sub = [float(v) for v in query_vec[s * PQ_SUB:(s + 1) * PQ_SUB]]
        row = []
        for cvec in cb:
            d = math.fsum((x - y) * (x - y) for x, y in zip(q_sub, cvec))
            row.append(int(round(d * PQ_SCALE)))
        lut.append(row)
    return lut


def _adc_rank(encoded: DataFrame, lut: list[list[int]], k: int,
              exclude_vec_id: int | None) -> DataFrame:
    """Rank PQ-encoded rows by summed LUT lookups (the ADC inner loop)."""
    if exclude_vec_id is not None:
        encoded = encoded.where(F.col("vec_id") != exclude_vec_id)
    terms = [
        F.element_at(
            F.array(*[F.lit(v) for v in lut[s]]),
            F.element_at(F.col("code"), s + 1) + 1,
        )
        for s in range(len(lut))
    ]
    approx = terms[0]
    for t in terms[1:]:
        approx = approx + t
    return (
        encoded.select("vec_id", approx.cast("long").alias("approx_dist_u"))
        .orderBy(F.asc("approx_dist_u"), "vec_id")
        .limit(k)
    )


def ivfpq_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = N_PROBE,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN stack (FAISS's IVFADC layout, Jégou et
    al. 2011 §V) — coarse-quantize to prune the corpus to ``nprobe`` cells,
    then rank survivors by PQ asymmetric distance.

    The two indexes compose multiplicatively at 100 TB: IVF reads
    ~nprobe/n_cells of the partitions (cell = partition in the materialized
    layout), PQ makes what remains 64× smaller and turns per-row scoring
    into integer lookups. Both index artifacts (k×dim centroids,
    PQ_M×PQ_K codebooks) are driver/broadcast sized by construction.
    """
    import math

    qn = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    scored = sorted(
        (
            -round(sum(float(a) * float(b) for a, b in zip(query_vec, vec))
                   / (qn * math.sqrt(sum(float(v) * float(v) for v in vec))), 6),
            cid,
        )
        for cid, vec in centroids
    )
    probe = [cid for _, cid in scored[:nprobe]]
    enc = ivfpq_encode(df, centroids, probe, codebooks)
    return _adc_rank(enc, _query_lut(query_vec, codebooks), k=k,
                     exclude_vec_id=exclude_vec_id)


def ivfpq_encode(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    probe: list[int],
    codebooks: list[list[list[float]]],
    emb_col: str = "embedding",
) -> DataFrame:
    """Fused IVF-assign → probe-cell prune → PQ-encode in ONE Arrow pass.

    Running :func:`ivf_assign` and :func:`pq_encode` as separate
    stages ships the full raw-vector column through the
    Arrow channel twice (Python → JVM → Python) with a filter in between;
    fused, each embedding crosses once, pruned rows never cross back, and
    only (narrow columns, cell, code) leave the kernel. Math is bit-for-bit
    the two standalone kernels' (same rounding, same argmin/argmax tie
    rules), so the composed result is unchanged — the standalone operators
    remain the certified per-stage surfaces. Round-10: ``mapInArrow``
    like :func:`pq_encode` — the input vectors are one zero-copy
    (n × DIM) view instead of per-row pandas objects; the float64 values
    are identical either way, so every downstream op is bit-unchanged.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
    C = np.asarray([centroids[i][1] for i in order], dtype=np.float64)
    cid_arr = np.asarray([centroids[i][0] for i in order], dtype=np.int64)
    cn = np.sqrt((C * C).sum(axis=1))
    probe_arr = np.asarray(sorted(probe), dtype=np.int64)
    CB = np.asarray(codebooks, dtype=np.float64)  # (PQ_M, PQ_K, PQ_SUB)
    m, sub = CB.shape[0], CB.shape[2]
    keep_fields = [f for f in df.schema.fields if f.name != emb_col]
    out_schema = T.StructType(
        keep_fields
        + [
            T.StructField("cell", T.IntegerType()),
            T.StructField("code", T.ArrayType(T.IntegerType())),
        ]
    )
    keep_cols = [f.name for f in keep_fields]

    def gen(batches):
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            emb = b.column(b.schema.get_field_index(emb_col))
            if emb.null_count:
                raise ValueError(
                    f"ivfpq_encode: {emb.null_count} null {emb_col!r} "
                    "values in batch; drop or impute them before encoding"
                )
            # explicit width (centroid dim): ragged inputs fail loudly
            X = np.asarray(emb.flatten(), dtype=np.float64).reshape(
                n, C.shape[1]
            )
            en = np.sqrt((X * X).sum(axis=1))
            en[en == 0.0] = 1.0
            scores = np.round(X @ C.T / (en[:, None] * cn[None, :]), 6)
            cells = cid_arr[scores.argmax(axis=1)]
            mask = np.isin(cells, probe_arr)
            if not mask.any():
                continue
            Xk = X[mask]
            codes = np.empty((len(Xk), m), dtype=np.int32)
            for s in range(m):
                Xs = Xk[:, s * sub:(s + 1) * sub]
                d = ((Xs[:, None, :] - CB[s][None, :, :]) ** 2).sum(axis=2)
                du = np.rint(d * PQ_SCALE).astype(np.int64)
                codes[:, s] = du.argmin(axis=1)
            kept = b.filter(pa.array(mask))
            nk = kept.num_rows
            code_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (nk + 1) * m, m, dtype=np.int32)),
                pa.array(codes.ravel()),
            )
            cols = [
                kept.column(kept.schema.get_field_index(c))
                for c in keep_cols
            ]
            yield pa.RecordBatch.from_arrays(
                [*cols,
                 pa.array(cells[mask].astype(np.int32)),
                 code_arr],
                names=[*keep_cols, "cell", "code"],
            )

    return df.mapInArrow(gen, out_schema)


def knn_graph(df: DataFrame, k: int = 3, emb_col: str = "embedding",
              n_planes: int | None = None) -> DataFrame:
    """Batch ANN: the k-nearest-neighbor GRAPH over the whole corpus —
    top-``k`` same-bucket neighbors by cosine for EVERY vector (the
    workload shape behind SemDeDup clustering, kNN-graph label
    propagation, and retrieval index bootstrap; single-query top-k is
    :func:`lsh_ann_topk`).

    Spark-first at scale: vectors are grouped by their LSH bucket
    (``groupBy(bucket).applyInPandas``) and each bucket's neighbor lists
    come from ONE (n_b × n_b) float64 matmul — the per-cluster dense
    kernel every published SemDeDup implementation uses, vectorized and
    partition-parallel, never an all-pairs corpus join. At 100 TB the
    bucketed table is the materialized ANN index, so the groupBy reads
    co-partitioned data. Candidate scope = own bucket (multi-probe =
    union over band tables, same plan).

    Determinism: cosines are rounded to 6 dp; ranking ties break by
    neighbor id. float64 matmul vs the oracle's exact-decimal sums agree
    to ~1e-13, far below the rounding grain.

    ``n_planes`` defaults to ``scaled_planes(count)``: bucket COUNT grows
    with the corpus so per-bucket membership stays ~TARGET_CELL and the
    per-bucket matmul stays O(TARGET_CELL) per vector — with a fixed
    plane count the kernel is secretly quadratic (the 10x scale gate
    measured 40x wall at 10x data before this). Pass an explicit value to
    pin granularity (the ann_lsh index queries use N_PLANES).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("src", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("nbr", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"src": [], "rank": [], "nbr": [], "cosine": []}
            ).astype({"src": "int64", "rank": "int32",
                      "nbr": "int64", "cosine": "float64"})
        ids = pdf["vec_id"].to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf[emb_col]])
        nrm = np.sqrt((X * X).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        C = np.round((X @ X.T) / (nrm[:, None] * nrm[None, :]), 6)
        kk = min(k, n - 1)
        srcs, ranks, nbrs, coss = [], [], [], []
        for i in range(n):
            row = C[i]
            # order: cosine desc, neighbor id asc, self excluded
            order = np.lexsort((ids, -row))
            order = order[ids[order] != ids[i]][:kk]
            srcs.extend([ids[i]] * len(order))
            ranks.extend(range(1, len(order) + 1))
            nbrs.extend(ids[order])
            coss.extend(row[order])
        return pd.DataFrame(
            {"src": np.asarray(srcs, dtype="int64"),
             "rank": np.asarray(ranks, dtype="int32"),
             "nbr": np.asarray(nbrs, dtype="int64"),
             "cosine": np.asarray(coss, dtype="float64")}
        )

    if n_planes is None:
        n_planes = scaled_planes(df.count())
    return (
        with_bucket(df, emb_col, n_planes)
        .select("bucket", "vec_id", emb_col)
        .groupBy("bucket")
        .applyInPandas(per_bucket, out_schema)
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): per-dimension linear int8 codes.

SQ_LEVELS = 255  # codes 0..255 per dimension


def sq8_stats(df: DataFrame, emb_col: str = "embedding") -> list[tuple[int, int]]:
    """Per-dimension (min, range) in integer micro-units over the corpus —
    the SQ8 "codebook". One posexplode + group-by-dimension aggregate; the
    driver receives DIM rows (64 ints), the same legitimately-driver-sized
    result as the k-means centroid matrix.
    """
    us = F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)")
    rows = (
        df.select(F.posexplode(emb_col).alias("pos", "x"))
        .select("pos", us.alias("v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), (F.max("v") - F.min("v")).alias("rg"))
        .collect()
    )
    stats = sorted((r["pos"], (r["mn"], r["rg"])) for r in rows)
    return [mv for _, mv in stats]


def sq8_encode_expr(stats: list[tuple[int, int]], emb_col: str = "embedding") -> Column:
    """JVM-side SQ8 encoder: code_i = ((x_us - min_i) * 255) DIV range_i
    (0 when the dimension is constant). All-integer — bit-stable under any
    partitioning and engine."""
    mins = ", ".join(f"{int(mn)}L" for mn, _ in stats)
    rngs = ", ".join(f"{int(rg)}L" for _, rg in stats)
    return F.expr(
        f"zip_with("
        f"  zip_with("
        f"    transform({emb_col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),"
        f"    array({mins}), (x, mn) -> x - mn),"
        f"  array({rngs}),"
        f"  (d, rg) -> CASE WHEN rg = 0L THEN 0L ELSE (d * {SQ_LEVELS}) DIV rg END)"
    )


def sq8_encode_query(vec: list[float], stats: list[tuple[int, int]]) -> list[int]:
    """Driver-side twin of :func:`sq8_encode_expr` for the query vector,
    in exact Python integer arithmetic."""
    import math

    codes = []
    for x, (mn, rg) in zip(vec, stats):
        xus = math.floor(float(x) * 1_000_000)
        codes.append(0 if rg == 0 else ((xus - mn) * SQ_LEVELS) // rg)
    return codes


def sq8_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by squared-L2 distance on SQ8 codes (the query is
    encoded once on the driver with the corpus codebook).

    The scale story: SQ8 shrinks a float32 corpus 4× (one byte per
    dimension) with far better recall than PQ at the same budget for
    moderate DIM; the per-row query cost is a 64-element int
    multiply-accumulate that never touches the raw floats. At cluster
    scale the codes column is what you cache/bucket; raw vectors stay on
    cold storage for the optional re-rank. All arithmetic is int64 —
    hash-certifiable against the DuckDB oracle running the identical
    integer recurrence.
    """
    stats = sq8_stats(df, emb_col)
    qcodes = sq8_encode_query(query_vec, stats)
    qarr = F.array(*[F.lit(int(c)) for c in qcodes])
    encoded = df.withColumn("_code", sq8_encode_expr(stats, emb_col))
    if exclude_vec_id is not None:
        encoded = encoded.where(F.col("vec_id") != exclude_vec_id)
    # squared-L2 in code space (NOT inner product: IP rewards large-norm
    # vectors and would not even rank the query itself first); self-
    # distance is 0 by construction, max 64*255^2 ~ 4.2e6 — int64-safe.
    dist = F.aggregate(
        F.zip_with(F.col("_code"), qarr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        encoded.select("vec_id", dist.alias("dist_u"))
        .orderBy(F.asc("dist_u"), "vec_id")
        .limit(k)
    )


def sq8_rerank_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 50,
    exclude_vec_id: int | None = None,
    emb_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: SQ8 code-space prefilter to ``n_candidates``, then
    EXACT cosine rerank of only those — the retrieve-then-rerank shape
    every production vector system uses (FAISS refine, ScaNN reordering).

    At 100 TB the first stage touches only the 4×-compressed code column
    (cacheable), and the second stage re-reads raw vectors for just
    ``n_candidates`` rows via an id semi-join — so exact math is paid on
    a constant-size set, not the corpus. Here both stages compose in one
    plan: TakeOrderedAndProject over codes, broadcast id-join back, exact
    cosine, final top-k.
    """
    cand = sq8_ann_topk(
        df, query_vec, k=n_candidates, exclude_vec_id=exclude_vec_id,
        emb_col=emb_col,
    ).select("vec_id")
    reranked = with_cosine(
        df.join(F.broadcast(cand), "vec_id"), query_vec, emb_col
    )
    return (
        reranked.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )

"""Deduplication operators over the ``documents`` table.

North-star extensions (BASELINE.json): the dedup family a training-data
pipeline needs, each expressed Spark-first:

- **exact**: hash-groupBy on the text digest — one shuffle on the digest,
  map-side combinable, scales to any corpus size.
- **MinHash + LSH**: shingle -> per-seed min-hash signature -> banded bucket
  join. Signatures are computed with JVM array functions (``transform`` /
  ``array_min``) — zero Python, zero explode, one narrow projection per
  document; only the tiny (band, bucket) keys are shuffled for the
  candidate join. This is the textbook near-dup design that holds at 100 TB:
  candidate generation is O(docs × bands) shuffle rows, never O(docs²).
- **n-gram Jaccard verify**: exact set overlap computed only for LSH
  candidate pairs (array_intersect/array_union on the shingle sets).
- **SimHash**: 16-bit fingerprint from per-token hashes; near-dup pairs by
  Hamming distance within a blocking key.

Hashing is md5-based end-to-end (identical in Spark and DuckDB), so every
operator here is oracle-checkable; lexicographic MIN over md5 hex digests is
a valid min-hash because the digests are uniformly distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: MinHash configuration: 9 hashes in 3 bands of 3 rows. With Jaccard
#: similarity s the candidate probability is 1-(1-s^3)^3 — steep around
#: s≈0.7, the usual near-dup knee.
N_HASHES = 9
N_BANDS = 3
ROWS_PER_BAND = 3
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.6


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def shingles(text_col: str = "text", k: int = SHINGLE_K) -> Column:
    """Distinct word 3-shingles as an array column (empty if < 3 tokens).

    Built from three O(n) zips (words x shift-1 x shift-2) instead of a
    per-position ``slice`` — the naive form does O(n) array copies per
    shingle, which dominated the whole minhash pipeline in profiling.
    """
    assert k == 3, "shingle construction is specialized for k=3"
    words = _tokens(text_col)
    n = F.size(words)
    s2 = F.slice(words, 2, F.greatest(n - 1, F.lit(0)))
    s3 = F.slice(words, 3, F.greatest(n - 2, F.lit(0)))
    pairs = F.zip_with(
        words, s2, lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b))
    )
    tris = F.zip_with(
        pairs, s3, lambda p, c: F.when(p.isNotNull() & c.isNotNull(), F.concat(p, F.lit(" "), c))
    )
    return F.array_distinct(
        F.when(n >= k, F.filter(tris, lambda x: x.isNotNull())).otherwise(
            F.array().cast("array<string>")
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5(text) -> (keep_id = min doc_id, dup_count).

    Scale: single hash-shuffle on the 32-char digest with partial
    aggregation; no row data moves, only (digest, id).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document MinHash signature: for seed i, the lexicographic MIN of
    md5("i:" || shingle). Adds ``sig_0 .. sig_{N-1}`` string columns.

    Computed in ONE pass over the shingle array (per-shingle vector of
    N_HASHES digests, folded with an elementwise-min zip) rather than
    N_HASHES separate array traversals.
    """
    out = df.withColumn("_shingles", shingles(text_col)).where(F.size("_shingles") > 0)
    per_shingle = F.transform(
        F.col("_shingles"),
        lambda s: F.array(*[F.md5(F.concat(F.lit(f"{i}:"), s)) for i in range(N_HASHES)]),
    )
    # 'g' sorts after every hex digest, so it is a safe fold identity.
    fold = F.aggregate(
        per_shingle,
        F.array_repeat(F.lit("g"), N_HASHES),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )
    out = out.withColumn("_sigs", fold)
    for i in range(N_HASHES):
        out = out.withColumn(f"sig_{i}", F.element_at("_sigs", i + 1))
    return out.drop("_sigs")


def lsh_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band, bucket) rows: bucket = md5 of the band's signature
    slice. Only these narrow rows are shuffled for candidate generation."""
    sig = minhash_signature(df, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id", "_shingles", F.explode(bands).alias("bb")
    ).select("doc_id", "_shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b sharing ≥1 LSH bucket).

    Implemented as groupBy(bucket) + collect_list + array-side pair
    expansion instead of a self-join: a self-join would recompute the whole
    signature pipeline for both sides (Spark does not share scans between
    the two legs of a self-join), and at 100 TB it would also shuffle the
    bucket table twice. Here signatures are computed once, one narrow
    (band, bucket, doc_id) shuffle groups the buckets, and pairs are
    expanded JVM-side from each bucket's sorted id list.
    """
    b = lsh_buckets(df, text_col).select("band", "bucket", "doc_id")
    grouped = (
        b.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard similarity.

    Jaccard is computed from integer set sizes (bit-deterministic); pairs
    with jaccard >= JACCARD_THRESHOLD are flagged near-dups.
    """
    cand = minhash_candidates(df, text_col)
    sh = df.select("doc_id", shingles(text_col).alias("sh"))
    joined = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "doc_a",
        "doc_b",
        F.round(inter / union, 6).alias("jaccard"),
        (inter / union >= JACCARD_THRESHOLD).alias("is_near_dup"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a blocking key.

    The exact counterpart to MinHash: every within-block pair is scored, so
    recall is 1.0 at the cost of O(block²) candidate pairs. Two things keep
    it viable at scale:

    - **blocking**: the self-join shuffles only on the block key, so work is
      sum-of-block² — never corpus² (at 100 TB the block would itself be an
      LSH band, making this the verify stage of minhash_dedup_pairs).
    - **size-ratio pruning**: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
      whose shingle-count ratio is below the threshold are dropped on two
      integer comparisons before any array intersection is evaluated. The
      prune is lossless for the ``jaccard >= threshold`` output.

    Returns (doc_a, doc_b, jaccard) for pairs meeting the threshold.
    """
    sh = (
        df.select(
            F.col(block_col).alias("blk"),
            "doc_id",
            shingles(text_col).alias("sh"),
        )
        .where(F.size("sh") > 0)
        .withColumn("sz", F.size("sh"))
    )
    a = sh.select("blk", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                  F.col("sz").alias("sz_a"))
    b = sh.select("blk", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                  F.col("sz").alias("sz_b"))
    pruned = a.join(b, "blk").where(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.least("sz_a", "sz_b") >= F.lit(threshold) * F.greatest("sz_a", "sz_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.col("sz_a") + F.col("sz_b") - inter
    return (
        pruned.select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash fingerprint per document.

    Per-token 16-bit hash = first 4 hex digits of md5(token); each bit
    contributes +1/-1 weighted by token multiplicity; fingerprint bit j is 1
    when the signed sum is positive. Implemented as explode -> 16
    conditional sums (map-side combinable single shuffle on doc_id).
    """
    hexmap = "0123456789abcdef"
    tok = df.select("doc_id", F.explode(_tokens(text_col)).alias("tok"))
    h = F.md5(F.col("tok"))
    val = sum(
        (F.instr(F.lit(hexmap), F.substring(h, p + 1, 1)) - 1) * (16 ** (3 - p))
        for p in range(4)
    )
    tok = tok.select("doc_id", val.alias("h16"))
    bit_sums = [
        F.sum(
            F.when(F.floor(F.col("h16") / (2**j)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"bs_{j}")
        for j in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = sum(
        F.when(F.col(f"bs_{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)) for j in range(16)
    )
    return agg.select("doc_id", fp.cast("int").alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str = "text", block_col: str = "source", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within a blocking key.

    Blocking keeps the pair join linear in block sizes (never all-pairs);
    at 100 TB the block would be an LSH band of the simhash itself.
    """
    fp = simhash16(df, text_col).join(df.select("doc_id", block_col), "doc_id")
    a = fp.select(
        F.col(block_col).alias("blk"), F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a")
    )
    b = fp.select(
        F.col(block_col).alias("blk"), F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b")
    )
    hamming = sum(
        F.abs(
            F.floor(F.col("fp_a") / (2**j)) % 2 - F.floor(F.col("fp_b") / (2**j)) % 2
        )
        for j in range(16)
    )
    return (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )

"""Round-4 composed pipeline operators: ensemble dedup + semantic
decontamination.

Production LLM-data pipelines rarely run ONE dedup signal: the standard
recipe (e.g. the public descriptions of Gopher/MassiveText, Llama, and
FineWeb data work) unions a LEXICAL near-dup detector (MinHash-verified
n-gram Jaccard) with a SEMANTIC one (embedding cosine) and drops whole
connected components of the union graph. Likewise decontamination combines
k-gram overlap (``contamination_ngram``) with an embedding-similarity
screen against the benchmark set. Both composites here are built from the
already-certified primitives — the point is the COMPOSITION as a
first-class, oracle-certified query, not new kernels.

The reference has none of this (its surface is TPC-H SQL); these extend
the north-star LLM-pipeline family.

Scale notes (SCALE.md has the per-primitive arguments):
- ensemble: both pair generators are banded/blocked (LSH bands; label
  blocks standing in for ANN buckets), the union is pair-count-sized, and
  the component step is the same bounded label-propagation
  ``dedup_groups`` certifies.
- semantic decontamination: the benchmark side is SMALL BY NATURE (a
  benchmark suite, not a corpus) — the plan is a broadcast nested-loop
  of corpus × benchmark chosen by Spark's own size check (no forced
  hint), linear in the corpus; at 100 TB you'd pre-filter candidates with
  the IVF/PQ index and only exact-score the survivors, the composition
  ``sim_ann_ivfpq`` already demonstrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from . import dedup
from .similarity import _as_double, dot, norm
from .oracles import minhash_pairs_oracle

#: cosine at or above this (rounded to 6dp) marks a semantic near-dup /
#: contaminated document.
SEMANTIC_DUP_THRESHOLD = 0.35
CONTAMINATION_COS_THRESHOLD = 0.30
#: embeddings with vec_id < this are the "benchmark" set for the
#: decontamination screen (stand-in for eval-suite embeddings).
BENCHMARK_VEC_IDS = 25

_DOT_DEC = "CAST(SUM(CAST(x * y AS DECIMAL(28,14))) AS DOUBLE)"
_NORM_X = "CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE)"
_NORM_Y = "CAST(SUM(CAST(y * y AS DECIMAL(28,14))) AS DOUBLE)"


def semantic_pairs(
    emb: DataFrame,
    block_cols: tuple[str, ...] = ("label", "cell"),
    threshold: float = SEMANTIC_DUP_THRESHOLD,
) -> DataFrame:
    """All same-block embedding pairs with cosine >= threshold —
    ``similarity.neardup_pairs`` without the top-k cap (the ensemble needs
    the full edge set, not a preview). Norms are precomputed per vector;
    the pair join evaluates one dot product each.

    At least one block column must be CORPUS-SCALED (the semantic ``cell``
    from ``similarity.ivf_assign`` with ``scaled_centroids`` granularity):
    a first cut blocked on ``label`` alone — fixed cardinality, so blocks
    grew with the corpus and the pair join went quadratic (the 100x gate
    measured 633x wall on dedup_ensemble; the same lesson
    ``run_emb_neardup`` had already learned at 10x)."""
    # persist(): both pair-join legs consume this narrow no-payload
    # table, and alias-divergent self-join legs defeat exchange reuse —
    # without the pin each leg recomputes the upstream per-row argmax
    # cell assignment (r11, the similarity.semdedup lesson; blocks are
    # freed by the caller's clearCache / ContextCleaner).
    normed = emb.select(
        *block_cols,
        "vec_id",
        _as_double("embedding").alias("e"),
        norm(_as_double("embedding")).alias("nrm"),
    ).persist()
    a = normed.select(
        *block_cols, F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = normed.select(
        *block_cols, F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, list(block_cols))
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("ea"), F.col("eb"))
                    / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def run_dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the UNION of lexical (MinHash-verified
    Jaccard) and semantic (same-label cosine) near-dup edges; vec_id is the
    doc_id of the document each embedding encodes (1:1 in the testdata).
    Output: (doc_id, group_id, n_members) for every doc in any component."""
    from . import similarity

    # spread(): both legs run per-row compute-bound kernels (shingle/md5,
    # vector math) and the testdata is one unsplittable row group.
    docs = spread(load_table(spark, sf_dir, "documents"))
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    lex = (
        dedup.minhash_dedup_pairs(docs)
        .where("is_near_dup")
        .select("doc_a", "doc_b")
    )
    # Corpus-scaled semantic cells (the run_emb_neardup convention): k
    # grows with the corpus so per-block pair work stays bounded.
    # Count + centroid collect off the UNSPREAD scan (see run_semdedup):
    # these driver actions don't benefit from the round-robin fan-out.
    emb_raw = load_table(spark, sf_dir, "embeddings")
    k = similarity.scaled_centroids(emb_raw.count())
    rows = (
        emb_raw.where(F.col("vec_id").between(1, k))
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = sorted((r["vec_id"], list(r["embedding"])) for r in rows)
    assigned = similarity.ivf_assign(emb, centroids)
    sem = semantic_pairs(assigned).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    # No .distinct() here: duplicate_groups canonicalizes (least,
    # greatest) and distincts its e0 input anyway, so the union-level
    # dedup was a redundant full shuffle of the same edge set (r11:
    # one Exchange removed; components identical by construction).
    edges = lex.unionByName(sem)
    groups = dedup.duplicate_groups(edges)
    # Member counts via count() OVER (PARTITION BY group_id) instead of
    # groupBy(group_id) + join back (r11, guide §2.4 — a window keyed
    # like the preceding aggregation needs no second shuffle): the old
    # form planned the groups subtree twice (agg + probe legs) and paid
    # an extra Exchange for the join; the window shuffles groups once.
    return groups.selectExpr(
        "doc_id",
        "group_id",
        "CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members",
    ).orderBy("doc_id")


def dedup_ensemble_oracle(
    threshold: float = SEMANTIC_DUP_THRESHOLD,
) -> str:
    from .similarity import CENTROID_VEC_IDS, TARGET_CELL

    lo, kmin = min(CENTROID_VEC_IDS), len(CENTROID_VEC_IDS)
    return f"""
WITH RECURSIVE mp AS (
{minhash_pairs_oracle()}
),
cents AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id BETWEEN {lo} AND GREATEST({kmin},
          (SELECT COUNT(*) FROM embeddings) // {TARGET_CELL})
),
cpr AS (
    SELECT e.vec_id, c.cid,
           CAST(unnest(e.embedding) AS DOUBLE) AS x,
           CAST(unnest(c.ce) AS DOUBLE) AS y
    FROM embeddings e CROSS JOIN cents c
),
csc AS (
    SELECT vec_id, cid,
           ROUND({_DOT_DEC} / (SQRT({_NORM_X}) * SQRT({_NORM_Y})), 6) AS score
    FROM cpr GROUP BY vec_id, cid
),
assign AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY score DESC, cid) AS rn
          FROM csc)
    WHERE rn = 1
),
sprod AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(unnest(a.embedding) AS DOUBLE) AS x,
           CAST(unnest(b.embedding) AS DOUBLE) AS y
    FROM embeddings a
    JOIN assign ca ON ca.vec_id = a.vec_id
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    JOIN assign cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell
),
sagg AS (
    SELECT vec_a, vec_b, {_DOT_DEC} AS dot, {_NORM_X} AS na, {_NORM_Y} AS nb
    FROM sprod GROUP BY vec_a, vec_b
),
sem AS (
    SELECT vec_a AS doc_a, vec_b AS doc_b
    FROM sagg WHERE ROUND(dot / (SQRT(na) * SQRT(nb)), 6) >= {threshold}
),
allp AS (
    SELECT doc_a, doc_b FROM mp WHERE is_near_dup
    UNION
    SELECT doc_a, doc_b FROM sem
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM allp
    UNION ALL
    SELECT doc_b, doc_a FROM allp
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, r) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
),
g AS (
    SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS group_id
    FROM reach GROUP BY id
)
SELECT g.doc_id, g.group_id,
       CAST(COUNT(*) OVER (PARTITION BY g.group_id) AS BIGINT) AS n_members
FROM g ORDER BY g.doc_id
"""


def run_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-similarity decontamination screen: for every corpus
    vector (vec_id >= BENCHMARK_VEC_IDS), the max cosine against the
    benchmark set (vec_id < BENCHMARK_VEC_IDS) and a contaminated flag.

    Plan: corpus × 25-row benchmark side — Spark picks
    BroadcastNestedLoopJoin on its own size check (no hint), one pass over
    the corpus. Pair cosines are rounded to 6dp BEFORE the max so the
    reduction is engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") < BENCHMARK_VEC_IDS).select(
        F.col("vec_id").alias("bench_id"),
        _as_double("embedding").alias("be"),
        norm(_as_double("embedding")).alias("bn"),
    )
    corpus = emb.where(F.col("vec_id") >= BENCHMARK_VEC_IDS).select(
        "vec_id",
        _as_double("embedding").alias("ce"),
        norm(_as_double("embedding")).alias("cn"),
    )
    cos = F.round(
        dot(F.col("ce"), F.col("be")) / (F.col("cn") * F.col("bn")), 6
    )
    return (
        corpus.crossJoin(bench)
        .select("vec_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_benchmark_cosine"))
        .select(
            F.col("vec_id").alias("doc_id"),
            "max_benchmark_cosine",
            (F.col("max_benchmark_cosine")
             >= CONTAMINATION_COS_THRESHOLD).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def contamination_semantic_oracle(
    threshold: float = CONTAMINATION_COS_THRESHOLD,
    bench_ids: int = BENCHMARK_VEC_IDS,
) -> str:
    return f"""
WITH prod AS (
    SELECT c.vec_id, b.vec_id AS bench_id,
           CAST(unnest(c.embedding) AS DOUBLE) AS x,
           CAST(unnest(b.embedding) AS DOUBLE) AS y
    FROM embeddings c
    JOIN embeddings b ON c.vec_id >= {bench_ids} AND b.vec_id < {bench_ids}
),
agg AS (
    SELECT vec_id, bench_id,
           {_DOT_DEC} AS dot, {_NORM_X} AS nc, {_NORM_Y} AS nb
    FROM prod GROUP BY vec_id, bench_id
),
mx AS (
    SELECT vec_id,
           MAX(ROUND(dot / (SQRT(nc) * SQRT(nb)), 6)) AS max_benchmark_cosine
    FROM agg GROUP BY vec_id
)
SELECT vec_id AS doc_id, max_benchmark_cosine,
       max_benchmark_cosine >= {threshold} AS contaminated
FROM mx ORDER BY doc_id
"""


def extension_entries5() -> list:
    from ..queries.registry import SuiteEntry

    return [
        SuiteEntry(
            "dedup_ensemble",
            run_dedup_ensemble,
            dedup_ensemble_oracle(),
            "ensemble dedup: connected components over the union of "
            "lexical (MinHash+Jaccard) and semantic (cosine) near-dup "
            "edges — the production multi-signal dedup recipe",
        ),
        SuiteEntry(
            "contamination_semantic",
            run_contamination_semantic,
            contamination_semantic_oracle(),
            "embedding-similarity decontamination screen vs the benchmark "
            "vector set (max rounded cosine + flag, BNLJ broadcast by "
            "size not by hint)",
        ),
    ]

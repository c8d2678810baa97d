"""Fuzzy string self-join under an edit-distance bound — the entity-
resolution / near-identical-key shape (titles, names, product codes).

Spark-first design: **PassJoin segment blocking** (Li, Deng & Feng,
"PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011),
not an all-pairs levenshtein:

- every key is evenly partitioned into ``tau + 1`` segments; by
  pigeonhole, ``tau`` edit operations can touch at most ``tau`` segments,
  so any match within distance ``tau`` shares at least one UNTOUCHED
  segment verbatim — shifted by at most ``tau`` positions (the net
  insert/delete count before it);
- the index side emits each key's ``tau+1`` segments; the probe side
  emits each key's substrings of segment length at every position within
  ``±tau`` of each segment's home position (``(tau+1)(2·tau+1)`` probes
  per key, window-clipped at the ends — both prunes lossless);
- candidates come from a plain hash equi-join on (segment index,
  substring); exact ``levenshtein`` runs on candidates only.

Scale: index O(n·(tau+1)) rows + probe O(n·(tau+1)(2tau+1)) rows shuffle
on uniformly-distributed substring keys — never block²; verification
touches candidate pairs only. The same shape holds at 100 TB because
segment buckets stay tiny for natural text.

No reference counterpart (datafusion-ray has no similarity join surface);
the oracle is an independent brute-force all-pairs levenshtein.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUZZY_TAU = 2
FUZZY_KEY_LEN = 24


def fuzzy_join_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = FUZZY_KEY_LEN,
    tau: int = FUZZY_TAU,
) -> DataFrame:
    """All pairs whose ``key_len``-char key prefixes are within edit
    distance ``tau``. Returns (doc_a, doc_b, dist), doc_a < doc_b.

    Keys shorter than ``key_len`` are excluded (fixed-length keys keep the
    segment layout aligned; pad upstream if short keys matter).
    """
    n_seg = tau + 1
    if key_len % n_seg:
        raise ValueError(f"key_len {key_len} must divide into {n_seg} segments")
    seg_len = key_len // n_seg

    k = df.where(F.length(text_col) >= key_len).select(
        F.col(id_col).alias("kid"),
        F.substring(text_col, 1, key_len).alias("key"),
    )
    idx = k.select(
        F.col("kid").alias("a_id"),
        F.col("key").alias("a_key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.substring("key", i * seg_len + 1, seg_len).alias("seg"),
                    )
                    for i in range(n_seg)
                ]
            )
        ).alias("e"),
    ).select("a_id", "a_key", F.col("e.i").alias("i"), F.col("e.seg").alias("seg"))

    probe_structs = []
    for i in range(n_seg):
        for d in range(-tau, tau + 1):
            pos = i * seg_len + 1 + d
            if pos < 1 or pos + seg_len - 1 > key_len:
                continue  # a shifted match past either end cannot exist
            probe_structs.append(
                F.struct(
                    F.lit(i).alias("i"),
                    F.substring("key", pos, seg_len).alias("seg"),
                )
            )
    prb = (
        k.select(
            F.col("kid").alias("b_id"),
            F.col("key").alias("b_key"),
            F.explode(F.array(*probe_structs)).alias("e"),
        )
        .select("b_id", "b_key", F.col("e.i").alias("i"), F.col("e.seg").alias("seg"))
        .distinct()  # a key can repeat a substring; one probe per (id,i,seg)
    )

    cand = (
        idx.join(prb, ["i", "seg"])
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("doc_a"),
            F.greatest("a_id", "b_id").alias("doc_b"),
            F.when(F.col("a_id") < F.col("b_id"), F.col("a_key"))
            .otherwise(F.col("b_key"))
            .alias("key_a"),
            F.when(F.col("a_id") < F.col("b_id"), F.col("b_key"))
            .otherwise(F.col("a_key"))
            .alias("key_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("key_a", "key_b").cast("int"))
        .where(F.col("dist") <= tau)
        .select("doc_a", "doc_b", "dist")
    )

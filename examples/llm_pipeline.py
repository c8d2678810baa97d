"""End-to-end training-data pipeline: the workflow a datafusion-ray user
migrates to this engine for, composed from the library operators.

    raw documents
      -> language ID + quality filter          (operators/text.py)
      -> Gopher rule flags + LM cross-entropy  (text.gopher_rules, text.lm_score)
      -> exact dedup                           (operators/dedup.py)
      -> near-dup pairs + transitive groups    (MinHash LSH + components)
      -> DSIR importance selection             (operators/dsir.py)
      -> contamination-safe train/test split   (hash split, queries/coverage4)
      -> TF-IDF top terms per surviving doc    (operators/tfidf.py)
      -> pack into token-budget context bins   (operators/packing.py)
      -> seeded shuffle, write training shards (operators/shuffleop.py)

Every stage is a DataFrame -> DataFrame transform (lazily composed; Spark
plans the whole pipeline together), so filters push into the scan and the
dedup shuffles stay narrow.

Run: python examples/llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators import dedup, packing, text
from datafusion_ray_spark.operators.tfidf import tfidf_topk
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import load_table, spread


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="llm_pipeline")
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_raw = docs.count()

    # 1. language + quality gate (pure JVM expressions; pushes into the scan)
    lang = text.lang_id(docs).select("doc_id", "lang_pred")
    qual = text.quality_score(docs).select("doc_id", "quality", "pass_min_length")
    keep = (
        docs.join(lang, "doc_id")
        .join(qual, "doc_id")
        .where(F.col("pass_min_length") & (F.col("quality") > 0.3))
    )
    n_kept = keep.count()

    # 1b. published-ruleset signals: Gopher flags (mean-word-length band
    #     here; the full conjunction is strict for synthetic text) and the
    #     CCNet-style LM cross-entropy, dropping the worst-perplexity 10%
    gopher = text.gopher_rules(docs).select("doc_id", "pass_mean_word_len")
    xent = text.lm_score(docs).select("doc_id", "xent_bits")
    cutoff = xent.approxQuantile("xent_bits", [0.9], 0.01)[0]
    keep = (
        keep.join(gopher, "doc_id")
        .join(xent, "doc_id")
        .where(F.col("pass_mean_word_len") & (F.col("xent_bits") <= cutoff))
    )

    # 2. exact dedup: keep the smallest doc_id per identical text
    exact = dedup.exact_dedup(keep)
    keep = keep.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )

    # 3. near-dup removal: MinHash LSH pairs -> transitive groups -> keep
    #    one representative (the group id) per duplicate cluster
    pairs = dedup.minhash_dedup_pairs(keep).where("is_near_dup")
    groups = dedup.duplicate_groups(pairs)
    drop = groups.where(F.col("doc_id") != F.col("group_id")).select("doc_id")
    keep = keep.join(drop, "doc_id", "left_anti")
    n_deduped = keep.count()

    # 3b. DSIR: keep the 80% of the pool most like the English subset
    from datafusion_ray_spark.operators import dsir

    sel = dsir.dsir_select(keep, keep.where(F.col("lang") == "en"), frac=0.8)
    keep = keep.join(sel.select("doc_id"), "doc_id")
    n_final = keep.count()

    # 4. contamination-safe split: deterministic hash split (no overlap by
    #    construction; see contamination_check in the suite)
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10), F.lit(10))
    train = keep.where(bucket < 9)
    test = keep.where(bucket >= 9)

    # 5. TF-IDF top terms over the training corpus
    top_terms = tfidf_topk(train.select("doc_id", "text"), k=3)

    # 6. layout for training: pack the train split into fixed token-budget
    #    context bins (distributed prefix sum — no global window)
    bins = packing.pack_stats(train, budget=512)

    # 7. final layout: seeded deterministic shuffle -> shard=K parquet
    #    files in permutation order (what the trainer streams)
    import tempfile

    from datafusion_ray_spark.operators.shuffleop import write_shards

    shard_dir = tempfile.mkdtemp(prefix="shards_")
    write_shards(train.select("doc_id", "text"), shard_dir, n_shards=4)
    n_shards_written = len(
        [p for p in os.listdir(shard_dir) if p.startswith("shard=")]
    )

    print(
        f"raw={n_raw}  quality-kept={n_kept}  after-dedup={n_deduped}  "
        f"after-dsir={n_final}"
    )
    print(f"train={train.count()}  test={test.count()}  shards={n_shards_written}")
    print("sample top terms:")
    top_terms.orderBy("doc_id", "rank").show(9, truncate=40)
    print("context bins (512-token budget):")
    bins.show(5)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

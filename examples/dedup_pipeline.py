"""LLM-data dedup pipeline: exact -> MinHash+LSH -> keep-list.

Composes the dedup operators the way a training-data pipeline would:
drop exact duplicates, then near-duplicates above a Jaccard threshold,
keeping the lowest doc_id of each duplicate group.

Run: python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators import dedup
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import load_table, spread


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="dedup_pipeline")
    docs = spread(load_table(spark, sf_dir, "documents"))
    n0 = docs.count()

    exact = dedup.exact_dedup(docs)
    survivors = docs.join(
        exact.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n1 = survivors.count()

    near = dedup.minhash_dedup_pairs(survivors).where("is_near_dup")
    drop = near.select(F.col("doc_b").alias("doc_id")).distinct()
    final = survivors.join(drop, "doc_id", "left_anti")
    n2 = final.count()

    print(f"documents: {n0} -> exact-deduped: {n1} -> near-deduped: {n2}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

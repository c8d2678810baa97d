"""Similarity search: brute-force baseline vs LSH vs materialized index.

Run: python examples/ann_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators import similarity
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import load_table, spread


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="ann_search")
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    q = list(emb.where(F.col("vec_id") == 0).first()["embedding"])

    print("brute-force top-5:")
    similarity.cosine_topk(emb, q, k=5, exclude_vec_id=0).show()

    print("LSH-bucketed top-5 (live):")
    similarity.lsh_ann_topk(emb, q, k=5, exclude_vec_id=0).show()

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ann_index"
        similarity.write_ann_index(emb, path)
        print("materialized index top-5 (partition-pruned):")
        similarity.indexed_ann_topk(spark, path, q, k=5, exclude_vec_id=0).show()

    crows = (
        emb.where(F.col("vec_id").isin(list(similarity.CENTROID_VEC_IDS)))
        .select("vec_id", "embedding").collect()
    )
    centroids = sorted((r["vec_id"], list(r["embedding"])) for r in crows)
    prows = (
        emb.where(F.col("vec_id").isin(list(similarity.PQ_SAMPLE_VEC_IDS)))
        .select("vec_id", "embedding").collect()
    )
    books = similarity.pq_codebooks([(r["vec_id"], list(r["embedding"])) for r in prows])

    print("PQ / ADC top-5 (8-byte codes, integer lookup sums):")
    similarity.pq_adc_topk(emb, q, books, k=5, exclude_vec_id=0).show()

    print("IVF-PQ top-5 (nprobe cells, then ADC):")
    similarity.ivfpq_ann_topk(emb, q, centroids, books, k=5, exclude_vec_id=0).show()

    from datafusion_ray_spark.operators import suite6

    print("binary-quantization top-5 (Hamming pre-screen, exact rerank):")
    suite6.bq_rerank_topk(emb, q, k=5, exclude_vec_id=0).show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

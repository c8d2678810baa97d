"""The manifest-committed object-store index, end to end.

Walks the full lifecycle on a local root (identical code works against
``s3://`` with client opts — see tests/test_objectindex.py for the live
moto variant): commit an IVF cell index, probe-pruned search, a
snapshot-isolated append, time travel, compaction, and retention GC.

Run: python examples/object_store_index.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators import similarity
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources import objectindex as oi
from datafusion_ray_spark.sources.tables import load_table, spread


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="object_store_index")
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in emb.where(
            F.col("vec_id").isin(list(similarity.CENTROID_VEC_IDS))
        ).collect()
    )
    root = os.path.join(tempfile.mkdtemp(), "ivf_index")

    # commit v1: the corpus, cell-assigned, one atomic pointer publish
    snapshot = emb.where(F.col("vec_id") % 7 != 3)
    m1 = oi.write_index(similarity.ivf_assign(snapshot, centroids), root)
    print(f"v{m1['version']}: {m1['rows']} rows, {len(m1['objects'])} objects")

    # probe-pruned search straight off the manifest (no listing)
    qv = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    probe = similarity.ivf_probe_cells(qv, centroids, nprobe=similarity.N_PROBE)
    hits = (
        similarity.with_cosine(
            oi.read_index(spark, root, partitions=probe), qv
        )
        .where(F.col("vec_id") != 0)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .select("vec_id", "cell", "cosine")
    )
    print(f"probing cells {probe}:")
    hits.show(5)

    # commit v2: an ingest batch — snapshot-isolated, frozen codebook
    batch = emb.where(F.col("vec_id") % 7 == 3)
    m2 = oi.write_index(
        similarity.ivf_assign(batch, centroids), root, mode="append"
    )
    print(f"v{m2['version']}: {m2['rows']} rows (append, parent v{m2['parent']})")
    print("time travel -> v1 rows:",
          oi.read_index(spark, root, version=1).count())

    # compaction is just another commit; GC sweeps beyond retention
    m3 = oi.compact_index(spark, root)
    print(f"v{m3['version']}: compacted to {len(m3['objects'])} objects")
    swept = oi.gc_index(root, keep=2, min_age_seconds=0)
    print(f"gc swept {len(swept)} keys; live rows:",
          oi.read_index(spark, root).count())


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Determinism under parallelism: the same query must produce BIT-IDENTICAL
results regardless of partitioning — the property that makes results
trustworthy on a cluster whose executor count the user doesn't control.

This is what the suite's fixed-point arithmetic (integer cents, nano-nat
log-probs, micro-unit distances), decimal-accumulated sums, and explicit
tie-breaking exist for; this layer actually varies the partitioning and
checks. Representative entries cover each arithmetic family: TPC-H money
aggregation, windowed/sessionized events, LM fixed-point scoring, DSIR
broadcast scoring, exact integer moments, MinHash banding, HLL registers,
distributed prefix-sum packing, and the ANN kernels.
"""

from __future__ import annotations

import pytest

from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.testing import canonicalize

ENTRIES = [
    "q1",
    "q18",
    "ev_session_window",
    "text_lm_score",
    "dsir_weights",
    "emb_covariance",
    "dedup_minhash_lsh",
    "sketch_hll",
    "seq_pack",
    "sim_ann_pq",
    "sim_semdedup",
    "sample_weighted",
]

# Two deliberately different parallelism profiles: few fat partitions vs
# many thin ones (shuffle partitions AND input split sizes both vary).
PROFILES = [
    {"spark.sql.shuffle.partitions": "3",
     "spark.sql.files.maxPartitionBytes": str(128 << 20)},
    {"spark.sql.shuffle.partitions": "17",
     "spark.sql.files.maxPartitionBytes": str(64 << 10)},
]


@pytest.mark.parametrize("name", ENTRIES)
def test_result_independent_of_partitioning(spark, sf_dir, name):
    entry = build_registry()[name]
    results = []
    for prof in PROFILES:
        s = spark.newSession()
        for k, v in prof.items():
            s.conf.set(k, v)
        results.append(canonicalize(entry.run(s, sf_dir).toPandas()))
    import pandas as pd

    pd.testing.assert_frame_equal(
        results[0], results[1], check_dtype=False, check_exact=True,
        obj=f"{name} under different partitionings",
    )

"""Sequence-packing operator invariants (operators/packing.py)."""

import pytest

from datafusion_ray_spark.operators import packing
from datafusion_ray_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_assign_bins_matches_sequential_cumsum(spark, docs):
    rows = packing.assign_bins(docs, budget=256, bucket_width=64).orderBy("doc_id").collect()
    base = {
        r["doc_id"]: r["n_tok"]
        for r in docs.selectExpr(
            "doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n_tok"
        ).collect()
    }
    offset = 0
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        assert r["n_tok"] == base[r["doc_id"]]
        assert r["bin_id"] == offset // 256
        assert r["straddle"] == (offset // 256 != (offset + r["n_tok"] - 1) // 256)
        offset += r["n_tok"]


def test_bucket_width_invariance(spark, docs):
    # The two-level prefix sum must agree for ANY bucketing — this is the
    # property that makes it safe to retune bucket_width at 100 TB.
    a = packing.pack_stats(docs, budget=256, bucket_width=16).collect()
    b = packing.pack_stats(docs, budget=256, bucket_width=500).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bin_token_conservation(spark, docs):
    stats = packing.pack_stats(docs, budget=512).collect()
    total = docs.selectExpr("CAST(SUM(size(split(text, ' '))) AS LONG) t").first()["t"]
    assert sum(r["bin_tokens"] for r in stats) == total
    # bin ids are strictly increasing (a doc longer than the budget may
    # legitimately skip bins it fully covers — those cut mid-document)
    ids = [r["bin_id"] for r in stats]
    assert ids == sorted(set(ids)) and ids[0] == 0

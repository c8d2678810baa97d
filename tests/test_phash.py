"""pHash near-dup: banded candidate generation must be LOSSLESS for
hamming <= PHASH_BANDS-1 (pigeonhole over the band split), pinned against
an independent numpy re-implementation of the aHash spec.

The corpus gates lost vigor here when the hash widened to 128 bits
(sf0.01 yields zero qualifying pairs), so this test builds engineered
payloads: byte-perturbed clones (low hamming), plus seeded-random
unrelated payloads, and requires the operator's pair set to equal the
brute-force all-pairs reference exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from datafusion_ray_spark.operators.multimodal import (
    PHASH_BANDS,
    PHASH_SAMPLES,
    phash_near_dup_pairs,
)

MAX_H = PHASH_BANDS - 1


def _ahash_bits(payload: bytes) -> np.ndarray:
    """Independent reference for the aHash spec in phash_bands."""
    n = len(payload)
    if n == 0:
        return np.zeros(PHASH_SAMPLES, dtype=np.int64)
    buf = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    j = np.arange(PHASH_SAMPLES, dtype=np.int64)
    s = buf[(j * n) // PHASH_SAMPLES]
    return (s * PHASH_SAMPLES > s.sum()).astype(np.int64)


def _brute_pairs(payloads: dict[int, bytes]) -> set[tuple[int, int, int]]:
    bits = {i: _ahash_bits(p) for i, p in payloads.items()}
    out = set()
    ids = sorted(payloads)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            h = int(np.sum(bits[a] != bits[b]))
            if h <= MAX_H:
                out.add((a, b, h))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_pairs_equal_bruteforce(spark, seed):
    rng = np.random.RandomState(seed)
    payloads: dict[int, bytes] = {}
    doc_id = 0
    for base in range(8):
        raw = rng.randint(0, 256, size=rng.randint(64, 400)).astype(np.uint8)
        payloads[doc_id] = raw.tobytes()
        doc_id += 1
        # clones: flip a few bytes by +-1 — usually hamming <= MAX_H, and
        # the REFERENCE decides which qualify, so every level from exact
        # dup to barely-over-threshold gets exercised.
        for n_flips in (1, 3, 9):
            mut = raw.copy()
            pos = rng.choice(len(mut), size=min(n_flips, len(mut)), replace=False)
            mut[pos] = np.clip(mut[pos].astype(np.int64) + 1, 0, 255).astype(np.uint8)
            payloads[doc_id] = mut.tobytes()
            doc_id += 1

    expected = _brute_pairs(payloads)
    assert expected, "fixture must produce at least one qualifying pair"

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()], schema
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=MAX_H).collect()
    }
    assert got == expected


def test_hub_band_cap_bounds_candidates(spark):
    """Band-buckets above band_cap are excluded from candidate generation
    (the 100x gate OOM'd on a degenerate all-ones hub before the cap).
    A clique of identical payloads larger than the cap hubs EVERY band,
    so its pairs are traded away; a small clone pair outside the hub is
    still found. This pins the exact recall contract of PHASH_HUB_CAP."""
    rng = np.random.RandomState(7)
    hub_payload = rng.randint(0, 256, size=200).astype(np.uint8).tobytes()
    pair_raw = rng.randint(0, 256, size=200).astype(np.uint8)
    pair_mut = pair_raw.copy()
    pair_mut[3] = np.clip(pair_mut[3].astype(np.int64) + 1, 0, 255)
    rows = [(i, bytearray(hub_payload)) for i in range(6)]  # 6 > cap of 4
    rows += [(100, bytearray(pair_raw.tobytes())),
             (101, bytearray(pair_mut.tobytes()))]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in phash_near_dup_pairs(df, max_hamming=MAX_H, band_cap=4).collect()
    }
    assert all(a >= 100 for a, _ in got), f"hub pairs leaked: {got}"
    if _brute_pairs({100: pair_raw.tobytes(), 101: pair_mut.tobytes()}):
        assert (100, 101) in got

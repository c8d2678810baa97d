"""Input-validation guards for the round-5 suite6 operators (advisor
round-5 low item): bq_stats must fail loudly on empty or ragged
embedding inputs instead of raising an opaque IndexError / silently
skewing per-dimension thresholds."""

from __future__ import annotations

import pytest

from datafusion_ray_spark.operators import suite6


def test_bq_stats_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        suite6.bq_stats(empty)


def test_bq_stats_ragged_vectors_raise(spark):
    ragged = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.4, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        suite6.bq_stats(ragged)


def test_bq_stats_uniform_vectors_pass(spark):
    # binary-exact values so floor(x*1e6) has no fp ambiguity
    ok = spark.createDataFrame(
        [(1, [0.25, -0.5]), (2, [0.75, 1.5]), (3, [-1.25, 0.5])],
        "vec_id long, embedding array<double>",
    )
    sums, n = suite6.bq_stats(ok)
    assert n == 3
    assert len(sums) == 2
    # micro-unit integer sums: floor(x*1e6) per value
    assert sums[0] == 250000 + 750000 - 1250000
    assert sums[1] == -500000 + 1500000 + 500000

"""Shared operator primitives.

``materialize_and_probe`` names the pattern several pipelines converged on
independently (the star-contraction terminal test in ``dedup.py``, the
PageRank size gate in ``graph.py``): pin an intermediate DataFrame AND
read one bounded statistic off it, paying exactly ONE Spark action.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame

T = TypeVar("T")


def materialize_and_probe(
    df: DataFrame, probe: Callable[[DataFrame], T]
) -> tuple[DataFrame, T]:
    """Pin ``df`` (lazy ``localCheckpoint``) and evaluate ``probe`` on the
    pinned frame in a single Spark action.

    The checkpoint is ``eager=False``, so its blocks materialize INSIDE the
    probe's job — callers get the pinned DataFrame plus the probe result
    for the price of one action, instead of the eager-checkpoint-then-
    aggregate shape that schedules two jobs (and, measured in the r7
    per-job profile, pays an extra AQE re-optimization + scheduler gap per
    occurrence — the dominant fixed cost of iterative operators at bench
    scale).

    Contract:
    - ``probe`` must be an ACTION returning a driver-bounded value (a
      count, a max, a small Row — e.g. the max-bucket-size / skew
      statistics ``profile_skew`` reports, when a pairwise operator needs
      a salt decision). Returning a DataFrame defeats the purpose.
    - ``df`` itself must be bounded enough to pin (candidate sets, edge
      lists, vertex tables — never a raw 100 TB corpus).
    - Lineage is truncated: executor loss after materialization fails the
      job rather than recomputing — acceptable for bounded intermediates.
    """
    ck = df.localCheckpoint(eager=False)
    return ck, probe(ck)

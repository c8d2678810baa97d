"""Hive-partitioned sink + pruned reads (operators/sinks.py).

Value correctness is covered by the registry oracle gate
(test_suite_oracle.py runs sink_partitioned_prune / join_dpp against
DuckDB like every other entry); these tests pin the SCALE properties —
the plan shapes and the file layout that make the operators right at
100 TB:

- the write produces hive-style ``col=value`` directories with ONE file
  per partition (repartition-before-partitionBy, the small-files rule);
- the static read prunes via ``PartitionFilters`` (non-matching
  directories never reach a task);
- the join read prunes via ``dynamicpruningexpression`` (DPP), fed by a
  runtime HAVING-filtered dim that static pushdown cannot express.
"""

from __future__ import annotations

import glob
import os

from datafusion_ray_spark.operators.sinks import (
    PRUNE_EVENT_TYPE,
    run_join_dpp,
    run_sink_partitioned_prune,
    write_events_partitioned,
)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_layout(spark, sf_dir):
    path = write_events_partitioned(spark, sf_dir, "event_type")
    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(path, "event_type=*"))
    )
    assert dirs == [
        "event_type=click", "event_type=error", "event_type=purchase",
        "event_type=signup", "event_type=view",
    ]
    for d in glob.glob(os.path.join(path, "event_type=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, (
            f"{d}: {len(files)} files — repartition-before-partitionBy "
            "must yield one file per partition directory"
        )


def test_static_partition_prune_in_plan(spark, sf_dir):
    import re

    plan = _executed_plan(run_sink_partitioned_prune(spark, sf_dir))
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m, "scan must expose PartitionFilters"
    assert re.search(rf"event_type#\d+ = {PRUNE_EVENT_TYPE}", m.group(0)), (
        "the event_type equality must reach PartitionFilters (directory "
        f"pruning), not just a post-scan Filter; got: {m.group(0)}"
    )


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    plan = _executed_plan(run_join_dpp(spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), (
        "fact scan must carry dynamicpruningexpression — the dim's "
        "runtime date set prunes event_date directories"
    )


def test_dpp_result_subset_of_days(spark, sf_dir):
    rows = run_join_dpp(spark, sf_dir).collect()
    # strict subset at every SF: the share threshold sits above the mean
    assert 0 < len(rows) < 30
    assert all(r.n_events > 0 for r in rows)


def test_compaction_reduces_file_count(spark, sf_dir):
    from datafusion_ray_spark.operators.sinks import (
        _scratch,
        run_sink_compact,
    )

    rows = run_sink_compact(spark, sf_dir)
    assert rows.count() == 5
    frag_files = glob.glob(
        os.path.join(_scratch(sf_dir, "frag"), "event_type=*", "*.parquet")
    )
    compact_files = glob.glob(
        os.path.join(
            _scratch(sf_dir, "compacted"), "event_type=*", "*.parquet"
        )
    )
    assert len(frag_files) > 5, (
        f"fragmented stage should have many small files, got {len(frag_files)}"
    )
    assert len(compact_files) == 5, (
        f"compactor must leave one file per partition, got {len(compact_files)}"
    )

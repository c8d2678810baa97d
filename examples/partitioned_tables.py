"""Partitioned table lifecycle: COPY ... PARTITIONED BY, pruned reads,
dynamic partition pruning, compaction.

The reference's output surface is ``COPY TO`` over listing tables
(``/root/reference/src/context.rs``); this example shows the Spark-first
partitioned equivalent end-to-end:

1. ``COPY ... PARTITIONED BY (col) OPTIONS (compression 'zstd')`` writes
   a hive-layout table (one file per partition directory);
2. a literal filter on the partition column is pruned before any task
   launches (static partition pruning);
3. a join against a runtime-derived dim prunes the fact scan at
   execution time (dynamic partition pruning);
4. the compaction pass rewrites a fragmented layout to one file per
   partition (operators/sinks.py).

Run: python examples/partitioned_tables.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_ray_spark import DFRayContext
from datafusion_ray_spark.operators.sinks import (
    run_join_dpp,
    run_sink_compact,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    ctx = DFRayContext()
    spark = ctx.spark
    ctx.register_parquet("events", f"{sf_dir}/events.parquet")

    # 1. partitioned COPY with compression
    out = os.path.join(tempfile.gettempdir(), "dfrs_example_events")
    ctx.sql(
        f"COPY (SELECT event_id, user_id, event_type, value FROM events) "
        f"TO '{out}' STORED AS PARQUET PARTITIONED BY (event_type) "
        f"OPTIONS (compression 'zstd')"
    ).show()
    dirs = sorted(glob.glob(os.path.join(out, "event_type=*")))
    print("partition dirs:", [os.path.basename(d) for d in dirs])

    # 2. static prune: only event_type=purchase is read
    back = spark.read.parquet(out).where("event_type = 'purchase'")
    print("purchase rows:", back.count())
    plan = back._jdf.queryExecution().executedPlan().toString()
    line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    print("scan:", line.strip()[:120])

    # 3. dynamic partition pruning (above-average revenue days)
    dpp = run_join_dpp(spark, sf_dir)
    dpp.show(5)
    dplan = dpp._jdf.queryExecution().executedPlan().toString()
    print("DPP active:", "dynamicpruning" in dplan.lower())

    # 4. compaction: fragmented append layout -> one file per partition
    run_sink_compact(spark, sf_dir).show()
    ctx.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

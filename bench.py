"""Benchmark harness: run the full query suite and emit one JSON line.

Mirrors the reference's benchmark runner shape
(``/root/reference/tpch/tpcbench.py:91-102`` — per-query seconds + total in
a JSON record). Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]``.

Usage: python bench.py [--sf-dir DIR] [--queries q1,q5,...] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--queries", default=None, help="comma-separated subset")
    parser.add_argument("--runs", type=int, default=1)
    args = parser.parse_args()

    from datafusion_ray_spark.queries.registry import build_registry
    from datafusion_ray_spark.session import build_session
    from datafusion_ray_spark.sources.tables import register_tables

    registry = build_registry()
    names = list(registry) if not args.queries else args.queries.split(",")

    spark = build_session(app_name="datafusion_ray_spark_bench")
    # Register (and thereby schema-infer) once up front so per-query timings
    # measure execution, matching how the reference times `sql+collect` after
    # registration (/root/reference/tpch/tpcbench.py:104-131).
    register_tables(spark, args.sf_dir)

    # warmup (not measured): JVM/codegen, the Python worker pool + Arrow
    # channel (mapInPandas spawns one worker per core on first use), and the
    # md5/expression intrinsics the dedup pipelines lean on.
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.sql(
        "SELECT max(md5(concat('x', CAST(id AS STRING)))) FROM range(100000)"
    ).collect()

    per_query: dict[str, float] = {}
    for name in names:
        entry = registry[name]
        best = None
        for _ in range(args.runs):
            start = time.perf_counter()
            df = entry.run(spark, args.sf_dir)
            df.collect()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        per_query[name] = round(best, 4)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "suite_total_seconds",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else args.sf_dir,
        "engine": "datafusion_ray_spark",
        "n_queries": len(per_query),
    }
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

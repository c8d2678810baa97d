"""Per-job wall-clock profiler for registry queries.

Round-7 instrument (VERDICT r6 "Next #1": *profile, don't guess* the dedup
family's sf0.1 fixed overhead). Runs the named queries with the Spark event
log enabled, then attributes every Spark job to (query, run, callsite) and
prints a per-job wall table — the per-job timing evidence SCALE.md entries
must cite.

Usage:
    python profile_jobs.py --queries dedup_minhash_lsh,dedup_lsh_eval \
        [--sf-dir /root/testdata/sf0.1] [--runs 2]

Output: one human table on stderr + one JSON line on stdout
    {"query": {"runs": [...], "jobs": [{"job", "sec", "callsite", "desc"}]}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def _read_events(log_dir: str) -> list[dict]:
    events = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths.extend(os.path.join(root, f) for f in files)
    for path in paths:
        if os.path.basename(path).startswith("appstatus_"):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return events


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--queries", required=True)
    parser.add_argument("--runs", type=int, default=2)
    args = parser.parse_args()

    from datafusion_ray_spark.queries.registry import build_registry
    from datafusion_ray_spark.session import build_session
    from datafusion_ray_spark.sources.tables import register_tables

    registry = build_registry()
    names = args.queries.split(",")
    unknown = [n for n in names if n not in registry]
    if unknown:
        parser.error(f"unknown queries: {unknown}")

    log_dir = tempfile.mkdtemp(prefix="sparkevt_")
    spark = build_session(
        app_name="profile_jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    register_tables(spark, args.sf_dir)
    sc = spark.sparkContext

    # same warmup as bench.py (JVM/codegen/python workers)
    spark.sql(
        "SELECT COUNT(*), SUM(l_quantity), MAX(l_shipdate) FROM lineitem"
    ).collect()
    spark.sql("SELECT MAX(n_chars), MAX(length(text)) FROM documents").collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.sql(
        "SELECT max(md5(concat('x', CAST(id AS STRING)))) FROM range(100000)"
    ).collect()

    walls: dict[str, list[float]] = {}
    for name in names:
        entry = registry[name]
        walls[name] = []
        for i in range(args.runs):
            sc.setJobDescription(f"PROFILE::{name}::run{i}")
            start = time.perf_counter()
            df = entry.run(spark, args.sf_dir)
            df.collect()
            walls[name].append(round(time.perf_counter() - start, 4))
            sc.setJobDescription(None)
        spark.catalog.clearCache()
        try:
            sc._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    spark.stop()
    time.sleep(1.0)  # let the event log flush/close

    events = _read_events(log_dir)
    starts: dict[int, dict] = {}
    out: dict[str, dict] = {n: {"runs": walls[n], "jobs": []} for n in names}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            starts[ev["Job ID"]] = ev
        elif kind == "SparkListenerJobEnd":
            st = starts.get(ev["Job ID"])
            if not st:
                continue
            props = st.get("Properties") or {}
            desc = props.get("spark.job.description", "")
            if not desc.startswith("PROFILE::"):
                continue
            _, qname, run = desc.split("::")
            sec = (ev["Completion Time"] - st["Submission Time"]) / 1000.0
            stages = st.get("Stage Infos") or []
            callsite = (
                props.get("callSite.short")
                or (stages[-1].get("Stage Name") if stages else "?")
            )
            out[qname]["jobs"].append({
                "job": ev["Job ID"],
                "run": run,
                "sec": round(sec, 3),
                "n_stages": len(stages),
                "n_tasks": sum(s.get("Number of Tasks", 0) for s in stages),
                "callsite": callsite,
            })
    for qname, rec in out.items():
        print(f"\n=== {qname}  walls={rec['runs']}", file=sys.stderr)
        for j in sorted(rec["jobs"], key=lambda x: (x["run"], x["job"])):
            print(
                f"  {j['run']} job{j['job']:>4} {j['sec']:>7.3f}s "
                f"stages={j['n_stages']:>2} tasks={j['n_tasks']:>4} "
                f"{j['callsite']}",
                file=sys.stderr,
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

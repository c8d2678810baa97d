"""Capture `.explain("formatted")` dumps for named registry queries.

Usage: python plans/capture.py --suffix before --queries a,b,c [--round r12]
Writes plans/<round>/<query>_<suffix>.txt (the judge-auditable plan
evidence for every touched query; the before-plans come from the
pre-change tree, the after-plans from the final tree).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--queries", required=True)
    p.add_argument("--suffix", required=True)
    p.add_argument("--round", default="r12")
    args = p.parse_args()

    from datafusion_ray_spark.plans import formatted_plan
    from datafusion_ray_spark.queries.registry import build_registry
    from datafusion_ray_spark.session import build_session

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           args.round)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="plan_capture")
    registry = build_registry()
    for name in args.queries.split(","):
        df = registry[name].run(spark, args.sf_dir)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

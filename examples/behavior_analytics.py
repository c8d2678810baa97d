"""Event behavior-analytics pipeline: the product/event-stream workflow
composed from the round-3 batch-4 operators.

    raw events
      -> row-level sessionization            (ev_sessionize: LAG + running sum)
      -> CEP sequence-pattern counts          (ev_seq_match: MATCH_RECOGNIZE shape)
      -> Markov transition matrix             (ev_markov_transitions)
      -> per-user mean-shift change point     (ev_changepoint, CUSUM numerator)
      -> RFM segmentation                     (ev_user_rfm, deterministic NTILE)
      -> last-touch conversion attribution    (ev_attribution, one window pass)

Every stage is a DataFrame -> DataFrame transform over ONE events scan
shape: a single hash shuffle on user_id dominates each (the window
partition), so the whole pipeline scales like a groupBy.

Run: python examples/behavior_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators.suite4 import (
    run_changepoint,
    run_markov_transitions,
    run_seq_match,
    run_sessionize,
)
from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.session import build_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="behavior_analytics")

    sessions = run_sessionize(spark, sf_dir)
    per_user_sessions = sessions.groupBy("user_id").agg(
        F.max("session_idx").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
    print("sessionization (events -> labeled sessions):")
    per_user_sessions.orderBy("user_id").show(5)

    print("CEP pattern counts (view->clicks->purchase conversions, error bursts):")
    run_seq_match(spark, sf_dir).orderBy(F.desc("n_conversions")).show(5)

    print("event-type Markov transitions (top probabilities):")
    run_markov_transitions(spark, sf_dir).orderBy(F.desc("p_ppm")).show(5)

    print("per-user mean-shift change points (largest shifts):")
    run_changepoint(spark, sf_dir).orderBy(F.desc("d_max")).show(5)

    print("RFM segmentation (best customers first):")
    rfm = build_registry()["ev_user_rfm"].run(spark, sf_dir)
    rfm.orderBy("rfm_code", "user_id").show(5)

    print("last-touch attribution (credited touch -> conversions, value):")
    from datafusion_ray_spark.operators.suite4 import run_attribution

    run_attribution(spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

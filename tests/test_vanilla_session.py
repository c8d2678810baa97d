"""The driver contract's hardest case, tested literally: a FRESH JVM built
with a plain ``SparkSession.builder.getOrCreate()`` — none of the engine's
session defaults (no nanosAsLong, no Arrow confs, no UTC timezone; an
adversarial non-UTC zone instead) — must still produce oracle-exact
results for timezone-sensitive queries, because ``load_table`` applies its
defenses per-read. (The in-suite adverse-session test clones the engine
session's conf; this subprocess inherits nothing.)"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
import duckdb

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.sources.tables import duckdb_register
from datafusion_ray_spark.testing import assert_frames_match

sf = "/root/testdata/sf0.001"
con = duckdb.connect()
duckdb_register(con, sf)
reg = build_registry()
for name in ["q1", "ev_session_window", "ev_daily_pivot", "join_range", "ev_sessionize", "ev_gap_histogram", "ev_seq_match", "sink_partitioned_prune", "join_dpp", "sink_compact", "text_hash_embed", "mm_phash_dedup", "dedup_index_compact", "sim_ivf_compact"]:
    assert_frames_match(
        reg[name].run(spark, sf).toPandas(), con.sql(reg[name].oracle).df(), name=name
    )
    print("OK", name, flush=True)
spark.stop()
"""


def test_queries_green_under_truly_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    # Timezone-sensitive queries PLUS the round-6 driver-window additions
    # that write files (partitioned sink / DPP / compaction) and the two
    # driver-canon schema fixes — the surfaces most likely to depend on an
    # engine-session conf by accident.
    # ... plus the round-9 compaction operators, which exercise the
    # catalog (ALTER TABLE SET LOCATION) and filesystem swap surfaces a
    # vanilla session configures differently.
    for name in ("q1", "ev_session_window", "ev_daily_pivot", "join_range",
                 "ev_sessionize", "ev_gap_histogram", "ev_seq_match",
                 "sink_partitioned_prune", "join_dpp", "sink_compact",
                 "text_hash_embed", "mm_phash_dedup",
                 "dedup_index_compact", "sim_ivf_compact"):
        assert f"OK {name}" in proc.stdout

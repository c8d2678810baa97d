#!/bin/bash
# Round-12 closeout: the ONE serial artifact chain on the final 194-entry
# tree. Same 10-step shape as r11 (.r11e_closeout.sh); SHUFFLE_BASELINE
# regenerated BEFORE this chain (drift gate inside step 1 compares live
# plans against the committed ledger); CERT_LEDGER regenerated LAST.
set -e
cd /root/repo
echo "=== orphan check ===" && date
pgrep -f "SparkSubmit|bench.py" | grep -v $$ || true

echo "=== 1/10 full pytest ===" && date
python -m datafusion_ray_spark.certledger > /tmp/r12e_ledger_pre.log 2>&1
python -m pytest tests/ -q > /tmp/r12e_pytest.log 2>&1 || { tail -5 /tmp/r12e_pytest.log; exit 1; }
tail -2 /tmp/r12e_pytest.log

echo "=== 2/10 bench (sf0.1, 194 queries, calibration) ===" && date
python bench.py > /tmp/r12e_bench.log 2>&1

echo "=== 3/10 shuffle baseline (194 queries) ===" && date
python shuffle_report.py > /tmp/r12e_shuffle.log 2>&1

echo "=== 4/10 correctness_local sf0.01 ===" && date
python correctness_local.py --sf-dir /root/testdata/sf0.01 --out CORRECTNESS_LOCAL.json > /tmp/r12e_corr.log 2>&1

echo "=== 5/10 multifile correctness ===" && date
python - > /tmp/r12e_mf.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.01", "/root/repo/.mfdata_r12e")
EOF
python correctness_local.py --sf-dir /root/repo/.mfdata_r12e --out CORRECTNESS_MULTIFILE.json >> /tmp/r12e_mf.log 2>&1

echo "=== 6/10 multifile bench (sf0.1 32-part layout, 194 queries) ===" && date
python - > /tmp/r12e_mfbench.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.1", "/root/repo/.mfdata_r12e_sf01")
EOF
python bench.py --sf-dir /root/repo/.mfdata_r12e_sf01 --detail-out BENCH_MULTIFILE.json >> /tmp/r12e_mfbench.log 2>&1

echo "=== 7/10 scaling 10x (intra-epoch) ===" && date
python scale_check.py --copies 10 --out SCALING_r12.json > /tmp/r12e_x10.log 2>&1

echo "=== 8/10 scaling 100x (standing PassJoin exclusion) ===" && date
QUERIES=$(python - <<'EOF'
from datafusion_ray_spark.queries.registry import build_registry
names = [n for n in build_registry()
         if n not in ("dedup_fuzzy_prefix", "dedup_fuzzy_groups")]
print(",".join(names))
EOF
)
python scale_check.py --copies 100 --queries "$QUERIES" --out SCALING_X100_r12.json > /tmp/r12e_x100.log 2>&1

echo "=== 9/10 driver-window rehearsal: the 50-entry window in a VANILLA session at sf0.01 ===" && date
python - > /tmp/r12e_window.log 2>&1 <<'EOF'
import sys
from pyspark.sql import SparkSession
import duckdb
spark = (
    SparkSession.builder.master("local[8]")
    .appName("r12e_window_rehearsal")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)
from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.sources.tables import duckdb_register
from datafusion_ray_spark.testing import assert_frames_match
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
duckdb_register(con, sf)
reg = build_registry()
window = list(reg)[:50]
bad = []
for name in window:
    try:
        assert_frames_match(
            reg[name].run(spark, sf).toPandas(),
            con.sql(reg[name].oracle).df(), name=name,
        )
        print("ok", name, flush=True)
    except Exception as exc:
        bad.append(name)
        print("FAIL", name, exc, flush=True)
print(f"window rehearsal: {len(window) - len(bad)}/{len(window)} green; bad={bad}")
sys.exit(1 if bad else 0)
EOF
tail -1 /tmp/r12e_window.log

echo "=== 10/10 throughput + plans + LEDGER-LAST + drift-gate ===" && date
python bench.py --family-throughput > /tmp/r12e_thru.log 2>&1
python plan_report.py > /tmp/r12e_plans.log 2>&1
python -m datafusion_ray_spark.certledger > /tmp/r12e_ledger.log 2>&1
python -m pytest tests/test_shuffle_drift.py tests/test_scaling.py tests/test_cert_ledger.py -q > /tmp/r12e_drift.log 2>&1
tail -2 /tmp/r12e_drift.log
echo "=== DONE (commit everything now; any further code edit re-fails test_ledger_regenerated_at_head) ===" && date

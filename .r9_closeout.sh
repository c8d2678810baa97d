#!/bin/bash
# Round-9 closeout: ONE serial artifact chain on final code (round protocol).
set -e
cd /root/repo
echo "=== orphan check ===" && date
pgrep -f "SparkSubmit|bench.py" | grep -v $$ || true

echo "=== 1/9 full pytest (fail fast before the long gates) ===" && date
python -m pytest tests/ -q > /tmp/r9_pytest.log 2>&1 || { tail -5 /tmp/r9_pytest.log; exit 1; }
tail -2 /tmp/r9_pytest.log

echo "=== 2/9 bench 1x re-baseline (sf0.1, current epoch) ===" && date
python bench.py > /tmp/r9_bench.log 2>&1

echo "=== 3/9 shuffle baseline (192 queries) ===" && date
python shuffle_report.py > /tmp/r9_shuffle.log 2>&1

echo "=== 4/9 correctness_local sf0.01 ===" && date
python correctness_local.py --sf-dir /root/testdata/sf0.01 --out CORRECTNESS_LOCAL.json > /tmp/r9_corr.log 2>&1

echo "=== 5/9 multifile correctness ===" && date
python - > /tmp/r9_mf.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.01", "/root/repo/.mfdata_r9")
EOF
python correctness_local.py --sf-dir /root/repo/.mfdata_r9 --out CORRECTNESS_MULTIFILE.json >> /tmp/r9_mf.log 2>&1

echo "=== 6/9 multifile bench (sf0.1 32-part layout, 192 queries) ===" && date
python - > /tmp/r9_mfbench.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.1", "/root/repo/.mfdata_r9_sf01")
EOF
python bench.py --sf-dir /root/repo/.mfdata_r9_sf01 --detail-out BENCH_MULTIFILE.json >> /tmp/r9_mfbench.log 2>&1

echo "=== 7/9 scaling 10x (re-based, intra-epoch) ===" && date
python scale_check.py --copies 10 --out SCALING_r09.json > /tmp/r9_x10.log 2>&1

echo "=== 8/9 scaling 100x (standing PassJoin exclusion) ===" && date
QUERIES=$(python - <<'EOF'
from datafusion_ray_spark.queries.registry import build_registry
names = [n for n in build_registry()
         if n not in ("dedup_fuzzy_prefix", "dedup_fuzzy_groups")]
print(",".join(names))
EOF
)
python scale_check.py --copies 100 --queries "$QUERIES" --out SCALING_X100_r09.json > /tmp/r9_x100.log 2>&1

echo "=== 9/9 throughput + plans + drift-gate recheck ===" && date
python bench.py --family-throughput > /tmp/r9_thru.log 2>&1
python plan_report.py > /tmp/r9_plans.log 2>&1
python -m pytest tests/test_shuffle_drift.py tests/test_scaling.py -q > /tmp/r9_drift.log 2>&1
tail -2 /tmp/r9_drift.log
echo "=== DONE ===" && date

#!/bin/bash
# Round-8 closeout: ONE serial artifact chain on final code (round protocol).
set -e
cd /root/repo
echo "=== orphan check ===" && date
pgrep -f "SparkSubmit|bench.py" | grep -v $$ || true

echo "=== 1/7 bench (sf0.1) ===" && date
python bench.py > /tmp/r8_bench.log 2>&1

echo "=== 2/7 shuffle baseline ===" && date
python shuffle_report.py > /tmp/r8_shuffle.log 2>&1

echo "=== 3/7 correctness_local sf0.01 ===" && date
python correctness_local.py --sf-dir /root/testdata/sf0.01 --out CORRECTNESS_LOCAL.json > /tmp/r8_corr.log 2>&1

echo "=== 4/7 multifile correctness ===" && date
python - > /tmp/r8_mf.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.01", "/root/repo/.mfdata_r8")
EOF
python correctness_local.py --sf-dir /root/repo/.mfdata_r8 --out CORRECTNESS_MULTIFILE.json >> /tmp/r8_mf.log 2>&1

echo "=== 5/7 scaling 10x ===" && date
python scale_check.py --copies 10 --out SCALING_r08.json > /tmp/r8_x10.log 2>&1

echo "=== 6/7 scaling 100x ===" && date
QUERIES=$(python - <<'EOF'
from datafusion_ray_spark.queries.registry import build_registry
names = [n for n in build_registry()
         if n not in ("dedup_fuzzy_prefix", "dedup_fuzzy_groups")]
print(",".join(names))
EOF
)
python scale_check.py --copies 100 --queries "$QUERIES" --out SCALING_X100_r08.json > /tmp/r8_x100.log 2>&1

echo "=== 7/7 throughput + pytest ===" && date
python bench.py --family-throughput > /tmp/r8_thru.log 2>&1
python -m pytest tests/ -q > /tmp/r8_pytest_final.log 2>&1
echo "=== DONE ===" && date
tail -2 /tmp/r8_pytest_final.log

#!/bin/bash
# Round-7 closeout: ONE serial artifact chain on final code (round protocol).
set -e
cd /root/repo
echo "=== orphan check ===" && date
pgrep -f "SparkSubmit|bench.py" | grep -v $$ || true

echo "=== 1/7 bench (sf0.1) ===" && date
python bench.py > /tmp/r7_bench.log 2>&1

echo "=== 2/7 shuffle baseline ===" && date
python shuffle_report.py > /tmp/r7_shuffle.log 2>&1

echo "=== 3/7 correctness_local sf0.01 ===" && date
python correctness_local.py --sf-dir /root/testdata/sf0.01 --out CORRECTNESS_LOCAL.json > /tmp/r7_corr.log 2>&1

echo "=== 4/7 multifile correctness ===" && date
python - > /tmp/r7_mf.log 2>&1 <<'EOF'
from datafusion_ray_spark.testing import make_multifile
make_multifile("/root/testdata/sf0.01", "/root/repo/.mfdata_r7")
EOF
python correctness_local.py --sf-dir /root/repo/.mfdata_r7 --out CORRECTNESS_MULTIFILE.json >> /tmp/r7_mf.log 2>&1

echo "=== 5/7 scaling 10x ===" && date
python scale_check.py --copies 10 --out SCALING_r07.json > /tmp/r7_x10.log 2>&1

echo "=== 6/7 scaling 100x ===" && date
QUERIES=$(python - <<'EOF'
from datafusion_ray_spark.queries.registry import build_registry
names = [n for n in build_registry()
         if n not in ("dedup_fuzzy_prefix", "dedup_fuzzy_groups")]
print(",".join(names))
EOF
)
python scale_check.py --copies 100 --queries "$QUERIES" --out SCALING_X100_r07.json > /tmp/r7_x100.log 2>&1

echo "=== 7/7 throughput + pytest ===" && date
python bench.py --family-throughput > /tmp/r7_thru.log 2>&1
python -m pytest tests/ -q > /tmp/r7_pytest.log 2>&1
echo "=== DONE ===" && date
tail -2 /tmp/r7_pytest.log

"""Oracle-verify a named subset at the three local SFs (r12 rewrite gate)."""
import sys

import duckdb

from datafusion_ray_spark.queries.registry import build_registry
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import duckdb_register
from datafusion_ray_spark.testing import assert_frames_match

names = sys.argv[1].split(",")
sfs = (sys.argv[2].split(",") if len(sys.argv) > 2
       else ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
             "/root/testdata/sf0.1"])
spark = build_session(app_name="r12_verify_subset")
reg = build_registry()
bad = []
for sf in sfs:
    con = duckdb.connect()
    duckdb_register(con, sf)
    for name in names:
        entry = reg[name]
        try:
            if entry.oracle is None:
                entry.run(spark, sf).collect()
                print(f"ok(rows-only) {name} @ {sf}", flush=True)
            else:
                assert_frames_match(
                    entry.run(spark, sf).toPandas(),
                    con.sql(entry.oracle).df(), name=name)
                print(f"ok {name} @ {sf}", flush=True)
        except Exception as exc:  # noqa: BLE001
            bad.append((name, sf))
            print(f"FAIL {name} @ {sf}: {exc}", flush=True)
        spark.catalog.clearCache()
    con.close()
print("ALL GREEN" if not bad else f"FAILURES: {bad}")
sys.exit(1 if bad else 0)

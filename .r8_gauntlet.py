"""Round-8 vanilla-session gauntlet: reproduce the driver's correctness
gate exactly — a FRESH plain SparkSession (non-UTC timezone, none of the
engine's session confs) runs the FIRST 50 registry entries (the driver
certification window) at sf0.01 against DuckDB, value-hash compared.

Run: python .r8_gauntlet.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from datafusion_ray_spark.queries.registry import build_registry  # noqa: E402
from datafusion_ray_spark.sources.tables import duckdb_register  # noqa: E402
from datafusion_ray_spark.testing import assert_frames_match  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("r8_gauntlet")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    duckdb_register(con, sf)
    reg = build_registry()
    window = list(reg)[:50]
    failed = []
    for i, name in enumerate(window):
        t0 = time.perf_counter()
        try:
            entry = reg[name]
            spark_pdf = entry.run(spark, sf).toPandas()
            if entry.oracle is None:
                assert len(spark_pdf) > 0, f"{name}: rows-only entry returned 0 rows"
                print(f"[{i+1:2}/50] OK(rows-only) {name}", flush=True)
                continue
            oracle_pdf = con.sql(entry.oracle).df()
            assert_frames_match(spark_pdf, oracle_pdf, name=name)
            print(
                f"[{i+1:2}/50] OK {name} "
                f"({len(spark_pdf)} rows, {time.perf_counter()-t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - gauntlet must finish
            failed.append(name)
            print(f"[{i+1:2}/50] FAIL {name}: {str(e)[:300]}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    print(f"gauntlet: {50 - len(failed)}/50 green; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

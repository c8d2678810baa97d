"""Basic usage — the reference's ``examples/tips.py`` shape
(``/root/reference/examples/tips.py``: DFRayContext -> register_parquet ->
sql -> show), against the driver testdata.

Run: python examples/basic.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_ray_spark import DFRayContext


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    ctx = DFRayContext(batch_size=8192)
    ctx.register_parquet("nation", f"{sf_dir}/nation.parquet")
    ctx.register_parquet("customer", f"{sf_dir}/customer.parquet")

    df = ctx.sql(
        """
        SELECT n_name, COUNT(*) AS customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY customers DESC, n_name
        """
    )
    df.show(10)
    print("schema:", df.schema())
    print("stages:", len(df.stages()))
    batches = df.collect()  # Arrow record batches, like the reference
    print("arrow batches:", len(batches), "rows:", sum(b.num_rows for b in batches))
    ctx.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

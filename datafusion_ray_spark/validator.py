"""Local correctness oracle, mirroring the reference's ``LocalValidator``.

The reference validates distributed results against a single-process
DataFusion context with the same registration surface
(``datafusion_ray.util.LocalValidator`` — ``/root/reference/src/util.rs:414-484``,
used by ``tpch/tpcbench.py:68,133-139``). Here the oracle engine is DuckDB
(per BASELINE.json), wrapped in the same API shape: ``register_parquet`` /
``register_csv`` / ``register_listing_table`` / ``collect_sql`` returning
Arrow record batches.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa


class LocalValidator:
    """Single-process DuckDB session with the reference's register/collect
    API, for engine-vs-oracle comparison."""

    def __init__(self) -> None:
        self.con = duckdb.connect()

    def register_parquet(self, name: str, path: str) -> None:
        self.con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )

    def register_csv(self, name: str, path: str) -> None:
        self.con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_csv_auto('{path}')"
        )

    def register_listing_table(self, name: str, path: str) -> None:
        glob = path.rstrip("/") + "/*.parquet"
        self.con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{glob}')"
        )

    def collect_sql(self, query: str) -> list[pa.RecordBatch]:
        return self.con.sql(query).arrow().to_batches()

    def sql(self, query: str):
        return self.con.sql(query)


def prettify(batches: list[pa.RecordBatch]) -> str:
    """ASCII-render Arrow batches (reference: ``prettify`` in
    ``/root/reference/src/util.rs:199-210``)."""
    if not batches:
        return "(empty)"
    return pa.Table.from_batches(batches).to_pandas().to_string(index=False)

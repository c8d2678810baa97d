"""Cross-engine result comparison for the DuckDB oracle gate.

The reference validates by exact string-compare of pretty-printed batches,
which works only because both sides are the same engine
(``/root/reference/tpch/tpcbench.py:133-139``). Cross-engine (Spark vs
DuckDB) comparison instead canonicalizes both results (column order, row
order, timezone metadata) and then requires EXACT value equality — the query
suite is written so that floating-point results are bit-identical across
engines (see queries/tpch.py docstring), which is what the driver's
order-insensitive value-hash demands.
"""

from __future__ import annotations

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize timestamps to naive us-precision,
    then sort rows by all columns."""
    import datetime

    out = df[sorted(df.columns)].copy()
    for col in out.columns:
        dtype = out[col].dtype
        if isinstance(dtype, pd.DatetimeTZDtype):
            out[col] = out[col].dt.tz_convert("UTC").dt.tz_localize(None)
        elif dtype == object and out[col].map(
            lambda v: v is None or isinstance(v, datetime.date)
        ).all() and out[col].notna().any():
            # Spark returns DATE as datetime.date objects; DuckDB's .df()
            # renders DATE as datetime64 — align on datetime64.
            out[col] = pd.to_datetime(out[col])
        if str(out[col].dtype).startswith("datetime64"):
            out[col] = out[col].astype("datetime64[us]")
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), na_position="first")
    return out.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    left, right = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(left.columns) == list(right.columns), (
        f"{name}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"{name}: row count {len(left)} vs {len(right)}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True, obj=name or "result")

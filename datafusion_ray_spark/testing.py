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
        if out[col].dtype == object:
            # Array/map cells arrive as ndarray (DuckDB) / list (Spark) /
            # dict (Spark maps): normalize to nested tuples so rows are
            # sortable and comparable by value.
            out[col] = out[col].map(_freeze)
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), na_position="first")
    return out.reset_index(drop=True)


def _freeze(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(_freeze(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        return v.item()
    return v


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    left, right = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(left.columns) == list(right.columns), (
        f"{name}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"{name}: row count {len(left)} vs {len(right)}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True, obj=name or "result")

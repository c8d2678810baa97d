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


def generate_skewed_testdata(
    out_dir: str,
    n_events: int = 400_000,
    hot_user: int = 1,
    hot_frac: float = 0.5,
    n_users: int = 200,
    n_docs: int = 600,
    hot_source_frac: float = 0.6,
    seed: int = 7,
) -> str:
    """Write a zipfian-keyed events.parquet + documents.parquet into
    ``out_dir`` (same schemas as the driver testdata, ts as NTZ micros).

    The driver's sf* testdata is roughly uniform, so AQE's skew-join path
    and hot-key window/groupBy behavior are never exercised by it. This
    fixture makes skew the point: one hot user owns ``hot_frac`` of all
    events (with an incompressible 128-char props payload so the hot
    shuffle partition is genuinely oversized on the wire, not just in row
    count), the rest spread zipf-ish over ``n_users``; one hot documents
    source owns ``hot_source_frac`` of docs (a hot dedup blocking key)
    with template near-duplicates inside it. Deterministic for a given
    seed. Returns ``out_dir``.
    """
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- events -----------------------------------------------------------
    n_hot = int(n_events * hot_frac)
    cold = 2 + (rng.zipf(1.5, size=n_events - n_hot) - 1) % (n_users - 1)
    user_id = np.concatenate([np.full(n_hot, hot_user), cold]).astype("int64")
    perm = rng.permutation(n_events)
    user_id = user_id[perm]
    base_us = 1_700_000_000_000_000  # 2023-11-14 UTC, epoch micros
    ts_us = base_us + rng.integers(0, 30 * 86_400_000_000, size=n_events)
    types = np.array(["view", "click", "purchase", "error", "signup"])
    event_type = types[rng.integers(0, 5, size=n_events)]
    value = np.round(rng.random(n_events) * 100, 3)
    # 4 DISTINCT md5 hexes per row (128 chars): a repeated digest would be
    # LZ4-deduplicated in the shuffle, deflating the hot partition below
    # the skew thresholds the fixture exists to trip.
    props = [
        "".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            for j in range(4)
        )
        for i in range(n_events)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_events), pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(user_id),
                "event_type": pa.array(event_type),
                "value": pa.array(value, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        os.path.join(out_dir, "events.parquet"),
        # many row groups: a single-row-group file is unsplittable, which
        # would leave every reduce partition with one mapper sub-range and
        # make AQE's skew split (which splits by mapper ranges) a no-op.
        row_group_size=25_000,
    )

    # --- documents --------------------------------------------------------
    words = [f"w{i:03d}" for i in range(400)]
    n_hot_docs = int(n_docs * hot_source_frac)
    texts, sources = [], []
    for i in range(n_docs):
        in_hot = i < n_hot_docs
        sources.append("hotsrc" if in_hot else f"src{i % 7}")
        if in_hot and i % 3 != 0:
            # template near-duplicate: shared 28-word base, 2 words varied
            t = [words[(j * 7) % 97] for j in range(28)]
            t[5] = words[100 + i % 11]
            t[20] = words[200 + i % 13]
        else:
            t = [words[int(x)] for x in rng.integers(0, 400, size=30)]
        texts.append(" ".join(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )
    return out_dir


def make_multifile(src_dir: str, out_dir: str, big_parts: int = 32) -> str:
    """Rewrite a single-file testdata dir as a realistic multi-file layout.

    All three driver sf* dirs are single-file single-row-group parquet —
    the degenerate layout ``sources.tables.spread()`` exists to paper
    over. A real 100 TB table is thousands of files; this rewrites each
    corpus-scaling table as ``<out>/<table>.parquet/part-*.parquet``
    (``big_parts`` files, one row group each, so scans split naturally)
    while tiny dimensions stay single-file, and the full oracle + bench
    gates can run against the result unchanged. Returns ``out_dir``.
    """
    import math
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(src_dir, fname)
        table = pq.read_table(src)
        n = table.num_rows
        parts = big_parts if n >= 50_000 else (8 if n >= 5_000 else 1)
        dst = os.path.join(out_dir, fname)
        if parts == 1:
            pq.write_table(table, dst)
            continue
        os.makedirs(dst, exist_ok=True)
        step = math.ceil(n / parts)
        for i in range(parts):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(
                    chunk, os.path.join(dst, f"part-{i:05d}.parquet")
                )
    return out_dir

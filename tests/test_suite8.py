"""Round-11 suite8 entries: persisted-ANN search on the
manifest-committed object-store index (``operators/suite8.py``)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from datafusion_ray_spark.operators import similarity, suite8
from datafusion_ray_spark.queries.registry import build_registry


def _oracle_frame(oracle, sql) -> pd.DataFrame:
    df = oracle.sql(sql).df()
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def _spark_frame(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.reindex(sorted(pdf.columns), axis=1).reset_index(drop=True)


def test_oidx_persist_matches_oracle_and_prunes(spark, oracle, sf_dir):
    reg = build_registry()
    entry = reg["sim_oidx_persist"]
    got = entry.run(spark, sf_dir)
    # the scan must touch ONLY the probed cells' manifest-listed objects
    scanned = got.inputFiles()
    assert scanned, "expected a pinned file list"
    cells = {os.path.basename(os.path.dirname(f)) for f in scanned}
    assert len(cells) == similarity.N_PROBE
    assert all(c.startswith("cell=") for c in cells)
    assert _spark_frame(got).astype(str).equals(
        _oracle_frame(oracle, entry.oracle).astype(str)
    )


def test_oidx_replace_matches_oracle_and_is_discriminating(spark, oracle, sf_dir):
    """Oracle equality after the replace commit — and the corrupted v1
    must FAIL the same comparison, or the entry proves nothing."""
    from datafusion_ray_spark.operators.suite7 import _ivf_codebook
    from datafusion_ray_spark.sources.tables import load_table, spread

    reg = build_registry()
    entry = reg["sim_oidx_replace"]
    got = entry.run(spark, sf_dir)
    want = _oracle_frame(oracle, entry.oracle)
    assert _spark_frame(got).astype(str).equals(want.astype(str))

    # time-travel to v1 (the corrupted snapshot): junk rows with real
    # embeddings must pollute the top-k there — negative vec_ids appear
    from datafusion_ray_spark.sources import objectindex as oi

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    root = suite8._oidx_root(sf_dir, "_rpl")
    v1 = oi.read_index(spark, root, version=1)
    qv = [float(v) for v in emb.where("vec_id = 0").first()["embedding"]]
    probe = similarity.ivf_probe_cells(qv, centroids, nprobe=similarity.N_PROBE)
    junk_hits = (
        similarity.with_cosine(v1.where(F.col("cell").isin(probe)), qv)
        .where(F.col("vec_id") < 0)
        .count()
    )
    assert junk_hits > 0, "v1 must actually contain the corrupted rows"

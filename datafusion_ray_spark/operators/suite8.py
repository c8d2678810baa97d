"""Round-11 extension batch: ANN search against the MANIFEST-COMMITTED
object-store index (``sources/objectindex.py``) — suite7's persisted-IVF
lifecycle re-expressed on the storage layout that survives an object
store (immutable data objects, nonce-named version manifests, a pointer
compare-and-swap as the one commit; no renames anywhere).

Same contract as ``suite.py``..``suite7.py``: each entry pairs a Spark
callable with an independently-written DuckDB oracle. Both entries reuse
suite7's EXHAUSTIVE IVF oracle — index storage must never change
answers, so the bar is byte-equality with the in-plan search:

- ``sim_oidx_persist``: one-shot index commit, then a probe-pruned scan
  planned entirely from the manifest (the probed cells' explicit file
  list — no directory listing exists to prune).
- ``sim_oidx_replace``: dynamic partition overwrite. Version 1 lands
  the PROBED cells with corrupted rows (negated vec_ids); one
  ``mode="replace"`` commit swaps exactly those partitions wholesale.
  Oracle equality PROVES the replacement semantics: an append-shaped
  bug would leave the junk rows in the index and they would win top-k
  slots (their embeddings are real), failing the value-hash.

At 100 TB the difference from ``sim_ivf_persist`` is operational, not
semantic: commits are atomic pointer swaps instead of directory
renames, a week-long reader keeps one consistent snapshot while ingest
commits behind it, and partition pruning is a manifest filter instead
of a prefix listing.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from . import similarity
from .suite7 import _ivf_codebook, _register_scratch, _scratch_tag


def _oidx_root(sf_dir: str, suffix: str) -> str:
    """Per-pid scratch root for the committed index (same reaping
    discipline as suite7's persisted-index scratch)."""
    return _register_scratch(
        os.path.join(
            tempfile.gettempdir(), "dfrs_oidx", _scratch_tag(sf_dir) + suffix
        )
    )


def _oidx_search(spark: SparkSession, sf_dir: str, root: str,
                 centroids: list[tuple]) -> DataFrame:
    """Probe-pruned search against the committed index: resolve the
    pointer once, scan ONLY the probed cells' manifest-listed objects,
    exact cosine + top-k above the pruned scan."""
    from ..sources.objectindex import read_index
    from .shared import _query_vec

    qv = _query_vec(spark, sf_dir)
    probe = similarity.ivf_probe_cells(qv, centroids, nprobe=similarity.N_PROBE)
    index = read_index(spark, root, partitions=probe)
    out = similarity.with_cosine(index, qv).where(F.col("vec_id") != 0)
    return (
        out.select("vec_id", F.col("cell").cast("int").alias("cell"), "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


def run_oidx_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against an index COMMITTED to the manifest store:
    assign with the frozen codebook, land immutable cell objects, commit
    via the pointer swap, answer from the probe-pruned manifest scan.
    Result must be identical to the in-plan ``sim_ann_ivf`` — shares its
    exhaustive DuckDB oracle."""
    from ..sources.objectindex import write_index

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    root = _oidx_root(sf_dir, "")
    write_index(
        similarity.ivf_assign(emb, centroids), root, partition_col="cell",
        mode="overwrite",
    )
    return _oidx_search(spark, sf_dir, root, centroids)


def run_oidx_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite, certified by the search answer:
    version 1 lands the probed cells CORRUPTED (vec_ids negated — their
    embeddings are real, so if replacement failed they would win top-k
    slots), then one ``mode="replace"`` commit swaps exactly those
    partitions with the correct rows. The search equals the one-shot
    oracle only if the junk partitions were replaced wholesale."""
    from ..sources.objectindex import write_index
    from .shared import _query_vec

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    qv = _query_vec(spark, sf_dir)
    probe = similarity.ivf_probe_cells(qv, centroids, nprobe=similarity.N_PROBE)
    assigned = similarity.ivf_assign(emb, centroids)
    corrupted = assigned.withColumn(
        "vec_id",
        F.when(
            F.col("cell").isin(probe), -F.col("vec_id") - F.lit(1_000_000)
        ).otherwise(F.col("vec_id")),
    )
    root = _oidx_root(sf_dir, "_rpl")
    write_index(corrupted, root, partition_col="cell", mode="overwrite")
    write_index(
        assigned.where(F.col("cell").isin(probe)), root,
        partition_col="cell", mode="replace",
    )
    return _oidx_search(spark, sf_dir, root, centroids)


def extension_entries8():
    from ..queries.registry import SuiteEntry
    from .oracles import ivf_oracle

    return [
        SuiteEntry(
            "sim_oidx_persist",
            run_oidx_persist,
            ivf_oracle(),
            "ANN search against the MANIFEST-COMMITTED object-store index "
            "(immutable objects, pointer-CAS commit, probe-pruned scan "
            "planned from the manifest); certified equal to the in-plan "
            "IVF search",
        ),
        SuiteEntry(
            "sim_oidx_replace",
            run_oidx_replace,
            ivf_oracle(),
            "dynamic partition overwrite on the object-store index: the "
            "probed cells land corrupted, ONE replace commit swaps those "
            "partitions wholesale; oracle equality proves replacement "
            "(append-shaped bugs would leave junk rows winning top-k)",
        ),
    ]

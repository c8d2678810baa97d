"""Round-7 extension batch: URL/registered-domain exact dedup and
persisted-ANN-index search — the two production shapes the r6 audit still
found missing from the pipeline surface.

Same contract as ``suite.py``..``suite6.py``: every entry pairs a Spark
callable with an independently-written DuckDB oracle recomputing identical
semantics; outputs are scalar-typed (BIGINT/VARCHAR/BOOLEAN/6-dp DOUBLE)
so the driver's value-hash comparison certifies them exactly.

URL dedup (``dedup_url``) is the standard FIRST pass of web-corpus
pipelines (cheaper than any content hash: kill recrawls/mirrors before
MinHash ever runs). The documents testdata carries no URL column, so a
deterministic synthetic URL is derived per document — with the dup
structure real crawls have (same page reached via www./cdn. subdomains,
tracking params, fragments) — and BOTH engines derive it identically; the
OPERATOR under test is the canonicalization + keep-list machinery, which
is real: ``parse_url`` extraction, PSL-style registered-domain reduction,
tracking-param stripping, first-occurrence winner per canonical key.

Persisted ANN index (``sim_ivf_persist``) ties together two already-
certified components: the IVF assignment kernel and the partitioned-sink
machinery. The index (embeddings + cell) is WRITTEN partitioned by cell,
and the search runs against the read-back table — certified byte-equal to
the in-plan IVF search, with the scan provably pruned to the probed cells
(plan-asserted in tests). At 100 TB this is the shape that makes repeated
ANN queries cheap: pay the assignment once at ingest, then every query
reads ~nprobe/n_cells of the data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread

# ---------------------------------------------------------------------------
# URL / registered-domain exact dedup


#: Multi-part public suffixes recognized by the registered-domain rule
#: (PSL-lite: real pipelines ship the full Public Suffix List; the RULE —
#: last three labels under a multi-part suffix, last two otherwise — is
#: identical, and the list is data, not code).
MULTI_PART_SUFFIXES = ("co.uk", "org.uk", "com.au", "co.jp")
#: Tracking-parameter prefixes stripped during canonicalization.
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")
#: Path-key modulus for the synthetic URLs: docs in the same source with
#: equal doc_id % URL_PATH_KEYS share a page (the planted dup structure).
URL_PATH_KEYS = 13


def _url_expr() -> str:
    """Deterministic synthetic URL per document (SQL, valid in BOTH Spark
    and DuckDB): per-source registered domain + multi-part/simple TLD mix,
    rotating www./cdn./bare subdomains, md5 path keyed by
    (source, doc_id % URL_PATH_KEYS), tracking params on even doc_ids and
    a fragment on every fifth — the shapes canonicalization must erase.

    The TLD index hashes the source (``ascii(md5(...)) % 4``) rather than
    parsing digits out of it, so the expression is TOTAL over arbitrary
    source strings — the previous ``CAST(substring(source, 4) AS INT)``
    threw on any source not shaped ``src<int>`` (e.g. the skewed fixture's
    ``hotsrc``) in BOTH engines (advisor round-7, medium)."""
    return f"""
    'https://' ||
    CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END ||
    substring(md5('d:' || source), 1, 8) ||
    CASE ascii(substring(md5('t:' || source), 1, 1)) % 4
        WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
        WHEN 2 THEN '.org' ELSE '.io' END ||
    '/p/' || substring(md5('p:' || source || ':' ||
                           CAST(doc_id % {URL_PATH_KEYS} AS STRING)), 1, 6) ||
    CASE WHEN doc_id % 2 = 0
         THEN '?utm_source=feed&id=' || CAST(doc_id % {URL_PATH_KEYS} AS STRING)
         ELSE '?id=' || CAST(doc_id % {URL_PATH_KEYS} AS STRING) END ||
    CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END
    """


def url_dedup(docs: DataFrame) -> DataFrame:
    """Exact URL dedup: canonicalize each document's URL and keep its
    first occurrence (min doc_id per canonical key).

    Canonicalization (each step is what real crawl dedup does):
    - ``parse_url`` HOST/PATH/QUERY extraction (fragment discarded),
    - registered domain: strip subdomains with the PSL-lite rule (last
      three labels when the host ends in a multi-part suffix, else two) —
      ``www.x.co.uk`` and ``cdn.x.co.uk`` are the same site,
    - drop tracking params (``utm_*``/``fbclid``/``gclid``), sort the
      rest so param order never splits a group,
    - strip the trailing path slash; md5 the canonical string.

    Keep-list shape (100 TB): canonical keys are md5-uniform, so the
    winner pass is ONE map-side-combinable groupBy(min) plus an equi-join
    back — deliberately NOT a window: a viral URL duplicated millions of
    times would funnel its whole group through one window task, while
    partial aggregation reduces it map-side and AQE skew-splits the join.
    """
    d = docs.selectExpr("doc_id", f"({_url_expr()}) AS url")
    host = F.expr("parse_url(url, 'HOST')")
    multi = None
    for s in MULTI_PART_SUFFIXES:
        cond = F.col("_host").endswith("." + s)
        multi = cond if multi is None else (multi | cond)
    labels = F.split(F.col("_host"), r"\.")
    last_n = lambda n: F.concat_ws(  # noqa: E731 - local expression helper
        ".", F.slice(labels, F.greatest(F.size(labels) - (n - 1), F.lit(1)), n)
    )
    canon = d.withColumn("_host", host).select(
        "doc_id",
        "url",
        F.when(multi, last_n(3)).otherwise(last_n(2)).alias("registered_domain"),
        F.regexp_replace(F.expr("parse_url(url, 'PATH')"), "/$", "").alias("_path"),
        F.concat_ws(
            "&",
            F.array_sort(
                F.filter(
                    F.split(F.coalesce(F.expr("parse_url(url, 'QUERY')"), F.lit("")), "&"),
                    lambda x: (x != "") & ~x.startswith("utm_")
                    & ~x.startswith("fbclid") & ~x.startswith("gclid"),
                )
            ),
        ).alias("_params"),
    )
    # persist(): BOTH join legs (winner aggregate + probe) consume this
    # table and their alias-divergent shapes defeat exchange reuse, so
    # without the pin each leg re-ran the whole canonicalization kernel
    # (3×parse_url, regex, param sort, md5 per row — 2 scans in the r11
    # sweep). The pinned rows are the narrow (doc_id, domain, hash)
    # projection, never the raw text (the semdedup lesson, guide §5).
    canon = canon.select(
        "doc_id",
        "registered_domain",
        F.md5(
            F.concat_ws("|", "registered_domain", "_path", "_params")
        ).alias("canon_hash"),
    ).persist()
    winners = canon.groupBy("canon_hash").agg(F.min("doc_id").alias("keep_id"))
    return canon.join(winners, "canon_hash").select(
        "doc_id",
        "registered_domain",
        "canon_hash",
        "keep_id",
        (F.col("doc_id") == F.col("keep_id")).alias("is_kept"),
    )


def run_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): the kernel is a handful of string expressions per row
    # (cheap scan->project->agg; see tables.spread's counter-indication).
    return url_dedup(load_table(spark, sf_dir, "documents"))


def url_dedup_oracle() -> str:
    multi_like = " OR ".join(
        f"host LIKE '%.{s}'" for s in MULTI_PART_SUFFIXES
    )
    return f"""
WITH u AS (
    SELECT doc_id, ({_url_expr()}) AS url FROM documents
),
parts AS (
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_replace(regexp_extract(url, '^https://[^/]+([^?#]*)', 1),
                          '/$', '') AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query
    FROM u
),
canon AS (
    SELECT doc_id,
           CASE WHEN {multi_like}
                THEN array_to_string(str_split(host, '.')[-3:], '.')
                ELSE array_to_string(str_split(host, '.')[-2:], '.')
           END AS registered_domain,
           path,
           array_to_string(
               list_sort(list_filter(str_split(query, '&'),
                   x -> x <> '' AND NOT starts_with(x, 'utm_')
                        AND NOT starts_with(x, 'fbclid')
                        AND NOT starts_with(x, 'gclid'))),
               '&') AS params
    FROM parts
),
hashed AS (
    SELECT doc_id, registered_domain,
           md5(registered_domain || '|' || path || '|' || params) AS canon_hash
    FROM canon
)
SELECT h.doc_id, h.registered_domain, h.canon_hash,
       w.keep_id, h.doc_id = w.keep_id AS is_kept
FROM hashed h
JOIN (SELECT canon_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id
      FROM hashed GROUP BY canon_hash) w USING (canon_hash)
"""


# ---------------------------------------------------------------------------
# Persisted IVF index search


def _scratch_tag(sf_dir: str) -> str:
    """Scratch key for run-time persisted indexes: sf_dir basename PLUS the
    process id, so two concurrent processes on the same scale factor (e.g.
    bench + a correctness rerun) never share an overwrite-vs-read path
    (advisor round-7, low). Within one process the path is stable, so
    repeated runs still exercise mode=overwrite."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{base}_p{os.getpid()}"


def _sql_tag(sf_dir: str) -> str:
    """``_scratch_tag`` made safe for SQL identifiers (table names)."""
    return _scratch_tag(sf_dir).replace(".", "_").replace("-", "_")


#: per-pid scratch dirs this process created; removed at interpreter exit.
_SCRATCH_DIRS: set[str] = set()


def _register_scratch(path: str) -> str:
    """Track a per-pid scratch dir for exit-time removal, and reap scratch
    left by DEAD sibling processes under the same parent (atexit never
    fires on SIGKILL; at --copies 100 one abandoned index is corpus-scale,
    the disk-fill mode the r6 sweep hit with dead shuffle spill)."""
    import atexit
    import re
    import shutil

    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH_DIRS]
        )
    if path not in _SCRATCH_DIRS:
        _SCRATCH_DIRS.add(path)
        parent = os.path.dirname(path)
        if os.path.isdir(parent):
            for entry in os.listdir(parent):
                # Anchored to the trailing tag shapes this module writes
                # ({base}_p<pid>, {base}_p<pid>_app, and their compaction
                # generations ...gen<N>): a first-match search would let
                # an sf_dir basename containing `_p<digits>_` (e.g.
                # corpus_p2_v1) probe the WRONG pid and reap a live
                # sibling's scratch (advisor round-8).
                m = re.search(
                    r"_p(\d+)(?:_app|_cmp)?(?:\.gen\d+(?:\.retired)?)?$", entry
                )
                if not m or int(m.group(1)) == os.getpid():
                    continue
                try:
                    os.kill(int(m.group(1)), 0)  # raises if pid is gone
                except ProcessLookupError:
                    shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
                except PermissionError:
                    pass  # pid alive under another user: leave it
    return path


def _index_scratch(sf_dir: str) -> str:
    return _register_scratch(
        os.path.join(tempfile.gettempdir(), "dfrs_ann_index", _scratch_tag(sf_dir))
    )


def _ivf_codebook(emb: DataFrame) -> list[tuple]:
    """The frozen centroid codebook, by fixed vec_id (trained once at
    snapshot time; in production read back from the index's metadata)."""
    from . import similarity

    rows = (
        emb.where(F.col("vec_id").isin(list(similarity.CENTROID_VEC_IDS)))
        .select("vec_id", "embedding")
        .collect()
    )
    return sorted((r["vec_id"], list(r["embedding"])) for r in rows)


def _ivf_write(df: DataFrame, centroids: list[tuple], path: str, mode: str) -> None:
    """Assign + land under ``partitionBy(cell)``. repartition("cell")
    gives one writer task per touched cell directory (files scale with
    cells, not tasks x cells — the sinks rule); ``mode="append"`` adds at
    most one NEW file per touched cell, existing files byte-untouched."""
    from . import similarity

    (
        similarity.ivf_assign(df, centroids)
        .repartition("cell")
        .write.partitionBy("cell")
        .mode(mode)
        .parquet(path)
    )


def _ivf_search(spark: SparkSession, sf_dir: str, path: str,
                centroids: list[tuple]) -> DataFrame:
    """Answer the query from the read-back index with the scan pruned to
    the ``nprobe`` probed cells (PartitionFilters; plan-asserted)."""
    from . import similarity
    from .shared import _query_vec

    qv = _query_vec(spark, sf_dir)
    probe = similarity.ivf_probe_cells(qv, centroids, nprobe=similarity.N_PROBE)
    index = spark.read.parquet(path).where(F.col("cell").isin(probe))
    out = similarity.with_cosine(index, qv).where(F.col("vec_id") != 0)
    return (
        out.select("vec_id", F.col("cell").cast("int").alias("cell"), "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


def run_ivf_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against a PERSISTED index: assign cells once, write the
    index partitioned by cell (one file per cell — the sinks rule), then
    answer the query from the read-back table with the scan pruned to the
    ``nprobe`` probed cells (PartitionFilters; plan-asserted in
    tests/test_plans.py). Result is identical to the in-plan
    ``sim_ann_ivf`` — index persistence must never change answers — so
    the oracle is the same exhaustive DuckDB recomputation.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    path = _index_scratch(sf_dir)
    # Ingest-time cost, paid once per corpus version.
    _ivf_write(emb, centroids, path, "overwrite")
    return _ivf_search(spark, sf_dir, path, centroids)


def run_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot MAINTENANCE of the persisted IVF index: append an
    ingest batch of embeddings into the cell-partitioned index, then
    answer the query from the updated index — the embeddings-side twin of
    ``dedup_index_append`` (the r7 ``sim_ivf_persist`` wrote once and
    searched once; a production vector store ingests continuously and
    must never rebuild the corpus index per batch).

    The batch is assigned with the FROZEN centroid codebook (trained at
    snapshot time; incremental maintenance must not move cell boundaries,
    or every prior assignment would be invalidated) and written with
    ``mode("append")`` under the same ``partitionBy("cell")`` layout:
    each append adds at most one NEW file per touched cell directory,
    existing files byte-untouched (file-level asserted in
    tests/test_suite7.py), so maintenance costs O(batch) at any corpus
    size. Probe-pruned scans (PartitionFilters on cell) survive the
    append because pruning is directory-level. Correctness bar: the
    search against the appended index must equal ``sim_ivf_persist``'s
    one-shot index over snapshot ∪ batch — so this operator shares its
    exhaustive DuckDB oracle. After K appends, the sinks-rule compaction
    (rewrite each cell's files to one, or at 100 TB rewrite to a new
    location + atomic swap) restores one file per cell.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    path = _register_scratch(_index_scratch(sf_dir) + "_app")
    snapshot = emb.where(F.col("vec_id") % 7 != 3)
    batch = emb.where(F.col("vec_id") % 7 == 3)
    _ivf_write(snapshot, centroids, path, "overwrite")
    _ivf_write(batch, centroids, path, "append")
    return _ivf_search(spark, sf_dir, path, centroids)


# ---------------------------------------------------------------------------
# Persisted LSH dedup index (the documents-side twin of sim_ivf_persist)


def run_dedup_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingest against a PERSISTED corpus LSH index.

    The corpus's (band, bucket, doc_id) rows — the index
    ``incremental_dedup_pairs``' design doc promises should be persisted —
    are written ONCE as a bucketed+sorted table on (band, bucket) via
    ``sources.bucketing.write_bucketed``. The new batch's buckets then
    equi-join against the table: the planner proves the index side
    co-partitioned (its scan carries ``Bucketed: true`` with NO Exchange
    above it — plan-asserted in tests/test_suite7.py), so at 100 TB the
    corpus-scale index is never reshuffled; only the small ingest batch
    moves. Output is certified equal to the in-plan ``dedup_incremental``
    (same oracle): index persistence must never change answers.
    """
    from ..sources.bucketing import write_bucketed
    from . import dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    new = docs.where(F.col("source") == "src0")
    tag = _sql_tag(sf_dir)
    table = f"dfrs_lsh_index_{tag}"
    path = _register_scratch(
        os.path.join(tempfile.gettempdir(), "dfrs_lsh_index", tag)
    )
    write_bucketed(
        dedup.lsh_buckets(corpus).select("band", "bucket", "doc_id"),
        table,
        key=["band", "bucket"],
        n_buckets=32,
        path=path,
    )
    index = spark.table(table)
    return dedup.incremental_dedup_pairs(
        corpus, new, corpus_index=index
    ).orderBy("doc_a", "doc_b")


def run_dedup_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot MAINTENANCE of the persisted LSH index: append an
    ingest batch's buckets to the existing index table, then probe the
    NEXT batch against the updated index — the shape a real pipeline
    runs nightly (the r7 operator wrote once and probed once; a 100 TB
    corpus is never rebuilt per ingest).

    Timeline: snapshot-0 corpus (sources beyond src0/src1) is indexed
    with ``write_bucketed``; batch src1 arrives and its (band, bucket,
    doc_id) rows are APPENDED via ``sources.bucketing.append_bucketed`` —
    n_buckets new files, existing files untouched (append-only is
    file-level asserted in tests/test_suite7.py), so maintenance cost is
    O(batch) regardless of corpus size; batch src0 then probes the
    updated index. Correctness bar: the probe against the appended index
    must equal the probe against a FULL REBUILD over corpus ∪ src1 —
    which is exactly ``dedup_index_persist``'s certified answer, so this
    operator shares its oracle (``incremental_dedup_oracle``). The
    co-partitioning guarantee survives the append (bucketed scan, no
    Exchange above it — same plan assertion); only the within-bucket
    sort becomes per-file, which SMJ recovers with a local Sort. After K
    appends a compaction rewrite (``write_bucketed`` over a self-read —
    the sink_compact rule) restores one file per bucket.
    """
    from ..sources.bucketing import append_bucketed, write_bucketed
    from . import dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    snap0 = docs.where(~F.col("source").isin("src0", "src1"))
    batch1 = docs.where(F.col("source") == "src1")
    new = docs.where(F.col("source") == "src0")
    tag = _sql_tag(sf_dir)
    table = f"dfrs_lsh_index_app_{tag}"
    path = _register_scratch(
        os.path.join(tempfile.gettempdir(), "dfrs_lsh_index_app", tag)
    )
    write_bucketed(
        dedup.lsh_buckets(snap0).select("band", "bucket", "doc_id"),
        table,
        key=["band", "bucket"],
        n_buckets=32,
        path=path,
    )
    append_bucketed(
        dedup.lsh_buckets(batch1).select("band", "bucket", "doc_id"),
        table,
        key=["band", "bucket"],
        n_buckets=32,
    )
    index = spark.table(table)
    corpus = docs.where(F.col("source") != "src0")  # snap0 ∪ batch1
    return dedup.incremental_dedup_pairs(
        corpus, new, corpus_index=index
    ).orderBy("doc_a", "doc_b")


def run_ivf_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION of the appended-to persisted IVF index, searched after
    the swap: the third leg of the index lifecycle (build → append →
    compact) and the designated remedy for append fragmentation. The
    snapshot is written, a batch appended with the frozen codebook
    (fragmenting touched cells to 2 files), then
    ``sources.bucketing.compact_partitioned`` rewrites to ONE file per
    cell via a verified new generation + swap — the old generation stays
    intact until the swap commits (tested at the file level in
    tests/test_suite7.py), so the live index is never at risk.
    Correctness bar: compaction must never change answers — the search
    against the compacted index equals ``sim_ivf_persist``'s one-shot
    build over the same snapshot ∪ batch, so this operator shares its
    exhaustive DuckDB oracle. Directory-level PartitionFilters pruning
    survives because the layout (partitionBy cell) is preserved.
    """
    from ..sources.bucketing import compact_partitioned

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = _ivf_codebook(emb)
    path = _register_scratch(_index_scratch(sf_dir) + "_cmp")
    _ivf_write(emb.where(F.col("vec_id") % 7 != 3), centroids, path,
               "overwrite")
    _ivf_write(emb.where(F.col("vec_id") % 7 == 3), centroids, path,
               "append")
    compact_partitioned(spark, path, "cell")
    return _ivf_search(spark, sf_dir, path, centroids)


def run_dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION of the appended-to persisted LSH index, probed after
    the swap — the documents-side twin of ``sim_ivf_compact``. Snapshot-0
    is bucket-written, batch src1 appended (fragmenting every bucket to
    2+ files), then ``sources.bucketing.compact_bucketed`` restores one
    file per bucket via a verified new generation + a single
    ``ALTER TABLE SET LOCATION`` catalog commit; batch src0 probes the
    compacted index. Correctness bar: equal to the probe against a full
    one-shot rebuild — exactly ``dedup_index_persist``'s certified
    answer, so this operator shares its oracle. The bucketed
    co-partitioning guarantee (index side never reshuffled) is a property
    of the bucket spec, which the swap preserves — plan-asserted across a
    compaction in tests/test_suite7.py.
    """
    from ..sources.bucketing import (
        append_bucketed,
        compact_bucketed,
        table_location,
        write_bucketed,
    )
    from . import dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    snap0 = docs.where(~F.col("source").isin("src0", "src1"))
    batch1 = docs.where(F.col("source") == "src1")
    new = docs.where(F.col("source") == "src0")
    tag = _sql_tag(sf_dir)
    table = f"dfrs_lsh_index_cmp_{tag}"
    path = _register_scratch(
        os.path.join(tempfile.gettempdir(), "dfrs_lsh_index_cmp", tag)
    )
    write_bucketed(
        dedup.lsh_buckets(snap0).select("band", "bucket", "doc_id"),
        table, key=["band", "bucket"], n_buckets=32, path=path,
    )
    append_bucketed(
        dedup.lsh_buckets(batch1).select("band", "bucket", "doc_id"),
        table, key=["band", "bucket"], n_buckets=32,
    )
    compact_bucketed(spark, table, key=["band", "bucket"], n_buckets=32)
    # the live generation moved to a .genN sibling; track it for exit GC
    _register_scratch(table_location(spark, table))
    corpus = docs.where(F.col("source") != "src0")  # snap0 ∪ batch1
    return dedup.incremental_dedup_pairs(
        corpus, new, corpus_index=spark.table(table)
    ).orderBy("doc_a", "doc_b")


def extension_entries7():
    from ..queries.registry import SuiteEntry
    from .oracles import incremental_dedup_oracle, ivf_oracle

    return [
        SuiteEntry(
            "dedup_index_persist",
            run_dedup_index_persist,
            incremental_dedup_oracle(),
            "incremental near-dup ingest against a PERSISTED bucketed LSH "
            "index table (corpus side never reshuffled; plan-asserted); "
            "certified equal to the in-plan dedup_incremental",
        ),
        SuiteEntry(
            "dedup_url",
            run_url_dedup,
            url_dedup_oracle(),
            "URL/registered-domain exact dedup: parse_url + PSL-lite "
            "domain reduction + tracking-param strip + first-occurrence "
            "keep list (the standard pre-MinHash pass for web corpora)",
        ),
        SuiteEntry(
            "dedup_index_append",
            run_dedup_index_append,
            incremental_dedup_oracle(),
            "cross-snapshot maintenance of the persisted LSH index: "
            "append an ingest batch's buckets (O(batch) new files, "
            "existing files untouched), probe the next batch against the "
            "updated index; certified equal to a full index rebuild",
        ),
        SuiteEntry(
            "sim_ivf_persist",
            run_ivf_persist,
            ivf_oracle(),
            "ANN search against a PERSISTED cell-partitioned IVF index "
            "(write once, probe-pruned scans thereafter); certified equal "
            "to the in-plan IVF search",
        ),
        SuiteEntry(
            "sim_ivf_append",
            run_ivf_append,
            ivf_oracle(),
            "cross-snapshot maintenance of the persisted IVF index: "
            "append an embedding batch assigned with the frozen codebook "
            "(new files only, existing cells untouched), search the "
            "updated index; certified equal to a one-shot index build",
        ),
        SuiteEntry(
            "dedup_index_compact",
            run_dedup_index_compact,
            incremental_dedup_oracle(),
            "generation-then-swap compaction of the appended-to persisted "
            "LSH index (one file per bucket restored; old generation "
            "intact until the catalog swap commits), probed after the "
            "swap; certified equal to a full index rebuild",
        ),
        SuiteEntry(
            "sim_ivf_compact",
            run_ivf_compact,
            ivf_oracle(),
            "generation-then-swap compaction of the appended-to persisted "
            "IVF index (one file per cell restored; verified new "
            "generation, rename swap), searched after the swap; certified "
            "equal to a one-shot index build",
        ),
    ]

"""Round-7 extension batch (operators/suite7.py): URL dedup semantics and
the persisted-IVF-index scale properties.

Value correctness for both registry entries is covered by the oracle gate
(test_suite_oracle.py); these tests pin the SEMANTIC edges of URL
canonicalization (the things a wrong regex would silently break) and the
plan/layout properties that make the persisted index right at 100 TB.
"""

from __future__ import annotations

import glob
import os
import re

from datafusion_ray_spark.operators import suite7


def test_url_dedup_collapses_subdomain_and_tracking(spark):
    """Docs 0 and 4 in source 'src0': same path key (0%13 == 4%13? no) —
    craft ids whose path keys collide: 0 and 13 share doc_id%13 == 0, and
    differ in subdomain (0%3=0 -> www., 13%3=1 -> cdn.), tracking params
    (0 even -> utm_source, 13 odd -> none) and fragment (0%5=0 -> #top).
    Canonicalization must land both on ONE key with keeper 0."""
    docs = spark.createDataFrame(
        [(0, "t", "en", "src0", 1), (13, "t", "en", "src0", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r["doc_id"]: r for r in suite7.url_dedup(docs).collect()}
    assert out[0]["canon_hash"] == out[13]["canon_hash"]
    assert out[0]["is_kept"] and not out[13]["is_kept"]
    assert out[13]["keep_id"] == 0


def test_url_dedup_distinct_paths_stay_distinct(spark):
    docs = spark.createDataFrame(
        [(1, "t", "en", "src1", 1), (2, "t", "en", "src1", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r["doc_id"]: r for r in suite7.url_dedup(docs).collect()}
    assert out[1]["canon_hash"] != out[2]["canon_hash"]
    assert out[1]["is_kept"] and out[2]["is_kept"]


def test_url_registered_domain_psl_rule(spark):
    """The TLD index is ascii(md5('t:'||source)[0]) % 4 (total over any
    source string — advisor r7): 'src4' hashes to 0 -> .co.uk (multi-part
    suffix: last THREE labels); 'src3' hashes to 1 -> .com (last two).
    Subdomains never survive."""
    docs = spark.createDataFrame(
        [(3, "t", "en", "src4", 1), (4, "t", "en", "src3", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    doms = {r["doc_id"]: r["registered_domain"]
            for r in suite7.url_dedup(docs).collect()}
    assert doms[3].endswith(".co.uk") and doms[3].count(".") == 2
    assert doms[4].endswith(".com") and doms[4].count(".") == 1
    assert not doms[3].startswith(("www.", "cdn."))
    assert not doms[4].startswith(("www.", "cdn."))


def test_ivf_persist_layout_and_prune(spark, sf_dir):
    """The persisted index must be one file per cell directory, and the
    search scan must carry cell PartitionFilters (directory pruning) —
    the property that makes repeated ANN queries ~nprobe/n_cells cost."""
    df = suite7.run_ivf_persist(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cell" in m.group(0), (
        f"index scan must prune on cell; got {m.group(0) if m else plan[:400]}"
    )
    path = suite7._index_scratch(sf_dir)
    cell_dirs = glob.glob(os.path.join(path, "cell=*"))
    assert cell_dirs, "index write must produce cell=... directories"
    for d in cell_dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, (
            f"{d}: {len(files)} files — repartition-before-partitionBy "
            "must yield one file per cell"
        )


def test_dedup_index_persist_bucketed_scan_no_exchange(spark, sf_dir):
    """The persisted LSH index must join WITHOUT reshuffling: its scan is
    bucket-aware (Bucketed: true) and no Exchange sits between that scan
    and the probe join — the property that makes ingest cost independent
    of corpus size at 100 TB."""
    df = suite7.run_dedup_index_persist(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, "index scan must be bucket-aware"
    # the index-side scan subtree must not be fed through an Exchange:
    # every Exchange in the plan must be above the PROBE side (whose scan
    # is the parquet documents read), never above the bucketed table scan.
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(band", plan):
        ctx = plan[m.start():m.start() + 2000]
        assert "Bucketed: true" not in ctx.split("Exchange", 2)[1], (
            "found an Exchange re-shuffling the bucketed index side"
        )


def test_dedup_index_persist_equals_inplan(spark, sf_dir):
    from datafusion_ray_spark.operators.suite import run_incremental_dedup

    a = [tuple(r) for r in
         suite7.run_dedup_index_persist(spark, sf_dir).collect()]
    b = [tuple(r) for r in run_incremental_dedup(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_ivf_persist_equals_inplan_ivf(spark, sf_dir):
    """Index persistence must never change answers: byte-equal to the
    in-plan IVF search on the same parameters."""
    from datafusion_ray_spark.operators.suite import run_ann_ivf

    a = [tuple(r) for r in suite7.run_ivf_persist(spark, sf_dir).collect()]
    b = [tuple(r) for r in run_ann_ivf(spark, sf_dir).collect()]
    assert a == b


def test_dedup_index_append_only_and_equal_to_rebuild(spark, sf_dir):
    """The r8 maintenance operator, all three contract points:
    1. APPEND-ONLY — the snapshot-0 index files are untouched by the
       append (same names, same sizes); the append adds files instead of
       rewriting, so maintenance is O(batch) at any corpus size.
    2. Bucketed co-partitioning survives the append — the probe plan
       scans the index with Bucketed: true and no Exchange re-shuffles it.
    3. EQUAL TO FULL REBUILD — probing the appended index returns exactly
       dedup_index_persist's certified answer (whose index is built in
       one shot over the same corpus)."""
    import glob as _glob
    import os as _os

    from datafusion_ray_spark.operators import suite7 as s7

    # Run once to create+append; capture the file inventory between the
    # two writes by re-deriving the path the operator uses.
    tag = s7._sql_tag(sf_dir)
    path = _os.path.join(
        __import__("tempfile").gettempdir(), "dfrs_lsh_index_app", tag
    )
    df = s7.run_dedup_index_append(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]

    files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
    assert len(files) > 32, (
        "append must ADD files beyond the snapshot-0 bucket files"
    )
    # determinism: a full rerun (overwrite + append) returns identical rows
    df2 = s7.run_dedup_index_append(spark, sf_dir)
    rows2 = [tuple(r) for r in df2.collect()]
    assert rows == rows2
    # append-only, asserted directly: snapshot the file inventory, append
    # one more batch, and require every prior file to survive unmodified
    # (same name, same size) with new files added.
    from datafusion_ray_spark.operators import dedup
    from datafusion_ray_spark.sources.bucketing import append_bucketed
    from datafusion_ray_spark.sources.tables import load_table, spread
    from pyspark.sql import functions as F

    files_before = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    docs = spread(load_table(spark, sf_dir, "documents"))
    batch = docs.where(F.col("source") == "src2")
    append_bucketed(
        dedup.lsh_buckets(batch).select("band", "bucket", "doc_id"),
        f"dfrs_lsh_index_app_{tag}",
        key=["band", "bucket"],
        n_buckets=32,
    )
    files_after = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    assert set(files_before) <= set(files_after), "append deleted files"
    for f, size in files_before.items():
        assert files_after[f] == size, f"append rewrote {f}"
    assert len(files_after) > len(files_before), "append added no files"

    # plan: bucketed scan, no Exchange above the index side
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(band", plan):
        assert "Bucketed: true" not in plan[m.start():m.start() + 2000].split(
            "Exchange", 2
        )[1]

    # equal to the one-shot rebuild (dedup_index_persist, same corpus/new)
    want = [
        tuple(r)
        for r in suite7.run_dedup_index_persist(spark, sf_dir).collect()
    ]
    assert rows == want and len(rows) > 0


def test_compact_bucketed_restores_one_file_per_bucket(spark, sf_dir):
    """After appends fragment the index, one compaction restores the
    one-file-per-bucket invariant, preserves every row, and the probe
    join still plans Exchange-free over the compacted table.

    Compaction is generation-then-swap (round-9): the new generation is
    written to a versioned sibling location while EVERY old file survives
    byte-identical until the catalog swap commits (asserted inside the
    pre-swap seam); after the swap the old generation survives a grace
    window (deferred GC — a reader mid-scan on the old listing finishes
    undisturbed) until gc_generations sweeps it."""
    import glob as _glob
    import os as _os
    import tempfile as _tf

    from datafusion_ray_spark.operators import dedup, suite7 as s7
    from datafusion_ray_spark.sources.bucketing import (
        compact_bucketed,
        table_location,
    )
    from datafusion_ray_spark.sources.tables import load_table, spread
    from pyspark.sql import functions as F

    # build + append (reuses the operator's own table for this sf/pid)
    s7.run_dedup_index_append(spark, sf_dir).collect()
    tag = s7._sql_tag(sf_dir)
    table = f"dfrs_lsh_index_app_{tag}"
    path = _os.path.join(_tf.gettempdir(), "dfrs_lsh_index_app", tag)
    rows_before = spark.table(table).count()
    old_files = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    files_before = len(old_files)
    assert files_before > 32  # fragmented by the append

    seen = {}

    def check_pre_swap(old_loc, new_loc):
        # both generations coexist; the old one is byte-untouched
        assert _os.path.normpath(old_loc) == _os.path.normpath(path)
        now = {
            f: _os.path.getsize(f)
            for f in _glob.glob(_os.path.join(old_loc, "*.parquet"))
        }
        assert now == old_files, "old generation modified before the swap"
        assert len(_glob.glob(_os.path.join(new_loc, "*.parquet"))) == 32
        seen["new_loc"] = new_loc

    n = compact_bucketed(
        spark, table, key=["band", "bucket"], n_buckets=32,
        pre_swap_hook=check_pre_swap,
    )
    assert n == files_before
    # the table now serves the new generation; the old one is RETIRED but
    # still on disk byte-identical (deferred GC: concurrent readers on
    # the old file listing finish undisturbed)
    new_loc = table_location(spark, table)
    assert _os.path.normpath(new_loc) == _os.path.normpath(seen["new_loc"])
    files_after = len(_glob.glob(_os.path.join(new_loc, "*.parquet")))
    assert files_after == 32, f"{files_after} files after compaction"
    still = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    assert still == old_files, "grace window violated: old gen touched"
    assert spark.table(table).count() == rows_before
    # an explicit GC pass (what the NEXT compaction runs first) sweeps it
    from datafusion_ray_spark.sources.bucketing import gc_generations

    assert path in {_os.path.normpath(p) for p in gc_generations(new_loc)}
    assert not _os.path.exists(path), "old generation survived GC"

    # the operator's real probe against the COMPACTED index returns the
    # same certified answer, and nothing reshuffles the index side (the
    # plan either keeps the bucket-aware scan or broadcasts the small
    # probe — both Exchange-free over the index).
    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.where(F.col("source") != "src0")
    new = docs.where(F.col("source") == "src0")
    probe = dedup.incremental_dedup_pairs(
        corpus, new, corpus_index=spark.table(table)
    ).orderBy("doc_a", "doc_b")
    want = [
        tuple(r)
        for r in suite7.run_dedup_index_persist(spark, sf_dir).collect()
    ]
    assert [tuple(r) for r in probe.collect()] == want
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(band", plan):
        assert "Bucketed: true" not in plan[m.start():m.start() + 2000].split(
            "Exchange", 2
        )[1], "compacted index side was reshuffled"


def test_compact_partitioned_ivf_generation_swap(spark, sf_dir):
    """The cell-partitioned IVF compactor, same safety contract as the
    bucketed one: new generation written+verified at a versioned sibling
    while every old file survives byte-identical until the swap; after
    the swap one file per cell directory, identical probe answers, and
    the search plan still prunes on cell PartitionFilters."""
    import glob as _glob
    import os as _os

    from datafusion_ray_spark.operators import suite7 as s7
    from datafusion_ray_spark.sources.bucketing import compact_partitioned
    from datafusion_ray_spark.sources.tables import load_table, spread
    from pyspark.sql import functions as F

    path = s7._index_scratch(sf_dir) + "_app"
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = s7._ivf_codebook(emb)
    s7._ivf_write(emb.where(F.col("vec_id") % 7 != 3), centroids, path,
                  "overwrite")
    s7._ivf_write(emb.where(F.col("vec_id") % 7 == 3), centroids, path,
                  "append")
    old_files = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "cell=*", "*.parquet"))
    }
    fragmented = any(
        len(_glob.glob(_os.path.join(d, "*.parquet"))) > 1
        for d in _glob.glob(_os.path.join(path, "cell=*"))
    )
    assert fragmented, "fixture must fragment at least one cell"
    want = [tuple(r) for r in
            s7._ivf_search(spark, sf_dir, path, centroids).collect()]

    def check_pre_swap(old_loc, new_loc):
        now = {
            f: _os.path.getsize(f)
            for f in _glob.glob(_os.path.join(old_loc, "cell=*", "*.parquet"))
        }
        assert now == old_files, "old generation modified before the swap"
        for d in _glob.glob(_os.path.join(new_loc, "cell=*")):
            assert len(_glob.glob(_os.path.join(d, "*.parquet"))) == 1

    n = compact_partitioned(spark, path, "cell", pre_swap_hook=check_pre_swap)
    assert n == len(old_files)
    for d in _glob.glob(_os.path.join(path, "cell=*")):
        assert len(_glob.glob(_os.path.join(d, "*.parquet"))) == 1
    # deferred GC: the old generation is retired aside, files intact
    retired = _glob.glob(path + ".gen*.retired")
    assert len(retired) == 1, "retired old generation missing"
    assert {
        _os.path.relpath(f, retired[0]): _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(retired[0], "cell=*", "*.parquet"))
    } == {_os.path.relpath(f, path): size for f, size in old_files.items()}
    from datafusion_ray_spark.sources.bucketing import gc_generations

    gc_generations(path)
    assert not _glob.glob(path + ".gen*"), "generation dirs survived GC"
    out = s7._ivf_search(spark, sf_dir, path, centroids)
    got = [tuple(r) for r in out.collect()]
    assert got == want and len(got) == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cell" in m.group(0), "pruning lost across compaction"


def test_ivf_append_only_prune_and_equal_to_rebuild(spark, sf_dir):
    """The embeddings-side maintenance operator, same three contract
    points as the LSH twin:
    1. APPEND-ONLY — snapshot cell files survive the append with the same
       name and size; the batch lands as NEW files in touched cell dirs.
    2. Directory pruning survives the append — the search scan still
       carries cell PartitionFilters.
    3. EQUAL TO ONE-SHOT BUILD — byte-equal to sim_ivf_persist (whose
       index covers the same snapshot ∪ batch in one write)."""
    import glob as _glob
    import os as _os

    from datafusion_ray_spark.operators import suite7 as s7
    from datafusion_ray_spark.sources.tables import load_table, spread
    from pyspark.sql import functions as F

    path = s7._index_scratch(sf_dir) + "_app"

    # Reproduce the operator's snapshot write to capture the between-write
    # inventory, then run the full operator (which overwrites + appends).
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    centroids = s7._ivf_codebook(emb)
    snapshot = emb.where(F.col("vec_id") % 7 != 3)
    s7._ivf_write(snapshot, centroids, path, "overwrite")
    files_before = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "cell=*", "*.parquet"))
    }
    batch = emb.where(F.col("vec_id") % 7 == 3)
    s7._ivf_write(batch, centroids, path, "append")
    files_after = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "cell=*", "*.parquet"))
    }
    assert set(files_before) <= set(files_after), "append deleted files"
    for f, size in files_before.items():
        assert files_after[f] == size, f"append rewrote {f}"
    assert len(files_after) > len(files_before), "append added no files"
    # at most one NEW file lands per touched cell directory
    for d in _glob.glob(_os.path.join(path, "cell=*")):
        new = [
            f
            for f in _glob.glob(_os.path.join(d, "*.parquet"))
            if f not in files_before
        ]
        assert len(new) <= 1, f"{d}: {len(new)} new files from one append"

    # The operator end-to-end: pruned scan + equality to one-shot build.
    df = s7.run_ivf_append(spark, sf_dir)
    got = [tuple(r) for r in df.collect()]
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cell" in m.group(0), (
        f"appended-index scan must still prune on cell; "
        f"got {m.group(0) if m else plan[:400]}"
    )
    want = [tuple(r) for r in suite7.run_ivf_persist(spark, sf_dir).collect()]
    assert got == want and len(got) == 10


def test_gc_generations_refuses_crash_state(tmp_path):
    """Round-10 review fix: a rerun after a crash BETWEEN the two swap
    renames (live path missing; old gen at .genN.retired, new at .genN)
    must not GC anything — deleting the siblings would destroy every
    copy of the index. gc_generations no-ops when nothing is live."""
    import os as _os

    from datafusion_ray_spark.sources.bucketing import gc_generations

    base = str(tmp_path / "ivf_index")
    _os.makedirs(base + ".gen1.retired")  # old generation, aside
    _os.makedirs(base + ".gen2")          # new generation, not yet live
    open(base + ".gen1.retired/part-0.parquet", "wb").write(b"old")
    open(base + ".gen2/part-0.parquet", "wb").write(b"new")

    assert gc_generations(base) == []  # live path absent -> refuse
    assert _os.path.exists(base + ".gen1.retired/part-0.parquet")
    assert _os.path.exists(base + ".gen2/part-0.parquet")

    # once a live generation exists again, GC sweeps the siblings
    _os.makedirs(base)
    deleted = gc_generations(base)
    assert len(deleted) == 2 and not _os.path.exists(base + ".gen2")

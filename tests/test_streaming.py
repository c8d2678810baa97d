"""Structured Streaming twin of the batch window operators: same results,
streaming execution (availableNow drain into a memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ray_spark.sources.tables import load_table
from datafusion_ray_spark.streaming import structured, windows


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = structured.stream_events(spark, events_dir)
    assert stream.isStreaming
    structured.run_to_memory(
        structured.tumbling_counts_stream(stream), "stream_tumbling"
    )
    streamed = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windows.tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch


def test_streaming_session_windows_subset_of_batch(spark, sf_dir, events_dir):
    """Append-mode sessions that closed before the final watermark must
    exactly match the batch session operator for those windows."""
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.session_counts_stream(stream), "stream_sessions",
        output_mode="append",
    )
    streamed = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    batch = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in windows.session_agg(load_table(spark, sf_dir, "events")).collect()
    }
    assert len(streamed) > 0
    for key, n in streamed.items():
        assert batch[key] == n


def test_streaming_sliding_matches_batch(spark, sf_dir, events_dir):
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.sliding_counts_stream(stream), "stream_sliding"
    )
    streamed = {
        (r["bucket_start"]): r["n"]
        for r in spark.sql("SELECT * FROM stream_sliding").collect()
    }
    batch = {
        r["bucket_start"]: r["n"]
        for r in windows.sliding_agg(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.click_view_join_stream(stream), "stream_cv_join",
        output_mode="append",
    )
    n_streamed = spark.sql("SELECT COUNT(*) AS c FROM stream_cv_join").first()["c"]
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    n_batch = clicks.join(
        views,
        F.expr("user_id = v_user AND v_ts >= ts - INTERVAL 10 MINUTES AND v_ts < ts"),
    ).count()
    assert n_streamed == n_batch > 0


def test_streaming_dedup_matches_batch(spark, sf_dir, events_dir):
    """Streaming exact dedup keeps exactly one event per distinct content
    digest (append mode; all events fall inside the watermark horizon)."""
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.dedup_stream(stream), "stream_dedup", output_mode="append"
    )
    streamed = spark.sql("SELECT digest FROM stream_dedup").collect()
    digests = [r["digest"] for r in streamed]
    assert len(digests) == len(set(digests))
    from pyspark.sql import functions as F
    n_distinct = (
        load_table(spark, sf_dir, "events")
        .select(F.md5(F.concat_ws("\x1f", "event_type", "props")).alias("d"))
        .distinct()
        .count()
    )
    assert len(digests) == n_distinct > 0


def test_streaming_cms_matches_batch(spark, sf_dir, events_dir):
    """The streaming count-min sketch (native update-mode agg, D*W bounded
    state) equals the batch sketch bit-for-bit over the same data."""
    from datafusion_ray_spark.operators.sketch import count_min_build

    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(structured.cms_stream(stream), "stream_cms")
    streamed = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM stream_cms").collect()
    }
    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in count_min_build(
            load_table(spark, sf_dir, "events"), "user_id"
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_lsh_candidates_match_batch(spark, sf_dir, docs_dir):
    """Ingest-time LSH candidate pairs (stateful banded buckets) equal the
    batch candidate set over the same corpus."""
    from datafusion_ray_spark.operators.dedup import minhash_candidates

    stream = structured.stream_documents(spark, docs_dir)
    structured.run_to_memory(
        structured.lsh_candidate_pairs_stream(stream), "stream_lsh",
        output_mode="append",
    )
    streamed = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT DISTINCT doc_a, doc_b FROM stream_lsh").collect()
    }
    batch = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_heavy_hitters_misra_gries_bounds(spark, sf_dir, events_dir):
    """Sharded MG summaries: every true heavy hitter survives, and every
    stored count is an underestimate by at most n_group/k."""
    from datafusion_ray_spark.sources.tables import load_table
    from datafusion_ray_spark.streaming import structured

    K = 8
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.heavy_hitters_stream(stream, k=K),
        "mg_hh",
        output_mode="append",
    )
    got = {
        r["key"]: (r["grp"], r["cnt"], r["n_processed"])
        for r in spark.table("mg_hh").collect()
    }
    assert got, "summary is empty"

    events = load_table(spark, sf_dir, "events")
    true = {
        str(r["user_id"]): r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    group_n = {}
    for _, (g, _, n) in got.items():
        group_n[g] = n
    # underestimate bound, per key present
    for kv, (g, cnt, n) in got.items():
        assert cnt <= true[kv]
        assert cnt >= true[kv] - n / K
    # completeness: any key with true freq > n_g/k for its group is present
    import hashlib

    for kv, c in true.items():
        g = int(hashlib.md5(kv.encode()).hexdigest()[:4], 16) % 8
        if g in group_n and c > group_n[g] / K:
            assert kv in got, f"missing heavy hitter {kv}"


def test_streaming_bloom_dedup_no_false_negatives(spark, sf_dir, docs_dir):
    """Bounded-state streaming dedup: every exact duplicate beyond the
    first occurrence is flagged (Bloom has no false negatives), and the
    false-positive drops on novel texts stay under 2%."""
    from datafusion_ray_spark.sources.tables import load_table
    from datafusion_ray_spark.streaming import structured

    stream = structured.stream_documents(spark, docs_dir)
    structured.run_to_memory(
        structured.bloom_dedup_stream(stream), "bloom_dedup", output_mode="append"
    )
    got = {r["doc_id"]: r["is_new"] for r in spark.table("bloom_dedup").collect()}

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert len(got) == n
    # ground truth: first doc_id per exact text is "new"
    firsts = {
        r["keep"]
        for r in docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    }
    # no false negatives: anything NOT flagged new must be a true non-first
    # ... but shard-parallel processing order is by doc_id within a shard,
    # so a doc flagged dup must have a same-text twin somewhere.
    multi = {
        r["doc_id"]
        for r in docs.join(
            docs.groupBy("text").agg(F.count("*").alias("c")).where("c > 1"),
            "text",
        ).collect()
    }
    false_pos = 0
    for doc_id, is_new in got.items():
        if not is_new and doc_id not in multi:
            false_pos += 1
    assert false_pos / n < 0.02
    # every duplicate-text group loses at least its later members OR the
    # bitmap flagged them: any non-first member of a dup group must not be new
    for doc_id in multi - firsts:
        assert not got[doc_id] or doc_id in firsts


def test_transform_with_state_matches_legacy_api(spark, sf_dir, events_dir):
    """The Spark-4 transformWithStateInPandas op equals the legacy
    applyInPandasWithState twin AND the batch aggregate, row for row.

    The new state API's driver worker needs google.protobuf
    (StateMessage_pb2); like the Avro jar, it is absent in this sandbox,
    so the operator is capability-gated and this test skips without it.
    """
    pytest.importorskip("google.protobuf")
    from datafusion_ray_spark.sources.tables import load_table
    from datafusion_ray_spark.streaming import structured

    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.stateful_user_counts_tws(stream), "tws_counts",
        output_mode="update",
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("tws_counts").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tv"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
        )
        .collect()
    }
    assert got == batch
    assert len(got) > 0


def test_streaming_dsir_scores_match_batch(spark, sf_dir, docs_dir):
    """Streaming DSIR scoring against a frozen batch-fit ratio table is
    bit-identical to the batch scorer — and stateless (append mode, no
    state store)."""
    from pyspark.sql import functions as F

    from datafusion_ray_spark.operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    ratio = dsir.frozen_ratio(docs, docs.where(F.col("lang") == "en"))
    stream = structured.stream_documents(spark, docs_dir)
    structured.run_to_memory(
        structured.dsir_score_stream(stream, ratio), "stream_dsir",
        output_mode="append",
    )
    streamed = {
        r["doc_id"]: (r["n_feats"], r["logw_nats"])
        for r in spark.sql("SELECT * FROM stream_dsir").collect()
    }
    batch = {
        r["doc_id"]: (r["n_feats"], r["logw_nats"])
        for r in dsir.dsir_logweights(
            docs, docs.where(F.col("lang") == "en")
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_lm_scores_match_batch(spark, sf_dir, docs_dir):
    """Streaming perplexity scoring against a frozen batch-fit unigram LM
    is bit-identical to the batch scorer — stateless, like the DSIR twin."""
    from datafusion_ray_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    probs, llr_oov = text.frozen_lm(docs)
    stream = structured.stream_documents(spark, docs_dir)
    structured.run_to_memory(
        structured.lm_score_stream(stream, probs, llr_oov), "stream_lm",
        output_mode="append",
    )
    streamed = {
        r["doc_id"]: (r["n_tokens"], r["xent_bits"])
        for r in spark.sql("SELECT * FROM stream_lm").collect()
    }
    batch = {
        r["doc_id"]: (r["n_tokens"], r["xent_bits"])
        for r in text.lm_score(docs).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_dedup_state_survives_restart(spark, sf_dir, tmp_path):
    """Exactly-once dedup across a QUERY RESTART: the digest state written
    to the checkpoint by run 1 must suppress duplicates arriving in run 2 —
    the recovery guarantee that makes at-ingest dedup trustworthy in
    production (a re-deployed job must not re-admit old content)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    half = tbl.num_rows // 2
    # duplicates exist across the boundary: rows are not sorted by content
    pq.write_table(tbl.slice(0, half), src / "part-0.parquet")

    def run_once():
        stream = structured.stream_events(spark, str(src))
        q = (
            structured.dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    pq.write_table(tbl.slice(half), src / "part-1.parquet")
    run_once()  # NEW query instance, same checkpoint -> state recovered

    result = spark.read.parquet(out)
    n_total = result.count()
    assert n_total > n_first, "second run emitted nothing"
    # Recovery invariant: with NO state recovery the restarted query would
    # emit one row per distinct digest of the second half (in-batch dedup
    # only). Emitting FEWER proves run-1 digests crossed the restart via
    # the checkpoint. (Exact global-distinct equality is deliberately NOT
    # asserted: dropDuplicatesWithinWatermark evicts state older than the
    # watermark horizon by design, so far-apart duplicates re-admit.)
    digest = F.md5(F.concat_ws("\x1f", "event_type", "props"))
    n_half2_distinct = (
        spark.read.parquet(str(src / "part-1.parquet"))
        .select(digest.alias("d")).distinct().count()
    )
    assert n_total < n_first + n_half2_distinct, (
        "restart re-admitted every cross-run duplicate: checkpoint state "
        "was not recovered"
    )
    # and recovery never duplicates within the output horizon of one run
    assert n_total <= n_first + n_half2_distinct
    assert result.where(F.col("digest").isNull()).count() == 0


def test_streaming_semdedup_matches_batch(spark, sf_dir, emb_dir):
    """At-ingest SemDeDup equals the batch operator when vectors arrive in
    id order: same cells, same kept/pruned verdicts, vector for vector."""
    from pyspark.sql import functions as F

    from datafusion_ray_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.where(F.col("vec_id").isin(list(similarity.CENTROID_VEC_IDS)))
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = sorted((r["vec_id"], list(r["embedding"])) for r in rows)
    stream = structured.stream_embeddings(spark, emb_dir)
    structured.run_to_memory(
        structured.semdedup_stream(stream, centroids, threshold=0.4),
        "stream_semdedup", output_mode="append",
    )
    streamed = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in spark.sql("SELECT * FROM stream_semdedup").collect()
    }
    batch = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in similarity.semdedup(emb, centroids, threshold=0.4).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0 and not all(k for _, k in streamed.values())


def test_streaming_heavy_hitters_state_survives_restart(spark, sf_dir, tmp_path):
    """Custom applyInPandasWithState state (Misra-Gries counters +
    n_processed) must recover from the checkpoint on restart: after a
    two-run ingest, each shard's final n_processed counts BOTH halves —
    a stateless restart would count only the second."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), src / "part-0.parquet")

    def run_once():
        stream = structured.stream_events(spark, str(src))
        q = (
            structured.heavy_hitters_stream(stream, k=8)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    pq.write_table(tbl.slice(half), src / "part-1.parquet")
    run_once()

    result = spark.read.parquet(out)
    # final summary = the last emission per shard; n_processed there must
    # account for every event routed to that shard across BOTH runs
    final_n = {
        r["grp"]: r["mx"]
        for r in result.groupBy("grp").agg(F.max("n_processed").alias("mx")).collect()
    }
    assert sum(final_n.values()) == tbl.num_rows, (
        f"recovered state counted {sum(final_n.values())} of {tbl.num_rows} "
        "events: Misra-Gries state did not survive the restart"
    )


def test_streaming_markov_pairs_match_batch(spark, sf_dir, events_dir):
    """Aggregated streamed transition pairs == the batch Markov matrix."""
    from datafusion_ray_spark.operators.suite4 import run_markov_transitions

    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.markov_pairs_stream(stream), "stream_markov",
        output_mode="append",
    )
    streamed = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.sql(
            "SELECT from_type, to_type, COUNT(*) AS n FROM stream_markov "
            "GROUP BY from_type, to_type"
        ).collect()
    }
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in run_markov_transitions(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_sessionize_matches_batch(spark, sf_dir, events_dir):
    """Per-event streamed session labels == the batch sessionize labels."""
    from datafusion_ray_spark.operators.suite4 import run_sessionize

    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.sessionize_stream(stream), "stream_sessionize",
        output_mode="append",
    )
    streamed = {
        r["event_id"]: (r["user_id"], r["eus"], r["session_idx"])
        for r in spark.sql("SELECT * FROM stream_sessionize").collect()
    }
    batch = {
        r["event_id"]: (r["user_id"], r["eus"], r["session_idx"])
        for r in run_sessionize(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_sessionize_bit_equal_across_arrow_chunks(
    spark, sf_dir, events_dir
):
    """Force tiny Arrow batches (maxRecordsPerBatch=7) so every key's
    micro-batch spans MANY chunks: the stateful twins must concatenate the
    chunk iterator before sorting (structured._ordered_batch) or events
    fold out of (ts, event_id) order and session indices diverge — the
    round-3 advisor's latent-ordering finding, pinned here."""
    from datafusion_ray_spark.operators.suite4 import run_sessionize

    # The driver testdata is already (ts, event_id)-ordered in file order,
    # under which even buggy per-chunk sorting is accidentally correct —
    # scramble the row order so cross-chunk ordering actually matters.
    import pathlib

    import numpy as np
    import pyarrow.parquet as papq

    tbl = papq.read_table(f"{sf_dir}/events.parquet")
    perm = np.random.default_rng(13).permutation(tbl.num_rows)
    scrambled = pathlib.Path(events_dir).parent / "events_scrambled"
    scrambled.mkdir(exist_ok=True)
    papq.write_table(tbl.take(perm), scrambled / "part-0.parquet")

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        stream = structured.stream_events(spark, str(scrambled))
        structured.run_to_memory(
            structured.sessionize_stream(stream), "stream_sess_chunked",
            output_mode="append",
        )
        streamed = {
            r["event_id"]: (r["user_id"], r["eus"], r["session_idx"])
            for r in spark.sql("SELECT * FROM stream_sess_chunked").collect()
        }
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    batch = {
        r["event_id"]: (r["user_id"], r["eus"], r["session_idx"])
        for r in run_sessionize(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_attribution_matches_batch(spark, sf_dir, events_dir):
    """Aggregated streamed last-touch credits == the batch attribution."""
    from datafusion_ray_spark.operators.suite4 import run_attribution

    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.attribution_stream(stream), "stream_attr",
        output_mode="append",
    )
    streamed = {
        r["touch_type"]: (r["n"], r["v"])
        for r in spark.sql(
            "SELECT touch_type, COUNT(*) AS n, SUM(vus) AS v "
            "FROM stream_attr GROUP BY touch_type"
        ).collect()
    }
    batch = {
        r["touch_type"]: (r["n_conversions"], r["value_us"])
        for r in run_attribution(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_anomaly_scores_match_batch(spark, sf_dir, events_dir):
    """Streaming seasonal-anomaly scoring against a frozen batch-fit
    hour-of-day baseline is bit-identical to the batch scorer on every
    cell the stream can see (a stream emits no window for a silent hour,
    so zero-count cells are batch-only by construction)."""
    from datafusion_ray_spark.operators import suite6

    ev = load_table(spark, sf_dir, "events")
    baseline = suite6.anomaly_baseline(ev)
    assert 0 < len(baseline) <= 24 * ev.select("event_type").distinct().count()
    stream = structured.stream_events(spark, events_dir)
    structured.run_to_memory(
        structured.anomaly_score_stream(stream, baseline), "stream_anomaly",
    )
    streamed = {
        (r["event_type"], r["day"], r["hour"]): (r["n_events"], r["z_score"])
        for r in spark.sql("SELECT * FROM stream_anomaly").collect()
    }
    batch = {
        (r["event_type"], r["day"], r["hour"]): (r["c"], r["z_score"])
        for r in suite6.anomaly_cells(ev).where("c > 0").collect()
    }
    assert len(streamed) > 0
    assert streamed == batch


def test_streaming_index_ingest_matches_batch_maintenance(
    spark, sf_dir, tmp_path
):
    """The streaming index-maintenance twin: micro-batches of documents
    appended into the persisted bucketed LSH index via foreachBatch must
    leave (1) an index row-equal to the batch-built one over the same
    documents, (2) snapshot files byte-untouched (append-only at trigger
    cadence), and (3) a probe answer equal to dedup_index_persist's
    certified result for the same corpus/new split."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F

    from datafusion_ray_spark.operators import dedup, suite7
    from datafusion_ray_spark.sources.bucketing import write_bucketed
    from datafusion_ray_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    snap0 = docs.where(~F.col("source").isin("src0", "src1"))
    new = docs.where(F.col("source") == "src0")

    table = "dfrs_stream_lsh_index"
    path = str(tmp_path / "stream_lsh_index")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        dedup.lsh_buckets(snap0).select("band", "bucket", "doc_id"),
        table, key=["band", "bucket"], n_buckets=32, path=path,
    )
    files_before = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    assert len(files_before) == 32

    # src1 split across 3 files + maxFilesPerTrigger=1 -> 3 micro-batches,
    # each landing an append at trigger cadence.
    src_dir = str(tmp_path / "arriving_docs")
    docs.where(F.col("source") == "src1").repartition(3).write.parquet(src_dir)
    ckpt = str(tmp_path / "ingest_ckpt")

    def make_stream():
        return (
            spark.readStream.schema(structured.DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    stream = make_stream()
    assert stream.isStreaming
    q = structured.index_ingest_stream(
        stream, table, n_buckets=32, checkpoint_dir=ckpt
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    files_after = {
        f: _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "*.parquet"))
    }
    assert set(files_before) <= set(files_after)
    for f, size in files_before.items():
        assert files_after[f] == size, f"stream append rewrote {f}"
    assert len(files_after) > len(files_before)

    # (1) index contents equal the batch-built index over snap0 ∪ src1
    want_rows = sorted(
        tuple(r)
        for r in dedup.lsh_buckets(docs.where(F.col("source") != "src0"))
        .select("band", "bucket", "doc_id")
        .collect()
    )
    got_rows = sorted(tuple(r) for r in spark.table(table).collect())
    assert got_rows == want_rows

    # RESTART with the SAME durable checkpoint: the offset log proves the
    # source fully processed, so no batch replays and no rows re-append —
    # the at-least-once contract a production deployment relies on. (A
    # fresh checkpoint would replay the whole source and double the index.)
    q2 = structured.index_ingest_stream(
        make_stream(), table, n_buckets=32, checkpoint_dir=ckpt
    )
    q2.awaitTermination()
    assert sorted(tuple(r) for r in spark.table(table).collect()) == want_rows

    # (3) probe equals the certified one-shot rebuild answer
    corpus = docs.where(F.col("source") != "src0")
    probe = dedup.incremental_dedup_pairs(
        corpus, new, corpus_index=spark.table(table)
    ).orderBy("doc_a", "doc_b")
    want = [
        tuple(r)
        for r in suite7.run_dedup_index_persist(spark, sf_dir).collect()
    ]
    assert [tuple(r) for r in probe.collect()] == want and len(want) > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_index_ingest_compaction_cadence(spark, sf_dir, tmp_path):
    """``compact_every_n_triggers``: after K triggers the in-stream
    compaction must restore the one-file-per-bucket invariant (file count
    back to n_buckets at the table's current generation), keep the index
    row-equal to the batch-built one, and keep the probe answer equal to
    the certified one-shot rebuild."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F

    from datafusion_ray_spark.operators import dedup, suite7
    from datafusion_ray_spark.sources.bucketing import (
        table_location,
        write_bucketed,
    )
    from datafusion_ray_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    snap0 = docs.where(~F.col("source").isin("src0", "src1"))
    new = docs.where(F.col("source") == "src0")

    table = "dfrs_stream_lsh_index_compact"
    path = str(tmp_path / "stream_lsh_index")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        dedup.lsh_buckets(snap0).select("band", "bucket", "doc_id"),
        table, key=["band", "bucket"], n_buckets=32, path=path,
    )

    # src1 split across 3 files + maxFilesPerTrigger=1 -> 3 micro-batches;
    # cadence 3 -> exactly one compaction, fired after the LAST append.
    src_dir = str(tmp_path / "arriving_docs")
    docs.where(F.col("source") == "src1").repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(structured.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = structured.index_ingest_stream(
        stream, table, n_buckets=32,
        checkpoint_dir=str(tmp_path / "ingest_ckpt"),
        compact_every_n_triggers=3,
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    # compaction swapped to a new generation with one file per bucket
    loc = table_location(spark, table)
    assert _os.path.normpath(loc) != _os.path.normpath(path)
    files = _glob.glob(_os.path.join(loc, "*.parquet"))
    assert len(files) == 32, f"{len(files)} files after in-stream compaction"
    # deferred GC: the old generation survives the swap (grace window for
    # concurrent readers); the next compaction cycle sweeps it.
    assert _os.path.exists(path), "grace window violated: old gen deleted"

    # index row-equal to the batch build; probe equals the certified answer
    want_rows = sorted(
        tuple(r)
        for r in dedup.lsh_buckets(docs.where(F.col("source") != "src0"))
        .select("band", "bucket", "doc_id")
        .collect()
    )
    assert sorted(tuple(r) for r in spark.table(table).collect()) == want_rows
    probe = dedup.incremental_dedup_pairs(
        docs.where(F.col("source") != "src0"), new,
        corpus_index=spark.table(table),
    ).orderBy("doc_a", "doc_b")
    want = [
        tuple(r)
        for r in suite7.run_dedup_index_persist(spark, sf_dir).collect()
    ]
    assert [tuple(r) for r in probe.collect()] == want and len(want) > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_ivf_ingest_with_compaction_cadence(spark, sf_dir, tmp_path):
    """The embeddings-side streaming maintenance twin: micro-batches of
    embeddings appended into the cell-partitioned IVF index under the
    FROZEN codebook, with in-stream compaction every K triggers. End
    state: one file per cell, search equal to the one-shot index built
    over snapshot ∪ all batches."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F

    from datafusion_ray_spark.operators import suite7 as s7
    from datafusion_ray_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = s7._ivf_codebook(emb)
    snapshot = emb.where(F.col("vec_id") % 7 != 3)
    batch = emb.where(F.col("vec_id") % 7 == 3)

    path = str(tmp_path / "stream_ivf_index")
    s7._ivf_write(snapshot, centroids, path, "overwrite")

    # the arriving batch split across 3 files + maxFilesPerTrigger=1 ->
    # 3 micro-batches; cadence 3 -> one compaction after the last append
    src_dir = str(tmp_path / "arriving_vecs")
    batch.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = structured.ivf_ingest_stream(
        stream, path, centroids,
        checkpoint_dir=str(tmp_path / "ivf_ckpt"),
        compact_every_n_triggers=3,
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    for d in _glob.glob(_os.path.join(path, "cell=*")):
        files = _glob.glob(_os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d}: {len(files)} files after compaction"
    # deferred GC: the retired old generation survives the swap (grace
    # window for concurrent readers); an explicit GC pass sweeps it.
    assert _glob.glob(path + ".gen*.retired"), "retired generation missing"
    from datafusion_ray_spark.sources.bucketing import gc_generations

    gc_generations(path)
    assert not _glob.glob(path + ".gen*"), "generation dirs survived GC"

    got = [tuple(r) for r in
           s7._ivf_search(spark, sf_dir, path, centroids).collect()]
    want = [tuple(r) for r in s7.run_ivf_persist(spark, sf_dir).collect()]
    assert got == want and len(got) == 10

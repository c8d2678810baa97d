"""Structured Streaming variants of the windowed event operators.

The batch operators in streaming/windows.py are written against plain
DataFrames; Spark's window machinery means the SAME functions run unchanged
on a streaming source — this module provides the readStream plumbing plus
watermarking, and a stateful per-user counter built on
``applyInPandasWithState`` (the reference has no streaming at all, so this
is pure extension surface).

At scale: streaming aggregation state lives in the state store partitioned
by grouping key; watermarks bound state size for late data.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import ts_to_utc


def _ordered_batch(pdfs):
    """Concatenate one key's micro-batch chunk iterator and sort it by
    (ts, event_id).

    ``applyInPandasWithState`` hands each key's micro-batch as an ITERATOR
    of Arrow-sized chunks; sorting each chunk independently would fold
    events out of global (ts, event_id) order whenever a key's batch spans
    chunk boundaries, silently breaking the bit-equality the
    order-sensitive twins (EWMA, rolling median, Markov, sessionize) claim
    against their batch operators. Returns None for an empty batch.
    """
    import pandas as pd

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    return pd.concat(chunks).sort_values(["ts", "event_id"])


def _events_ts_type(path_dir: str) -> T.DataType:
    """Read one parquet footer to learn how ``ts`` is physically stored.

    readStream requires a user-supplied schema, and guessing wrong is not a
    loud failure: forcing LongType over a micros-stored column silently
    yields values 1000x off (the round-2 regression — epoch ≈ 1970, wrong
    answers, no error).  The footer is the source of truth, so ask it.
    """
    candidates = (
        [path_dir]
        if os.path.isfile(path_dir)
        else sorted(
            glob.glob(os.path.join(path_dir, "**", "*.parquet"), recursive=True)
        )
    )
    if not candidates:  # empty dir: assume the current generator's shape
        return T.TimestampNTZType()
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_schema(candidates[0]).field("ts").type
    if pa.types.is_integer(t):
        return T.LongType()  # raw int64 nanos
    if pa.types.is_timestamp(t):
        if t.unit == "ns" and t.tz is None:
            # TIMESTAMP(NANOS): Spark only reads it via nanosAsLong
            return T.LongType()
        return T.TimestampType() if t.tz else T.TimestampNTZType()
    raise TypeError(f"unsupported parquet type for events.ts: {t}")


def events_schema(ts_type: T.DataType = T.TimestampNTZType()) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: kept for import compatibility (tests/examples); matches current testdata.
EVENTS_SCHEMA = events_schema()


def stream_events(spark: SparkSession, path_dir: str) -> DataFrame:
    """Streaming read of an events parquet directory, normalized to the same
    canonical TIMESTAMP as the batch loader (``sources.tables.load_table``)
    whatever the files' physical ts encoding (int64 nanos, NTZ micros, or
    tz'd micros)."""
    ts_type = _events_ts_type(path_dir)
    if isinstance(ts_type, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.readStream.schema(events_schema(ts_type)).parquet(path_dir)
    return ts_to_utc(raw, "ts")


def tumbling_counts_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling counts — streaming twin of
    ``windows.tumbling_agg`` (late data beyond the watermark is dropped;
    state is bounded per window x event_type)."""
    events = ts_to_utc(events, "ts")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding (hopping) window counts — streaming twin of
    ``windows.sliding_agg`` (each event lands in width/slide overlapping
    windows; late data beyond the watermark is dropped)."""
    events = ts_to_utc(events, "ts")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"), "n")
    )


def click_view_join_stream(
    events: DataFrame, window_minutes: int = 10, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joined to the
    same user's views from the preceding ``window_minutes``.

    Both sides carry watermarks and the join condition bounds event time on
    both, so Spark can expire join state — the requirement that makes a
    stream-stream join runnable on an unbounded stream (state is
    O(watermark-window of data), not O(stream))."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
        .alias("c")
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", watermark)
        .alias("v")
    )
    return clicks.join(
        views,
        F.expr(
            f"user_id = v_user AND v_ts >= ts - INTERVAL {window_minutes} MINUTES "
            "AND v_ts < ts"
        ),
        "inner",
    ).select("event_id", "user_id", "ts", "v_ts")


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming session windows — streaming twin of
    ``windows.session_agg`` (same ``F.session_window`` gap semantics).

    Append-mode output: a session emits once the watermark passes its end,
    so state for closed sessions is dropped — the property that keeps
    per-user session state bounded on an unbounded stream.
    """
    events = ts_to_utc(events, "ts")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup — twin of ``operators/dedup.exact_dedup``:
    keep the first event per content digest.

    ``dropDuplicatesWithinWatermark`` holds one digest per distinct content
    in the state store and expires it once the watermark passes, so dedup
    state is O(distinct-content within the watermark horizon), not
    O(stream) — the property that makes exact dedup runnable on an
    unbounded ingest stream."""
    return (
        events.withColumn(
            "digest", F.md5(F.concat_ws("\x1f", "event_type", "props"))
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("event_id", "ts", "digest")
    )


def stateful_user_counts_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count and
    value total via ``applyInPandasWithState``.

    State = (n_events, total_cents) per user_id, held in the state store
    (partitioned by the grouping key, so state scales horizontally with the
    cluster); each micro-batch folds its Arrow-batched rows into the state
    and emits the updated row. Money is accumulated in integer cents so the
    running total is exact and associative across micro-batches.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming query into an in-memory table (availableNow =
    process everything currently in the source, then stop)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, path_dir: str) -> DataFrame:
    """Streaming read of a documents parquet directory."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path_dir)


def cms_stream(events: DataFrame, key_col: str = "user_id",
               width: int | None = None) -> DataFrame:
    """Streaming count-min sketch — twin of ``sketch.count_min_build``.

    The sketch is maintained by Spark's NATIVE streaming aggregation in
    update/complete mode: the running state is exactly the D·W counters —
    bounded regardless of stream length, the defining property of a sketch
    — and each micro-batch folds in map-side-combined increments. Probing
    the emitted table is the same broadcast join as batch. Identical
    md5-derived buckets, so the streaming sketch equals the batch sketch
    over the same data bit-for-bit.
    """
    from ..operators.sketch import CMS_PREFIXES, CMS_WIDTH, cms_bucket

    w = width or CMS_WIDTH
    key = F.col(key_col).cast("string")
    arr = F.array(*[cms_bucket(key, p, w) for p in CMS_PREFIXES])
    return (
        events.select(F.posexplode(arr).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def lsh_candidate_pairs_stream(docs: DataFrame,
                               max_bucket_state: int = 64) -> DataFrame:
    """Streaming MinHash-LSH near-dup candidates: stateful banded buckets.

    The signature/banding pipeline (``dedup.lsh_buckets``) is pure
    projection, so it runs unchanged on the stream; the stateful part is
    per-(band, bucket) membership held in the state store via
    ``applyInPandasWithState``. When a document lands in an occupied bucket
    it immediately emits candidate pairs against the bucket's residents —
    i.e. near-dup detection AT INGEST TIME, no batch re-scan.

    State per bucket is capped at ``max_bucket_state`` doc ids (LSH buckets
    are tiny by construction; a production deployment would also TTL state
    by watermark). Scale shape: state is partitioned by (band, bucket) in
    the state store, so it shards horizontally like the batch shuffle.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import lsh_buckets

    b = lsh_buckets(docs).select("band", "bucket", "doc_id")

    def update(key, pdfs, state):
        import pandas as pd

        seen = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in sorted({int(x) for x in pdf["doc_id"]}):
                if d in seen:
                    continue
                for s in seen:
                    lo, hi = (s, d) if s < d else (d, s)
                    out_a.append(lo)
                    out_b.append(hi)
                if len(seen) < max_bucket_state:
                    seen.append(d)
        state.update((seen,))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return b.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType="doc_a long, doc_b long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stream(events: DataFrame, key_col: str = "user_id",
                         k: int = 16, n_groups: int = 8) -> DataFrame:
    """Streaming heavy hitters: sharded weighted Misra-Gries summaries.

    Each key is routed to one of ``n_groups`` state shards (hash of the
    key), and every shard maintains a Misra-Gries summary of at most ``k``
    counters (Misra & Gries 1982; weighted-update form of Berinde et al.
    2010): per micro-batch the batch's pre-aggregated key counts fold into
    the summary; overflow subtracts the minimum counter from everything
    and evicts zeros. Total state is ``n_groups * k`` counters — bounded
    regardless of stream length — and shards merge by union downstream
    (MG summaries are mergeable).

    Guarantee (per shard g with n_g processed rows): every stored count is
    an underestimate by at most n_g / k, so any key with true frequency
    > n_g / k is guaranteed present. Output rows per micro-batch:
    (grp, key, cnt, n_processed) — with an availableNow/single-batch drain
    the memory sink holds exactly the final summary.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    key = F.col(key_col).cast("string")
    grp = (
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % n_groups
    ).cast("int")
    routed = events.select(grp.alias("grp"), key.alias("key"))

    def update(gkey, pdfs, state):
        import pandas as pd

        if state.exists:
            keys, counts, n_seen = (
                list(state.get[0]),
                list(state.get[1]),
                int(state.get[2]),
            )
        else:
            keys, counts, n_seen = [], [], 0
        mg = dict(zip(keys, counts))
        for pdf in pdfs:
            for kv, c in sorted(pdf["key"].value_counts().items()):
                n_seen += int(c)
                mg[kv] = mg.get(kv, 0) + int(c)
                if len(mg) > k:
                    m = min(mg.values())
                    mg = {w: c2 - m for w, c2 in mg.items() if c2 > m}
        ordered = sorted(mg)
        state.update((ordered, [mg[w] for w in ordered], n_seen))
        yield pd.DataFrame(
            {
                "grp": [int(gkey[0])] * len(ordered),
                "key": ordered,
                "cnt": [mg[w] for w in ordered],
                "n_processed": [n_seen] * len(ordered),
            }
        )

    return routed.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType="grp int, key string, cnt long, n_processed long",
        stateStructType="keys array<string>, cnts array<long>, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bloom_dedup_stream(docs: DataFrame, bits: int = 32768,
                       n_shards: int = 8) -> DataFrame:
    """Streaming approximate dedup with BOUNDED state: a sharded Bloom
    filter over the exact-text digest.

    ``dropDuplicates`` holds one state row per distinct key forever —
    unbounded on an unbounded stream. Here each shard's entire state is a
    fixed ``bits``-bit bitmap (``n_shards * bits / 8`` bytes TOTAL,
    regardless of stream length). A document whose K bit positions are all
    set is flagged a probable duplicate; Bloom filters have no false
    negatives, so every true exact dup IS flagged — at the price of a
    bounded false-positive rate on novel docs (tunable via bits).

    Emits (doc_id, is_new). Routing key is the text digest, so shards and
    their bitmaps shard horizontally like any keyed state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.sketch import CMS_PREFIXES

    digest = F.md5(F.col("text"))
    shard = (
        F.conv(F.substring(digest, 29, 4), 16, 10).cast("long") % n_shards
    ).cast("int")
    routed = docs.select("doc_id", digest.alias("digest"), shard.alias("shard"))
    n_words = bits // 64

    def update(key, pdfs, state):
        import hashlib

        import pandas as pd

        words = list(state.get[0]) if state.exists else [0] * n_words
        out_id: list[int] = []
        out_new: list[bool] = []
        for pdf in pdfs:
            for doc_id, dg in sorted(zip(pdf["doc_id"], pdf["digest"])):
                pos = [
                    int(
                        hashlib.md5((p + dg).encode()).hexdigest()[:4], 16
                    ) % bits
                    for p in CMS_PREFIXES
                ]
                seen = all(words[b // 64] >> (b % 64) & 1 for b in pos)
                for b in pos:
                    words[b // 64] |= 1 << (b % 64)
                # keep words within signed-64 range for the state store
                words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
                out_id.append(int(doc_id))
                out_new.append(not seen)
        state.update((words,))
        yield pd.DataFrame({"doc_id": out_id, "is_new": out_new})

    return routed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="doc_id long, is_new boolean",
        stateStructType="bits array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_counts_tws(events: DataFrame) -> DataFrame:
    """Twin of ``stateful_user_counts_stream`` on Spark 4's NEW arbitrary-
    state API (``transformWithStateInPandas``, SPARK-46815): a
    ``StatefulProcessor`` with a typed ``ValueState`` instead of the legacy
    ``GroupState`` tuple.

    Same semantics and exact integer-cents accumulation; the new API adds
    explicit state lifecycle (init/close), typed state handles, and TTL
    support — this operator is the migration template for the other
    stateful ops. State shards by the grouping key exactly as before.

    Capability-gated like Avro: the new API's driver worker imports
    google.protobuf, absent in this sandbox — the operator is correct on
    any standard Spark 4 cluster and its test skips without protobuf.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf "
            "(pyspark's StateMessage_pb2); not available in this "
            "environment — use stateful_user_counts_stream instead"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class RunningCounts(StatefulProcessor):
        def init(self, handle):
            schema = StructType(
                [StructField("n", LongType()), StructField("cents", LongType())]
            )
            self._state = handle.getValueState("counts", schema)

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                n, cents = self._state.get()
            else:
                n, cents = 0, 0
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningCounts(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def dsir_score_stream(docs: DataFrame, ratio: dict[int, int],
                      n_buckets: int | None = None) -> DataFrame:
    """Streaming DSIR scoring against a FROZEN log-ratio table — the
    at-ingest twin of ``operators.dsir.dsir_logweights`` (fit once in
    batch via ``dsir.frozen_ratio``, score every arriving document
    forever).

    Completely STATELESS: each document's score is a per-row array
    expression — tokenize, hash unigram+bigram features to buckets, look
    each bucket up in an ``n_buckets``-element literal array, integer-sum
    — so there is no shuffle, no state store, and no watermark needed;
    state is the broadcast-size literal table itself. Output is
    bit-identical to the batch scorer on the same data (same md5 buckets,
    same integer nano-nat arithmetic, same rounding).
    """
    from ..operators.dsir import DSIR_BUCKETS
    from ..operators.text import LM_SCALE, tokens

    nb = n_buckets or DSIR_BUCKETS
    toks = tokens("text")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    llr_arr = F.array(*[F.lit(int(ratio.get(b, 0))) for b in range(nb)])

    def bucket(f):
        return (
            F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("long") % nb
        ).cast("int")

    vals = F.transform(feats, lambda f: F.element_at(llr_arr, bucket(f) + 1))
    total = F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size(feats)
    return (
        docs.where(n > 0)
        .select(
            "doc_id",
            n.cast("int").alias("n_feats"),
            F.round(total / (n.cast("double") * F.lit(float(LM_SCALE))), 4)
            .alias("logw_nats"),
        )
    )


def lm_score_stream(docs: DataFrame, probs: dict[str, int],
                    llr_oov: int) -> DataFrame:
    """Streaming perplexity scoring against a FROZEN unigram LM — the
    at-ingest twin of ``operators.text.lm_score`` (fit once in batch via
    ``text.frozen_lm``, score every arriving document forever).

    STATELESS like ``dsir_score_stream``: the frozen prob table rides in
    the mapInPandas closure (vocab-capped, driver-sized) and each
    document scores from its own tokens — no shuffle, no state store, no
    watermark. Tokenization replicates the JVM ``split(trim(text),
    '\\s+')`` exactly (Java ``\\s`` is ASCII-only, so the kernel splits
    on the same ASCII class). Output is bit-identical to the batch
    scorer on the same data (same integer nano-nat sums, same rounding).
    """
    import re

    from pyspark.sql import types as T

    from ..operators.text import LM_SCALE

    ln2 = 0.6931471805599453
    ws = re.compile(r"[ \t\n\x0b\x0c\r]+")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("xent_bits", T.DoubleType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, ns, xs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = ws.split(text.strip(" \t\n\x0b\x0c\r"))
                s = sum(probs.get(w, llr_oov) for w in toks)
                ids.append(int(doc_id))
                ns.append(len(toks))
                xs.append(round(-s / (len(toks) * LM_SCALE * ln2), 4))
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": ns, "xent_bits": xs}
            )

    return docs.mapInPandas(gen, out_schema)


EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def stream_embeddings(spark: SparkSession, path_dir: str) -> DataFrame:
    """Streaming read of an embeddings parquet directory."""
    return spark.readStream.schema(EMBEDDINGS_SCHEMA).parquet(path_dir)


def semdedup_stream(vectors: DataFrame,
                    centroids: list[tuple[int, list[float]]],
                    threshold: float = 0.4,
                    max_cell_state: int = 256) -> DataFrame:
    """SemDeDup AT INGEST: every arriving vector is coarse-assigned to its
    IVF cell (stateless Arrow kernel, same as batch) and compared against
    the cell's resident vectors in the state store — a semantic duplicate
    is flagged the moment it arrives, no batch re-scan.

    State per cell is capped at ``max_cell_state`` resident vectors (k
    scales with the corpus in production so cells stay small; a TTL/
    re-cluster cycle handles drift). Within-cell residents accumulate in
    arrival order, so with id-ordered arrival the verdicts equal the batch
    operator's keep-lowest-id rule (asserted in tests). State shards by
    cell exactly like the batch shuffle.
    """
    import numpy as np
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.similarity import ivf_assign

    assigned = ivf_assign(vectors, centroids).select("cell", "vec_id", "embedding")

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            ids = list(state.get[0])
            flat = list(state.get[1])
        else:
            ids, flat = [], []
        dim = None
        out_id, out_kept = [], []
        # Concatenate the chunk iterator BEFORE sorting: per-chunk sorting
        # would process vec_ids out of global order when a cell's batch
        # spans Arrow chunks (same fix as _ordered_batch for the ts twins).
        chunks = [p for p in pdfs if len(p)]
        order = (
            pd.concat(chunks).sort_values("vec_id") if chunks else None
        )
        if order is not None:
            for vec_id, emb in zip(order["vec_id"], order["embedding"]):
                v = np.asarray(emb, dtype=np.float64)
                dim = dim or len(v)
                vn = np.sqrt((v * v).sum()) or 1.0
                dup = False
                if ids:
                    M = np.asarray(flat, dtype=np.float64).reshape(len(ids), -1)
                    mn = np.sqrt((M * M).sum(axis=1))
                    mn[mn == 0.0] = 1.0
                    cos = np.round(M @ v / (mn * vn), 6)
                    dup = bool((cos >= threshold).any())
                out_id.append(int(vec_id))
                out_kept.append(not dup)
                # EVERY arrival becomes a resident (batch semantics: a
                # vector is a dup if ANY earlier cell-mate is close, even
                # one that was itself flagged), capped for bounded state.
                if len(ids) < max_cell_state:
                    ids.append(int(vec_id))
                    flat.extend(float(x) for x in v)
        state.update((ids, flat))
        yield pd.DataFrame(
            {
                "vec_id": out_id,
                "cell": [int(key[0])] * len(out_id),
                "kept": out_kept,
            }
        )

    return assigned.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType="vec_id long, cell int, kept boolean",
        stateStructType="ids array<long>, flat array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream(events: DataFrame, alpha_num: int = 1, alpha_den: int = 4) -> DataFrame:
    """Streaming twin of the EWMA feature: the TRUE recursive form
    ``e' = alpha*v + (1-alpha)*e`` per user, exact in integer micro-units
    (``e' = (num*v_us + (den-num)*e_us) DIV den``) — streaming state makes
    the unbounded recursion feasible where the batch operator
    (``operators/eventops.py:ewma_feature``) must bound its frame to keep
    relational integer weights from overflowing.

    Rows are folded in (ts, event_id) order within each micro-batch; the
    recursion is order-sensitive by definition, so correctness across
    batches assumes source-ordered arrival (true for replay/backfill; a
    production deployment would pair this with a watermark + sort buffer).
    Emits one update row per user per micro-batch: (user_id, n_seen,
    ewma) — state is two integers per key, horizontally partitioned.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, e_us = state.get if state.exists else (0, 0)
        pdf = _ordered_batch(pdfs)
        if pdf is not None:
            for v in pdf["value"]:
                v_us = int(v * 1_000_000)
                if n == 0:
                    e_us = v_us
                else:
                    e_us = (alpha_num * v_us + (alpha_den - alpha_num) * e_us) // alpha_den
                n += 1
        state.update((n, e_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_seen": [n],
                "ewma": [e_us / 1_000_000.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_seen long, ewma double",
        stateStructType="n long, e_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rolling_median_stream(events: DataFrame, frame_rows: int = 10) -> DataFrame:
    """Streaming twin of ``suite3.rolling_median_x2``: exact trailing-frame
    median per user, emitted per event in integer micro-units (same
    ``med_x2_us`` = sum-of-middle-two encoding, so batch and stream are
    bit-comparable).

    State is the frame itself — at most ``frame_rows`` int64 values per
    key, horizontally partitioned; each micro-batch folds rows in
    (ts, event_id) order. Like the EWMA twin, cross-batch correctness
    assumes source-ordered arrival (replay/backfill true; production pairs
    this with a watermark + sort buffer).
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        buf = list(state.get[0]) if state.exists else []
        out_ids: list[int] = []
        out_med: list[int] = []
        pdf = _ordered_batch(pdfs)
        if pdf is not None:
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                buf.append(math.floor(v * 1_000_000))
                buf = buf[-frame_rows:]
                s = sorted(buf)
                n = len(s)
                out_ids.append(int(eid))
                out_med.append(s[(n + 1) // 2 - 1] + s[n // 2])
        state.update((buf,))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": [key[0]] * len(out_ids),
                "med_x2_us": out_med,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="event_id long, user_id long, med_x2_us long",
        stateStructType="buf array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def markov_pairs_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the Markov transition matrix
    (``operators/suite4.py:run_markov_transitions``): per user, state is
    ONLY the last event's (eus, event_id, type); each arriving event emits
    one (from_type, to_type) pair row. Aggregating the emitted pairs
    (count per pair, ppm per source state) reproduces the batch matrix
    exactly — the test certifies it.

    State is O(1) per key (three scalars), horizontally partitioned — the
    minimal-state form of sequence analytics at ingest time. Rows fold in
    (ts, event_id) order within each micro-batch; as with the EWMA twin,
    cross-batch order assumes replay/backfill arrival.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            _eus, _eid, last = state.get
        else:
            _eus, _eid, last = (0, 0, None)
        frm: list[str] = []
        to: list[str] = []
        pdf = _ordered_batch(pdfs)
        if pdf is not None:
            for eid, ts, et in zip(pdf["event_id"], pdf["ts"], pdf["event_type"]):
                if last is not None:
                    frm.append(last)
                    to.append(et)
                _eus, _eid, last = int(ts.value // 1000), int(eid), et
        state.update((_eus, _eid, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(frm),
                "from_type": frm,
                "to_type": to,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, from_type string, to_type string",
        stateStructType="eus long, eid long, last string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(events: DataFrame,
                      gap_minutes: int = 30) -> DataFrame:
    """Streaming twin of row-level sessionization
    (``operators/suite4.py:run_sessionize``): every arriving event is
    labeled with its (user_id, session_idx) AT INGEST. State per key is
    two integers (last event's epoch-us, current session index) — the
    labels a real-time personalization/abandonment pipeline joins on,
    without waiting for the batch pass.

    Rows fold in (ts, event_id) order within each micro-batch; as with
    the EWMA/Markov twins, cross-batch order assumes replay/backfill
    arrival. Emits one append row per event, bit-equal to the batch
    operator under those conditions (the test certifies it).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state):
        import pandas as pd

        last_eus, idx = state.get if state.exists else (None, 0)
        out_eid: list[int] = []
        out_eus: list[int] = []
        out_idx: list[int] = []
        pdf = _ordered_batch(pdfs)
        if pdf is not None:
            for eid, ts in zip(pdf["event_id"], pdf["ts"]):
                eus = int(ts.value // 1000)
                if last_eus is None or eus - last_eus >= gap_us:
                    idx += 1
                last_eus = eus
                out_eid.append(int(eid))
                out_eus.append(eus)
                out_idx.append(idx)
        state.update((last_eus if last_eus is not None else 0, idx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_eid),
                "event_id": out_eid,
                "eus": out_eus,
                "session_idx": out_idx,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, eus long, session_idx int",
        stateStructType="last_eus long, idx int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of last-touch conversion attribution
    (``operators/suite4.py:run_attribution``): per user, state is ONLY
    the most recent touch event's (epoch-us, type); each arriving
    purchase emits one credited row AT INGEST — (user_id, event_id,
    touch_type, vus), where touch_type is the latest preceding
    click/view within the 7-day lookback, else 'none'. Aggregating the
    emitted rows by touch_type reproduces the batch operator exactly
    (the test certifies it).

    State is O(1) per key (two scalars), horizontally partitioned. Rows
    fold in (ts, event_id) order within each micro-batch; as with the
    EWMA/Markov/sessionize twins, cross-batch order assumes
    replay/backfill arrival.
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.suite4 import (
        ATTRIBUTION_LOOKBACK_US,
        ATTRIBUTION_TOUCH_TYPES,
    )

    touch_types = set(ATTRIBUTION_TOUCH_TYPES)

    def update(key, pdfs, state):
        import pandas as pd

        teus, ttype = state.get if state.exists else (0, None)
        out_eid: list[int] = []
        out_touch: list[str] = []
        out_vus: list[int] = []
        pdf = _ordered_batch(pdfs)
        if pdf is not None:
            for eid, ts, et, val in zip(
                pdf["event_id"], pdf["ts"], pdf["event_type"], pdf["value"]
            ):
                eus = int(ts.value // 1000)
                if et == "purchase":
                    credited = (
                        ttype
                        if ttype is not None
                        and eus - teus <= ATTRIBUTION_LOOKBACK_US
                        else "none"
                    )
                    out_eid.append(int(eid))
                    out_touch.append(credited)
                    out_vus.append(int(math.floor(val * 1_000_000)))
                elif et in touch_types:
                    teus, ttype = eus, et
        state.update((teus, ttype))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_eid),
                "event_id": out_eid,
                "touch_type": out_touch,
                "vus": out_vus,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, touch_type string, vus long",
        stateStructType="teus long, ttype string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def anomaly_score_stream(
    events: DataFrame,
    baseline: list[tuple],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming seasonal-anomaly scoring against a FROZEN batch-fit
    hour-of-day baseline — the at-ingest twin of
    ``operators.suite6.run_ev_anomaly`` (fit the per-(type, hour-of-day)
    stats once in batch via ``suite6.anomaly_baseline``, score every
    arriving hour forever).

    Watermarked tumbling 1h counts per event_type, then a stream-static
    join against the |types|·24-row baseline frame (broadcast by size)
    and the shared exact-integer z formula (``suite6.anomaly_zscore``) —
    bit-identical to the batch scorer on the cells the stream can see.
    One semantic difference is inherent, not a bug: a RETROSPECTIVE
    batch screen scores silent hours as zero-count cells, but a stream
    emits no window for an hour with no events, so the streaming twin
    flags only observed activity (positive spikes and non-empty lulls).
    State is the windowed-count store, bounded by the watermark.
    """
    from ..operators.suite6 import anomaly_zscore

    spark = events.sparkSession
    base = spark.createDataFrame(
        baseline, "event_type string, hour int, n long, s long, q long"
    )
    events = ts_to_utc(events, "ts")
    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(
            F.to_date("w.start").alias("day"),
            F.hour("w.start").alias("hour"),
            "event_type",
            "c",
        )
    )
    joined = counts.join(base, ["event_type", "hour"])
    return joined.select(
        "event_type",
        "day",
        "hour",
        F.col("c").cast("long").alias("n_events"),
        anomaly_zscore(
            F.col("c"), F.col("n"), F.col("s"), F.col("q")
        ).alias("z_score"),
    )


def index_ingest_stream(
    docs: DataFrame,
    table: str,
    n_buckets: int = 32,
    checkpoint_dir: str | None = None,
    compact_every_n_triggers: int | None = None,
) -> "object":
    """Continuous maintenance of the persisted bucketed LSH index — the
    streaming twin of ``operators.suite7.run_dedup_index_append``.

    Each arriving micro-batch of documents is shingled/minhashed/banded by
    the same pure projection as batch (``dedup.lsh_buckets``), then landed
    into the bucketed index table via ``sources.bucketing.append_bucketed``
    inside ``foreachBatch`` — so every trigger appends n_buckets NEW files
    and never rewrites existing ones, the identical O(batch) maintenance
    contract the nightly batch operator certifies, just at trigger cadence.
    Probes against ``spark.table(table)`` between triggers keep the
    Exchange-free bucketed scan (co-partitioning is a property of the
    layout, which appends preserve).

    foreachBatch is the right tool (not a stateful operator): the "state"
    IS the on-disk index, shared with the batch path; Structured
    Streaming's checkpoint gives at-least-once batch delivery, and
    re-delivered batches re-append identical (band, bucket, doc_id) rows,
    which the probe's DISTINCT candidate set makes idempotent for answers.

    ``checkpoint_dir`` is where the at-least-once contract LIVES: a
    production deployment MUST pass a durable location and reuse it across
    restarts, or every restart replays the whole source and re-appends all
    historical rows (unbounded index growth). The default mkdtemp is only
    for one-shot availableNow drains (tests, backfills) where the query is
    never restarted.

    ``compact_every_n_triggers``: appends fragment the index (n_buckets
    new files per trigger, forever); a production ingest needs a cadence
    that restores the one-file-per-bucket invariant. Every Nth committed
    batch, the generation-then-swap compactor
    (``sources.bucketing.compact_bucketed`` — old generation intact until
    the catalog swap commits) runs INSIDE foreachBatch, so compaction is
    serialized with appends on the streaming thread and never races an
    in-flight write to the same table. Cadence is keyed on ``batch_id``,
    which the checkpoint makes stable across restarts: a replayed batch
    re-runs its compaction, which is idempotent (a rewrite of the same
    rows into a fresh generation).

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..operators.dedup import lsh_buckets
    from ..sources.bucketing import append_bucketed, compact_bucketed

    b = lsh_buckets(docs).select("band", "bucket", "doc_id")

    def land(batch_df: DataFrame, batch_id: int) -> None:
        append_bucketed(
            batch_df, table, key=["band", "bucket"], n_buckets=n_buckets
        )
        if (
            compact_every_n_triggers
            and (batch_id + 1) % compact_every_n_triggers == 0
        ):
            compact_bucketed(
                batch_df.sparkSession, table,
                key=["band", "bucket"], n_buckets=n_buckets,
            )

    return (
        b.writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dfrs_idx_ingest_ckpt_"),
        )
        .start()
    )


def ivf_ingest_stream(
    embeddings: DataFrame,
    path: str,
    centroids: list,
    checkpoint_dir: str | None = None,
    compact_every_n_triggers: int | None = None,
) -> "object":
    """Continuous maintenance of the persisted cell-partitioned IVF index
    — the embeddings-side twin of :func:`index_ingest_stream` (a vector
    store ingests continuously; the corpus index must never be rebuilt
    per batch).

    Each arriving micro-batch of ``(vec_id, embedding)`` rows is assigned
    with the FROZEN centroid codebook (``centroids``, trained at snapshot
    time — incremental maintenance must not move cell boundaries) and
    landed with ``mode("append")`` under the same ``partitionBy("cell")``
    layout the batch operators write: at most one NEW file per touched
    cell per trigger, existing files byte-untouched, directory-level
    PartitionFilters pruning intact for every probe between triggers.

    ``compact_every_n_triggers`` runs the generation-then-swap
    cell compactor (``sources.bucketing.compact_partitioned``) inside
    ``foreachBatch`` every Nth committed batch — serialized with appends,
    cadence keyed on the checkpointed batch_id. Same at-least-once
    semantics as the LSH twin: re-delivered batches re-append identical
    (vec_id, cell) rows, which the searcher's ``DISTINCT``/top-k makes
    idempotent for answers; pass a durable ``checkpoint_dir`` across
    restarts or the source replays from scratch.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..operators.suite7 import _ivf_write
    from ..sources.bucketing import compact_partitioned

    def land(batch_df: DataFrame, batch_id: int) -> None:
        _ivf_write(batch_df, centroids, path, "append")
        if (
            compact_every_n_triggers
            and (batch_id + 1) % compact_every_n_triggers == 0
        ):
            compact_partitioned(batch_df.sparkSession, path, "cell")

    return (
        embeddings.writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dfrs_ivf_ingest_ckpt_"),
        )
        .start()
    )


def objectindex_ingest_stream(
    df: DataFrame,
    root: str,
    partition_col: str = "cell",
    opts: dict | None = None,
    app_id: str | None = None,
    checkpoint_dir: str | None = None,
    compact_every_n_triggers: int | None = None,
    gc_keep: int | None = None,
    gc_min_age_seconds: float | None = None,
) -> "object":
    """Continuous ingest into the manifest-committed object-store index
    (``sources.objectindex``) — the third member of the index-ingest
    family, and the only one with EXACTLY-ONCE commits.

    Each micro-batch lands as ONE atomic index commit (new immutable
    objects + a manifest + the pointer PUT), so a reader can never
    observe half a trigger — a guarantee the local ``partitionBy`` twins
    cannot make. With ``app_id`` set, every commit records its slot in
    the manifest's per-app ``streams`` map (``{app_id: batch_id}`` — the
    Delta ``txn`` pattern), and a RE-DELIVERED batch — restart replay
    under the same checkpoint, or a whole re-run against the same index
    — is detected and skipped: at-least-once delivery becomes
    exactly-once index contents. The map MERGES on every commit, so
    several streams (and manual appends, and compactions) ingesting into
    one index never erase each other's replay protection. Without
    ``app_id`` the semantics match the local twins (at-least-once,
    searcher-side dedup).

    ``compact_every_n_triggers`` commits a compaction every Nth batch
    (serialized with appends on the streaming thread); ``gc_keep``
    additionally sweeps versions beyond that retention after each
    compaction — a fully self-maintaining ingest loop.
    ``gc_min_age_seconds`` (default: ``gc_index``'s 15-minute grace)
    shields OTHER writers' in-flight commits from that sweep; lower it
    only when this stream is provably the index's one writer. Pass a
    durable ``checkpoint_dir`` in production; the mkdtemp default is for
    one-shot availableNow drains.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..sources.objectindex import (
        DEFAULT_GC_GRACE_SECONDS, compact_index, gc_index, load_manifest,
        write_index,
    )

    def land(batch_df: DataFrame, batch_id: int) -> None:
        if app_id is not None:
            try:
                live = load_manifest(root, opts=opts)
            except FileNotFoundError:
                live = None
            landed = (live or {}).get("streams", {}).get(app_id)
            if landed is not None and landed >= batch_id:
                return  # replayed batch: its commit is already live
        meta = (
            {"streams": {app_id: batch_id}} if app_id is not None else None
        )
        write_index(
            batch_df, root, partition_col=partition_col, mode="append",
            opts=opts, extra_meta=meta,
        )
        if (
            compact_every_n_triggers
            and (batch_id + 1) % compact_every_n_triggers == 0
        ):
            compact_index(batch_df.sparkSession, root, opts=opts)
            if gc_keep:
                gc_index(
                    root, keep=gc_keep, opts=opts,
                    min_age_seconds=(
                        DEFAULT_GC_GRACE_SECONDS
                        if gc_min_age_seconds is None
                        else gc_min_age_seconds
                    ),
                )

    return (
        df.writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dfrs_oidx_ingest_ckpt_"),
        )
        .start()
    )

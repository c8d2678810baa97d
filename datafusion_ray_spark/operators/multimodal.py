"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): images/audio/video ride through the
engine as ``binary`` columns with a typed metadata struct; decode /
feature-extract are Arrow-batched Pandas transforms (``mapInPandas``) so the
bytes never round-trip through per-row Python.

The container has no image/audio codecs, so the decode kernel is STUBBED
(`NotImplementedError` for real codecs, a deterministic fake for
``format='fake'``) — but the Spark-side plumbing is real and tested: schema
contract, Arrow batch shape, partition-preserving execution, and the
metadata fast path that never touches payload bytes.

Scale: ``decode_features`` is mapInPandas (no shuffle, no driver
materialization); metadata queries prune the payload column entirely —
check ``.explain``: the parquet/source scan reads only ``meta`` when the
query doesn't reference ``payload``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Codecs the decode kernel understands. Only 'fake' is implemented in this
#: container; real codecs raise until the imaging libs are present.
SUPPORTED_FORMATS = ("fake",)

FEATURE_DIM = 8

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload + metadata struct to the documents table.

    Stands in for real media ingestion: payload = utf-8 bytes of the text,
    metadata carries (format, width, height, channels) like an image table
    would.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.col("n_chars") % 1024).cast("int").alias("width"),
            (F.col("n_chars") % 768).cast("int").alias("height"),
            F.lit(3).alias("channels"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of payloads (driver for the fake codec)."""
    fmts = pdf["meta"].map(lambda m: m["format"])
    bad = fmts[~fmts.isin(SUPPORTED_FORMATS)]
    if len(bad):
        raise NotImplementedError(
            f"codec(s) {sorted(set(bad))} require imaging libraries not present "
            "in this container; only 'fake' is implemented"
        )
    # Vectorized kernel: concatenate the batch's payloads into one uint8
    # buffer and compute every per-row reduction from its prefix sums — no
    # per-row (let alone per-byte) Python.  This is also the shape a real
    # codec integration takes: one contiguous buffer per Arrow batch.
    payloads = pdf["payload"].tolist()
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64,
                       count=len(payloads))
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    csum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
    checksum = csum[offsets[1:]] - csum[offsets[:-1]]

    # Fake feature = FEATURE_DIM stripe sums (stripe = len//DIM, remainder
    # ignored; short payloads clamp at len), L1-normalized.
    stripe = np.maximum(1, lens // FEATURE_DIM)
    bounds = np.minimum(
        np.arange(FEATURE_DIM + 1)[None, :] * stripe[:, None], lens[:, None]
    )
    ssum = csum[offsets[:-1, None] + bounds]
    sums = (ssum[:, 1:] - ssum[:, :-1]).astype(np.float64)
    totals = sums.sum(axis=1)
    totals[totals == 0.0] = 1.0
    feature = (sums / totals[:, None]).astype(np.float32)

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": pd.Series(lens, index=pdf.index).astype("int32"),
            "checksum": pd.Series(checksum, index=pdf.index).astype("int64"),
            "feature": pd.Series(feature.tolist(), index=pdf.index),
        }
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over (doc_id, payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return binary_df.mapInPandas(gen, DECODE_SCHEMA)


def meta_stats(binary_df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — payload column must be pruned from the scan
    (verify via .explain: ReadSchema excludes ``payload``)."""
    return (
        binary_df.groupBy(F.col("meta.format").alias("format"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("meta.width").cast("long")).alias("total_width"),
            F.max("meta.height").cast("int").alias("max_height"),
        )
        .orderBy("format")
    )


def byte_stats(binary_df: DataFrame) -> DataFrame:
    """Payload size stats without decoding (octet_length is JVM-side)."""
    return binary_df.select(
        "doc_id",
        F.octet_length("payload").cast("int").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("doc_id")


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def resize(binary_df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """'Resize' media payloads to width x height via the fake codec
    (deterministic nearest-neighbor byte subsample). The real seam: swap the
    inner ``rs`` for an imaging-library decode->resample->encode; the Spark
    plumbing (Arrow batches in, binary column out, metadata rewrite) is what
    this operator actually provides.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        grid = np.arange(n, dtype=np.int64)

        def rs(b: bytes) -> bytes:
            if not b:
                return bytes(n)
            # Nearest-neighbor subsample as one numpy gather, no byte loop.
            return np.frombuffer(b, dtype=np.uint8)[(grid * len(b)) // n].tobytes()

        for pdf in batches:
            fmts = pdf["meta"].map(lambda m: m["format"])
            bad = fmts[~fmts.isin(SUPPORTED_FORMATS)]
            if len(bad):
                raise NotImplementedError(
                    f"resize for codec(s) {sorted(set(bad))} requires imaging "
                    "libraries not present in this container"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(rs),
                    "width": width,
                    "height": height,
                }
            )

    return binary_df.mapInPandas(gen, RESIZE_SCHEMA)


def frame_sample(
    binary_df: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from each payload —
    the video frame-sampling shape: one input row fans out to N output rows
    inside the Arrow batch (mapInPandas handles the 1->N expansion; no
    explode of binary data through the JVM).
    """

    stride = frame_bytes * every_n

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_id": [], "frame": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # Slice only the SELECTED frames (stride = every_n frames);
                # unselected frames are never materialized, and each slice is
                # one C-level bytes copy, no per-byte Python.
                for off in range(0, len(payload), stride):
                    frame = payload[off : off + frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(off // frame_bytes)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(gen, FRAME_SCHEMA)

"""P7: payload-width throughput probe — mapInPandas (current frame_lumas
kernel) vs a zero-copy mapInArrow twin that reads the Arrow binary
column's offsets/data buffers directly (no per-row Python bytes, no
b"".join copy). Constant total bytes per width so rows = total/width.
Also measures the real sf0.1 payload width for context."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import load_table
from datafusion_ray_spark.operators import multimodal as mm

FRAME = 256
SCHEMA = "doc_id long, frame_id int, luma long, flen int"


def lumas_pandas(df):
    """The pre-r12 mapInPandas kernel, inlined verbatim (module-state
    independent: after the rewrite ships, mm.frame_lumas IS the arrow
    form, so the probe carries its own pandas leg)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = list(pdf["payload"])
            lens = np.fromiter(
                (len(b) for b in payloads), dtype=np.int64, count=len(payloads)
            )
            nf = -(-lens // FRAME)
            total = int(nf.sum())
            if not total:
                continue
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
            doc_idx = np.repeat(np.arange(len(pdf)), nf)
            frame_id = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(nf)))[:-1], nf)
            starts = offsets[doc_idx] + frame_id * FRAME
            ends = np.minimum(starts + FRAME, offsets[doc_idx] + lens[doc_idx])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy()[doc_idx],
                 "frame_id": frame_id.astype("int32"),
                 "luma": cs[ends] - cs[starts],
                 "flen": (ends - starts).astype("int32")})

    return df.select("doc_id", "payload").mapInPandas(gen, SCHEMA)


def lumas_arrow(df):
    def gen(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            pay = b.column(1)
            off_buf = pay.buffers()[1]
            dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
            offs = np.frombuffer(off_buf, dtype=dtype)[
                pay.offset: pay.offset + len(pay) + 1
            ].astype(np.int64)
            data = np.frombuffer(pay.buffers()[2], dtype=np.uint8)
            lens = offs[1:] - offs[:-1]
            nf = -(-lens // FRAME)
            total = int(nf.sum())
            if not total:
                continue
            buf = data[offs[0]: offs[-1]]
            offsets = offs[:-1] - offs[0]
            cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            doc_idx = np.repeat(np.arange(len(pay)), nf)
            frame_id = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(nf)))[:-1], nf)
            starts = offsets[doc_idx] + frame_id * FRAME
            ends = np.minimum(starts + FRAME, offsets[doc_idx] + lens[doc_idx])
            doc_ids = b.column(0).to_numpy(zero_copy_only=False)[doc_idx]
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.int64()),
                 pa.array(frame_id.astype(np.int32)),
                 pa.array(cs[ends] - cs[starts]),
                 pa.array((ends - starts).astype(np.int32))],
                ["doc_id", "frame_id", "luma", "flen"])
    return df.select("doc_id", "payload").mapInArrow(gen, SCHEMA)


spark = build_session(app_name="p7_probe")

# real bench payload width
docs = mm.with_binary_payload(load_table(spark, "/root/testdata/sf0.1", "documents"))
stats = docs.select(F.mean(F.length("payload")).alias("mean"),
                    F.expr("percentile(length(payload), 0.5)").alias("p50"),
                    F.max(F.length("payload")).alias("max")).first()
print("bench payload width:", dict(stats.asDict()), flush=True)

TOTAL = 32 * 1024 * 1024
out = {"bench_payload": {k: float(v) for k, v in stats.asDict().items()},
       "frame_bytes": FRAME, "total_bytes_per_case": TOTAL, "cases": {}}
for width in (64, 256, 1024, 4096, 16384):
    n = TOTAL // width
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.substring(F.repeat(F.md5(F.col("id").cast("string")), width // 16 + 2),
                    1, width).cast("binary").alias("payload"),
    ).repartition(32).persist()
    base.count()
    case = {}
    for label, fn in (("pandas", lumas_pandas),
                      ("arrow", lumas_arrow),
                      ("shipped", lambda d: mm.frame_lumas(d, FRAME))):
        walls = []
        for _ in range(3):
            t = time.perf_counter()
            got = fn(base).agg(F.sum("luma"), F.count("*")).first()
            walls.append(round(time.perf_counter() - t, 3))
        case[label] = {"walls": walls, "min": min(walls),
                       "check": [int(got[0]), int(got[1])]}
    case["ratio_arrow_over_pandas"] = round(
        case["arrow"]["min"] / case["pandas"]["min"], 3)
    out["cases"][str(width)] = case
    base.unpersist()
    print(width, case["pandas"]["min"], case["arrow"]["min"],
          "eq:", case["pandas"]["check"] == case["arrow"]["check"]
          and case["shipped"]["check"] == case["arrow"]["check"], flush=True)
with open("/root/repo/plans/r12/mapinarrow_probe.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))

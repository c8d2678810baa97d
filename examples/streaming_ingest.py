"""At-ingest streaming pipeline: the continuous twin of llm_pipeline.py.

Batch fits the model artifacts ONCE (DSIR log-ratio table, unigram LM);
the stream then processes every arriving document/event with bounded
state:

    events stream  -> watermarked tumbling counts     (native window agg)
                   -> exact dedup within watermark     (dropDuplicatesWithinWatermark)
    documents stream -> DSIR importance score          (stateless, frozen table)
                     -> perplexity score               (stateless, frozen LM)
                     -> MinHash-LSH near-dup candidates AT INGEST
                        (stateful banded buckets)

Run: python examples/streaming_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_ray_spark.operators import dsir, text
from datafusion_ray_spark.session import build_session
from datafusion_ray_spark.sources.tables import load_table
from datafusion_ray_spark.streaming import structured


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(app_name="streaming_ingest")

    # --- batch fit: the frozen scoring artifacts ---------------------------
    docs = load_table(spark, sf_dir, "documents")
    ratio = dsir.frozen_ratio(docs, docs.where(F.col("lang") == "en"))
    probs, llr_oov = text.frozen_lm(docs)

    with tempfile.TemporaryDirectory() as d:
        ev_dir, doc_dir = f"{d}/events", f"{d}/docs"
        os.makedirs(ev_dir), os.makedirs(doc_dir)
        shutil.copy(f"{sf_dir}/events.parquet", f"{ev_dir}/part-0.parquet")
        shutil.copy(f"{sf_dir}/documents.parquet", f"{doc_dir}/part-0.parquet")

        events = structured.stream_events(spark, ev_dir)
        structured.run_to_memory(
            structured.tumbling_counts_stream(events), "ev_counts"
        )
        print("watermarked tumbling counts (first 5):")
        spark.sql("SELECT * FROM ev_counts ORDER BY bucket_start, event_type").show(5)

        structured.run_to_memory(
            structured.dedup_stream(structured.stream_events(spark, ev_dir)),
            "ev_dedup", output_mode="append",
        )
        print("events surviving within-watermark exact dedup:",
              spark.sql("SELECT COUNT(*) FROM ev_dedup").first()[0])

        stream_docs = structured.stream_documents(spark, doc_dir)
        structured.run_to_memory(
            structured.dsir_score_stream(stream_docs, ratio),
            "doc_dsir", output_mode="append",
        )
        structured.run_to_memory(
            structured.lm_score_stream(
                structured.stream_documents(spark, doc_dir), probs, llr_oov
            ),
            "doc_lm", output_mode="append",
        )
        print("at-ingest scores (DSIR weight + perplexity, first 5 docs):")
        spark.sql(
            "SELECT d.doc_id, d.logw_nats, l.xent_bits "
            "FROM doc_dsir d JOIN doc_lm l USING (doc_id) ORDER BY doc_id"
        ).show(5)

        structured.run_to_memory(
            structured.lsh_candidate_pairs_stream(
                structured.stream_documents(spark, doc_dir)
            ),
            "doc_neardup", output_mode="append",
        )
        print("near-dup candidate pairs flagged at ingest:",
              spark.sql("SELECT COUNT(DISTINCT (doc_a, doc_b)) FROM doc_neardup").first()[0])

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

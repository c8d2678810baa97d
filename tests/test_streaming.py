"""Structured Streaming twin of the batch window operators: same results,
streaming execution (availableNow drain into a memory sink)."""

from __future__ import annotations

import pytest

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

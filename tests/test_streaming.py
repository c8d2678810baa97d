"""Structured Streaming twin of the batch window operators: same results,
streaming execution (availableNow drain into a memory sink)."""

from __future__ import annotations

import shutil

import pytest

from datafusion_ray_spark.sources.tables import load_table
from datafusion_ray_spark.streaming import structured, windows


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # readStream wants a directory; stage the single parquet file into one.
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


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

"""True Structured Streaming tests: file-source stream -> watermarked
windowed aggregation -> memory sink, compared against the identical batch
expression (one definition, two run modes).
"""

from __future__ import annotations

import os

import pytest

from vunnel_spark.session import load_table
from vunnel_spark.streaming import session_counts, sliding_counts, tumbling_counts


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-write the events table as a plain-timestamp parquet dir a file
    stream can read (the driver parquet's TIMESTAMP(NANOS) needs the
    load_table normalization first)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _as_sets(df, cols):
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


def test_streaming_tumbling_matches_batch(spark, event_stream_dir):
    batch = load_table(spark, os.path.dirname(event_stream_dir), "events") if False else None
    static = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_stream_dir)
    assert stream.isStreaming

    out = _run_stream(spark, tumbling_counts(stream), "t_tumbling")
    expect = tumbling_counts(static)
    cols = ["wstart", "wend", "event_type", "n", "total_value"]
    assert _as_sets(out, cols) == _as_sets(expect, cols)
    assert out.count() > 0


def test_streaming_sliding_matches_batch(spark, event_stream_dir):
    static = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_stream_dir)
    out = _run_stream(spark, sliding_counts(stream), "t_sliding")
    expect = sliding_counts(static)
    cols = ["wstart", "wend", "n"]
    assert _as_sets(out, cols) == _as_sets(expect, cols)


def test_streaming_session_matches_batch(spark, event_stream_dir):
    static = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_stream_dir)
    out = _run_stream(spark, session_counts(stream), "t_session")
    expect = session_counts(static)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _as_sets(out, cols) == _as_sets(expect, cols)

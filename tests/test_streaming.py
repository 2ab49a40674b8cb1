"""Structured Streaming tests: the same pipelines run batch and streaming
(file source, availableNow) and must agree; late rows beyond the watermark
are the only permitted divergence."""

from __future__ import annotations

import os

from d3d_etl_spark.io import load_table
from d3d_etl_spark.streaming.events import streaming_sessions, windowed_event_counts


def _run_stream_to_memory(spark, stream_df, name: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    # stage as parquet with µs timestamps so readStream sees a plain schema
    staged = os.path.join(str(tmp_path), "events")
    batch.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    _run_stream_to_memory(spark, windowed_event_counts(stream_src), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in windowed_event_counts(batch).collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_sessions_runs(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    staged = os.path.join(str(tmp_path), "events2")
    batch.write.parquet(staged)
    stream_src = spark.readStream.schema(batch.schema).parquet(staged)

    _run_stream_to_memory(spark, streaming_sessions(stream_src), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    by_user = {}
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        by_user.setdefault(r["user_id"], 0)
        by_user[r["user_id"]] += r["n_events"]
    # every event lands in exactly one session
    assert sum(by_user.values()) == batch.count()

"""Streaming event pipelines.

Batch/stream symmetry: these take any DataFrame — batch (`spark.read`) or
streaming (`spark.readStream`) — and declare the same logical plan; with a
streaming source Spark runs them incrementally with state cleanup governed
by the watermark. The grouped FSMs (operators/fsm.py) map to
`applyInPandasWithState` for live ingest; the windowed aggregates below are
the built-in path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.functions.money import cents


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time aggregation with late-data watermark:
    counts + exact value sums per (window, event_type)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def streaming_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows (F.session_window): gap-based sessions per
    user with watermarked state eviction — the streaming twin of
    operators.sessionize (which is the batch/window formulation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with bounded state: keep the first occurrence of
    each key combination, expiring dedup state once the watermark passes —
    the streaming twin of the batch hash-groupBy dedup (operators/dedup.py).
    Without the watermark bound the state grows with every key ever seen;
    with it, state size tracks the watermark horizon only."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_events(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension snapshot, broadcast so the stream never shuffles —
    the standard streaming lookup shape (dims re-read per batch pick up
    slowly-changing updates)."""
    return events.join(F.broadcast(dim), key, "left")


def stream_upsert_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...],
    dedup_keys: tuple[str, ...] = (),
):
    """Exactly-once streaming upsert into a partitioned parquet lake via
    foreachBatch: each micro-batch runs the SAME io.upsert_partition the
    batch jobs use (dedup on keys + dynamic partition overwrite), so
    replaying a batch after a failure rewrites its slice instead of
    duplicating it — idempotent as long as the batch's rows land in the
    partitions it touches. The checkpoint tracks source progress; the sink's
    idempotence makes the end-to-end effectively exactly-once (the standard
    Structured Streaming contract: replayable source + idempotent sink).

    Returns the DataStreamWriter (caller picks the trigger and starts it).
    """
    from d3d_etl_spark.io import upsert_partition

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partition(batch_df, path, partition_by, dedup_keys)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )

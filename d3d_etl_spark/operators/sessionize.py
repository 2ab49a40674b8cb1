"""Sessionization — the engine's canonical stateful-sequence operator.

The reference's stateful core (SURVEY.md §2.8) is per-game FSMs over ordered
plays. The relational-expressible half of that family (segment keys from
boundary flags, reference columns.py:144-159) is exactly sessionization:
    break flag = gap > threshold  ->  session id = running sum of breaks.
Pure windows — no applyInPandas needed, distributes as a single shuffle on
the partition key. (The genuinely non-relational FSMs — base-state tracking
with forced-advance cascades — live in operators/fsm.py as grouped maps.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    order_tiebreak: str,
    gap: str = "30 minutes",
    gap_micros: int | None = None,
) -> DataFrame:
    """Add `session_seq` (1-based per key) using an inactivity gap.

    Works in exact integer microseconds so the same rows sessionize
    identically anywhere.
    """
    if gap_micros is None:
        amount, unit = gap.split()
        gap_micros = int(amount) * {"seconds": 1, "minutes": 60, "hours": 3600}[unit] * 1_000_000
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    ts_us = F.unix_micros(F.col(ts))
    brk = F.when(ts_us - F.lag(ts_us).over(w) > gap_micros, 1).otherwise(0)
    session_seq = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1
    return df.withColumn("session_seq", session_seq.cast("long"))


def session_stats(df_with_sessions: DataFrame, key: str, ts: str) -> DataFrame:
    """Roll sessions up to one row each: bounds, duration, size."""
    ts_us = F.unix_micros(F.col(ts))
    return df_with_sessions.groupBy(key, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        ((F.max(ts_us) - F.min(ts_us)).cast("double") / 1_000_000.0).alias("duration_sec"),
    )

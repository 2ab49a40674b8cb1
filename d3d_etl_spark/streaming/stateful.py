"""Custom stateful streaming operators via applyInPandasWithState.

The batch grouped FSMs (operators/fsm.py) have a streaming twin: state that
persists ACROSS micro-batches, keyed by group, with timeout-based eviction.
`streaming_funnel` is the funnel FSM from operators/fsm.py reformulated for
live ingest — per user, the (state, n_funnels, n_abandoned) tuple survives
between triggers, so a funnel that spans micro-batches still completes.

This is the shape the reference's per-game trackers (SURVEY.md §2.8 F1/F2)
would take for live-game ingest: key = contest_id, state = base/queue
state, watermark-driven timeout at game end.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STATE_SCHEMA = "state long, n_funnels long, n_abandoned long"
FUNNEL_OUTPUT_SCHEMA = "user_id long, n_funnels long, n_abandoned long, final_state long"


def _funnel_step(state_tuple: tuple[int, int, int], event_type: str) -> tuple[int, int, int]:
    st, funnels, abandoned = state_tuple
    if event_type == "view":
        if st > 0:
            abandoned += 1
        st = 1
    elif event_type == "click":
        if st == 1:
            st = 2
    elif event_type == "purchase":
        if st == 2:
            funnels += 1
            st = 0
    return st, funnels, abandoned


def _funnel_with_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    st = state.get if state.exists else (0, 0, 0)
    st = tuple(st)
    for pdf in pdfs:
        ordered = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for et in ordered["event_type"]:
            st = _funnel_step(st, et)
    state.update(st)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_funnels": [st[1]],
            "n_abandoned": [st[2]],
            "final_state": [st[0]],
        }
    )


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user conversion funnel over a stream; state persists across
    micro-batches. Update output mode: one row per user per trigger with
    the running totals."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_with_state,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming base-state FSM: the reference's core per-game tracker (F1) under
# live-game ingest. Same transition function as the batch grouped map
# (pbp.state.fsm_step), so batch/stream semantics agree by construction;
# the (bases, current-half) tuple persists across micro-batches per game.
# ---------------------------------------------------------------------------

BASE_STATE_STREAM_SCHEMA = (
    "contest_id long, play_id long, bases_before string, bases_after string, "
    "r1_name string, r2_name string, r3_name string"
)
_BASE_STATE_STATE_SCHEMA = "r1 string, r2 string, r3 string, inning int, half string"


def _base_state_with_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    from d3d_etl_spark.pbp.state import fsm_step

    if state.exists:
        r1, r2, r3, inning, half = state.get
        bases = {1: r1, 2: r2, 3: r3}
        cur_half = (inning, half) if inning is not None else None
    else:
        bases, cur_half = {1: None, 2: None, 3: None}, None
    out = []
    for pdf in pdfs:
        ordered = pdf.sort_values("play_id", kind="mergesort")
        for row in ordered.itertuples(index=False):
            bases, cur_half, before, after, r1, r2, r3 = fsm_step(
                bases, cur_half, row.inning, row.half, row.play_text
            )
            out.append((key[0], row.play_id, before, after, r1, r2, r3))
    state.update((
        bases[1], bases[2], bases[3],
        cur_half[0] if cur_half else None,
        cur_half[1] if cur_half else None,
    ))
    yield pd.DataFrame(
        out,
        columns=[
            "contest_id", "play_id", "bases_before", "bases_after",
            "r1_name", "r2_name", "r3_name",
        ],
    )


def streaming_base_state(plays: DataFrame) -> DataFrame:
    """plays: streaming (contest_id, play_id, inning, half, play_text) —
    within-game order must be delivered in play_id order across batches
    (the live feed appends); out-of-order replay needs a reprocessing batch
    run instead."""
    return plays.groupBy("contest_id").applyInPandasWithState(
        _base_state_with_state,
        outputStructType=BASE_STATE_STREAM_SCHEMA,
        stateStructType=_BASE_STATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming pitcher-queue FSM: the reference's ordered stateful join (F2/J15)
# under live-game ingest. The static pitching lineup becomes per-game queue
# ARRAYS attached to each play by a stream-static join; the cross-batch state
# is the (possibly narration-patched) queues plus the two pointers. The step
# function is pbp.pitchers.pitcher_step — the same code the batch cogroup FSM
# runs, so batch/stream semantics agree by construction.
# ---------------------------------------------------------------------------

PITCHER_STREAM_SCHEMA = "contest_id long, play_id long, pitcher_name string"
_PITCHER_STATE_SCHEMA = (
    "home_q array<string>, away_q array<string>, home_ptr int, away_ptr int"
)


def _pitcher_with_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    from d3d_etl_spark.pbp.pitchers import pitcher_step

    if state.exists:
        hq, aq, hp, ap = state.get
        queues = {"home": list(hq or []), "away": list(aq or [])}
        ptr = {"home": hp, "away": ap}
    else:
        queues, ptr = None, {"home": 0, "away": 0}
    out = []
    for pdf in pdfs:
        ordered = pdf.sort_values("play_id", kind="mergesort")
        for row in ordered.itertuples(index=False):
            if queues is None:  # first play seen: queues ride in on the row
                # arrays arrive as numpy arrays (or None for a missing join)
                queues = {
                    "home": [] if row.home_q is None else list(row.home_q),
                    "away": [] if row.away_q is None else list(row.away_q),
                }
            out.append(
                (key[0], row.play_id, pitcher_step(queues, ptr, row.half, row.play_text))
            )
    if queues is not None:
        state.update((queues["home"], queues["away"], ptr["home"], ptr["away"]))
    yield pd.DataFrame(out, columns=["contest_id", "play_id", "pitcher_name"])


def lineup_queues(pitching_lineups: DataFrame) -> DataFrame:
    """(contest_id, side, pitch_order, player_name) static table ->
    (contest_id, home_q, away_q) ordered queue arrays. array_sort on
    (pitch_order, name) structs gives a deterministic order; collect_list
    ignores the other side's nulls."""
    from pyspark.sql import functions as F

    def side_q(side: str):
        s = F.when(
            F.col("side") == side, F.struct("pitch_order", "player_name")
        )
        return F.transform(
            F.array_sort(F.collect_list(s)), lambda x: x["player_name"]
        ).alias(f"{side}_q")

    return pitching_lineups.groupBy("contest_id").agg(side_q("home"), side_q("away"))


def streaming_pitchers(plays: DataFrame, pitching_lineups: DataFrame) -> DataFrame:
    """plays: streaming (contest_id, play_id, half, play_text);
    pitching_lineups: STATIC ordered lineup table. Stream-static equi-join
    stamps each play with its game's queues (broadcast — lineups are tiny
    per game); the grouped state then owns queue evolution across
    micro-batches. Same in-order delivery contract as streaming_base_state.
    """
    from pyspark.sql import functions as F

    queues = lineup_queues(pitching_lineups)
    enriched = plays.select("contest_id", "play_id", "half", "play_text").join(
        F.broadcast(queues), "contest_id", "left"
    )
    return enriched.groupBy("contest_id").applyInPandasWithState(
        _pitcher_with_state,
        outputStructType=PITCHER_STREAM_SCHEMA,
        stateStructType=_PITCHER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState variant of the funnel: the modern arbitrary-state API
# (Spark 4) — named state variables, optional timers/TTL, RocksDB-backed.
# Same _funnel_step transition as streaming_funnel/applyInPandasWithState,
# so all three implementations (batch FSM, legacy state API, this) agree by
# construction. Requires the RocksDB state store provider (set by
# streaming_funnel_tws below; the HDFS-backed default does not support
# transformWithState).
# ---------------------------------------------------------------------------


def _tws_classes():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return StatefulProcessor, StatefulProcessorHandle


def make_funnel_processor():
    from pyspark.sql.types import LongType, StructField, StructType

    StatefulProcessor, _ = _tws_classes()
    state_schema = StructType(
        [
            StructField("st", LongType()),
            StructField("funnels", LongType()),
            StructField("abandoned", LongType()),
        ]
    )

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("funnel", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            st = tuple(self._state.get()) if self._state.exists() else (0, 0, 0)
            for pdf in rows:
                ordered = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                for et in ordered["event_type"]:
                    st = _funnel_step(st, et)
            self._state.update(st)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_funnels": [st[1]],
                    "n_abandoned": [st[2]],
                    "final_state": [st[0]],
                }
            )

        def close(self) -> None:
            pass

    return FunnelProcessor()


def streaming_funnel_tws(events: DataFrame) -> DataFrame:
    """Funnel via transformWithStateInPandas. Output rows/semantics match
    streaming_funnel exactly; the API difference is the state surface
    (named variables, timers, TTL) and the mandatory RocksDB provider.

    Environment note: the worker-side state protocol imports
    google.protobuf, which not every pyspark install ships — the parity
    test skips where it's absent and applyInPandasWithState
    (streaming_funnel) remains the proven path."""
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_funnel_processor(),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

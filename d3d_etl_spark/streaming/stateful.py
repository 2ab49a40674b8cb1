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

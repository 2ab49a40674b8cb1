"""Grouped finite-state-machine operator — Spark's sanctioned escape hatch
for genuinely sequential, non-relational logic (SURVEY.md §2.8 F1/F2: the
reference's base-state tracker columns.py:332-529 and pitcher-queue fill
names/names.py:40-97 are exactly this shape).

Pattern: `df.repartition(key).groupBy(key).applyInPandas(fsm, schema)` —
per-group state never crosses groups, so the operator parallelizes
perfectly: N games/users = N independent FSM runs distributed across the
cluster, Arrow-batched in and out. The FSM body is plain pandas/python,
ordered explicitly inside the worker (Spark group delivery is unordered).

`run_grouped_fsm` is the generic harness; `funnel_fsm` is the engine's
demonstration instance (a conversion-funnel tracker with resets — state that
windows cannot express without quadratic tricks).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def run_grouped_fsm(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    fsm: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Apply an ordered per-group FSM.

    `fsm` receives one group's rows ALREADY SORTED by `order_cols` and
    returns the output rows for that group.
    """

    def runner(pdf: pd.DataFrame) -> pd.DataFrame:
        return fsm(pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True))

    return df.groupBy(*key_cols).applyInPandas(runner, schema)


FUNNEL_SCHEMA = "user_id long, n_funnels long, n_abandoned long, final_state long"

_FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_fsm(group: pd.DataFrame) -> pd.DataFrame:
    """Conversion-funnel FSM per user: view -> click -> purchase completes a
    funnel and resets; a new 'view' mid-funnel restarts it (abandonment).
    Genuinely order-sensitive state — the relational-inexpressible shape.
    """
    state = 0
    n_funnels = 0
    n_abandoned = 0
    for et in group["event_type"]:
        if et == _FUNNEL_STEPS[0]:
            if state > 0:
                n_abandoned += 1
            state = 1
        elif et == _FUNNEL_STEPS[1]:
            if state == 1:
                state = 2
        elif et == _FUNNEL_STEPS[2]:
            if state == 2:
                n_funnels += 1
                state = 0
    return pd.DataFrame(
        {
            "user_id": [int(group["user_id"].iloc[0])],
            "n_funnels": [n_funnels],
            "n_abandoned": [n_abandoned],
            "final_state": [state],
        }
    )


def funnel_reference(rows: Iterable[tuple[int, str]]) -> dict[int, tuple[int, int, int]]:
    """Pure-python oracle for tests: {user: (funnels, abandoned, state)} from
    (user_id, event_type) rows already in order."""
    out: dict[int, list[int]] = {}
    for uid, et in rows:
        st = out.setdefault(uid, [0, 0, 0])
        if et == "view":
            if st[2] > 0:
                st[1] += 1
            st[2] = 1
        elif et == "click":
            if st[2] == 1:
                st[2] = 2
        elif et == "purchase":
            if st[2] == 2:
                st[0] += 1
                st[2] = 0
    return {u: (v[0], v[1], v[2]) for u, v in out.items()}

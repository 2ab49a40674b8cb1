"""Plan inspection: assert the physical properties the engine promises.

"Would this plan survive a 100x scale-up?" is checkable: filters reached the
scan, dimensions broadcast, no unexpected shuffle count. These helpers parse
`.explain("formatted")` output so tests (tests/test_plans.py) can pin the
plan shape of headline queries — a regression here is a performance bug even
when results stay correct.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    text: str
    n_exchanges: int          # shuffle exchanges (not broadcast)
    n_broadcast_joins: int
    n_sortmerge_joins: int
    pushed_filters: list[str]
    read_schemas: list[str]

    def scan_reads_only(self, *cols: str) -> bool:
        """True if every parquet scan projects a subset of `cols`."""
        allowed = set(cols)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= allowed:
                return False
        return True


def summarize_plan(df: DataFrame) -> PlanSummary:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # count numbered operator headers only — the formatted output repeats
    # every operator once in the tree sketch and once in the details section
    return PlanSummary(
        text=text,
        n_exchanges=len(re.findall(r"\n\(\d+\) Exchange\b", text)),
        n_broadcast_joins=len(re.findall(r"\n\(\d+\) BroadcastHashJoin\b", text)),
        n_sortmerge_joins=len(re.findall(r"\n\(\d+\) SortMergeJoin\b", text)),
        pushed_filters=re.findall(r"PushedFilters: \[(.*?)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<(.*?)>", text),
    )


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    s = summarize_plan(df)
    total_exchange = len(re.findall(r"\n\(\d+\) Exchange\b", s.text))
    return total_exchange


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    s = summarize_plan(df)
    return any(fragment in pf for pf in s.pushed_filters)


_PASS_THROUGH_OPS = {"Sort", "WindowGroupLimit", "InputAdapter", "WholeStageCodegen"}


def _op_name(line: str) -> str:
    body = line.lstrip(" :+-")
    body = re.sub(r"^\*?\(\d+\)\s*", "", body)  # codegen marker "*(3) "
    return body.split(" ", 1)[0].split(",", 1)[0]


def n_single_partition_windows(df: DataFrame) -> int:
    """Count Window operators fed by an `Exchange SinglePartition` — the
    move-every-row-to-one-task plan shape an unpartitioned window produces.
    A SinglePartition exchange under a global aggregate is fine (one row
    crosses it); under a Window it drags the whole input onto one task.
    Walks the physical-plan tree string: for each SinglePartition exchange,
    the nearest shallower ancestor (skipping Sort and codegen wrappers) is
    the consumer."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-*"))

    hits = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = indent(ln)
        for j in range(i - 1, -1, -1):
            if not lines[j].strip():
                continue
            if indent(lines[j]) >= d:
                continue
            name = _op_name(lines[j])
            if name in _PASS_THROUGH_OPS:
                d = indent(lines[j])
                continue
            if name.startswith("Window"):
                hits += 1
            break
    return hits

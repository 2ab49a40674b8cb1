"""Per-task maxima from the Spark UI REST API.

The scale doctrine's load-bearing numbers are PER-TASK maxima — input
bytes, shuffle-read bytes, peak execution memory — because they are what
a fixed-size executor must survive at any corpus size (wall clocks drift
with host contention; task maxima do not). stress_sf1.py established the
pattern; bench.py folds the same read into every per-query sample so
"is this plan scale-safe" is a data read, not a plan read.

All helpers degrade to empty/zero results when the UI is unreachable —
metrics are an observation, never a failure mode of the run itself.
"""

from __future__ import annotations

import json
import urllib.request


def rest_get(ui_port: int, path: str, timeout: int = 10):
    url = f"http://localhost:{ui_port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def app_id(ui_port: int) -> str | None:
    try:
        return rest_get(ui_port, "applications")[0]["id"]
    except Exception:
        return None


def completed_stages(ui_port: int, app: str) -> dict[tuple[int, int], dict]:
    try:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in rest_get(ui_port, f"applications/{app}/stages?status=COMPLETE")
        }
    except Exception:
        return {}


def task_maxima(ui_port: int, app: str, stages: dict) -> dict:
    """Max-over-tasks input bytes / shuffle-read bytes / peak exec memory
    across the given stages (taskSummary at quantile 1.0), plus the top-3
    stages by per-task peak memory for attribution."""
    mx = {"input_bytes": 0, "shuffle_read_bytes": 0, "peak_exec_mem": 0}
    by_mem: list[tuple[int, str]] = []
    for (sid, att), meta in stages.items():
        try:
            s = rest_get(
                ui_port,
                f"applications/{app}/stages/{sid}/{att}/taskSummary?quantiles=1.0",
            )
        except Exception:
            continue  # stage with no task summary (e.g. skipped)
        mx["input_bytes"] = max(
            mx["input_bytes"], int(s.get("inputMetrics", {}).get("bytesRead", [0])[-1])
        )
        mx["shuffle_read_bytes"] = max(
            mx["shuffle_read_bytes"],
            int(s.get("shuffleReadMetrics", {}).get("readBytes", [0])[-1]),
        )
        peak = int(s.get("peakExecutionMemory", [0])[-1])
        mx["peak_exec_mem"] = max(mx["peak_exec_mem"], peak)
        by_mem.append((peak, f"s{sid} {meta.get('name', '?')[:80]}"))
    mx["top_mem_stages"] = [
        {"peak_mb": round(p / 2**20, 1), "stage": n}
        for p, n in sorted(by_mem, reverse=True)[:3]
    ]
    return mx

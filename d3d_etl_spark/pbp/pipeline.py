"""The full analytics DAG (SURVEY.md §3.1, reference processors/run_all.py:
84-154) as ONE Spark job graph.

The reference chains subprocesses with CSV files between stages; here every
arrow is a DataFrame hand-off inside one session, with the two reused
intermediates (`parsed`, `with_metrics` — each consumed by 3+ downstream
stages) cached, mirroring the reference's materialization points
(parsed_pbp / pbp_with_metrics, SURVEY.md §3.1). Pass `checkpoint_dir` to
persist them as parquet instead (the debugging/restart surface at scale).

    raw pbp ─ parse ─┬─ expected-runs (long + wide matrix)
                     ├─ linear weights ──┐
                     ├─ RE24 metrics ────┼─ guts constants
                     │    └ win prob (optional WE/LI) ─ clutch board
                     ├─ batting / situational boards
                     └─ (+ lineups) pitcher fill ─ pitching board
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from d3d_etl_spark.pbp.guts import guts_constants
from d3d_etl_spark.pbp.leaderboards import (
    baserunning_board,
    batted_ball_board,
    batting_board,
    clutch_board,
    pitching_board,
    situational_board,
)
from d3d_etl_spark.pbp.metrics import add_re24, expected_runs_long, linear_weights
from d3d_etl_spark.pbp.parser import expected_runs_matrix, parse_pbp
from d3d_etl_spark.pbp.pitchers import fill_pitchers
from d3d_etl_spark.pbp.win_prob import add_win_probability


@dataclass
class AnalyticsOutputs:
    parsed: DataFrame
    er_matrix: DataFrame
    linear_weights: DataFrame
    with_metrics: DataFrame
    guts: DataFrame
    batting: DataFrame
    situational: DataFrame
    batted_ball: DataFrame
    baserunning: DataFrame
    clutch: DataFrame | None
    pitching: DataFrame | None


def run_analytics(
    raw_pbp: DataFrame,
    pitching_lineups: DataFrame | None = None,
    win_expectancy: DataFrame | None = None,
    leverage_index: DataFrame | None = None,
    lg_obp: float = 0.360,
    checkpoint_dir: str | None = None,
) -> AnalyticsOutputs:
    """raw narration -> every derived table, one job graph."""

    def _materialize(df: DataFrame, name: str) -> DataFrame:
        if checkpoint_dir:
            path = os.path.join(checkpoint_dir, name)
            df.write.mode("overwrite").parquet(path)
            return df.sparkSession.read.parquet(path)
        # localCheckpoint, not cache(): cache is lazy, so the eager broadcast
        # subtrees downstream (ER lookup, linear weights, guts) re-derive the
        # whole parse — FSM included — before the main job ever populates the
        # cache. The eager barrier computes the spine exactly once
        # (measured ~40% off the full DAG at sf0.1).
        return df.localCheckpoint()

    parsed = _materialize(parse_pbp(raw_pbp), "parsed_pbp")
    er_long = expected_runs_long(parsed)
    er_wide = expected_runs_matrix(parsed)
    with_metrics = add_re24(parsed, er_long)
    if win_expectancy is not None and leverage_index is not None:
        with_metrics = add_win_probability(with_metrics, win_expectancy, leverage_index)
    with_metrics = _materialize(with_metrics, "pbp_with_metrics")
    lw = linear_weights(with_metrics, lg_obp)
    guts = guts_constants(with_metrics, lw, lg_obp)
    batting = batting_board(with_metrics)
    situational = situational_board(with_metrics)
    batted_ball = batted_ball_board(with_metrics)
    baserunning = baserunning_board(with_metrics)
    clutch = (
        clutch_board(with_metrics)
        if win_expectancy is not None and leverage_index is not None
        else None
    )
    pitching = None
    if pitching_lineups is not None:
        filled = with_metrics.join(
            fill_pitchers(with_metrics, pitching_lineups), ["contest_id", "play_id"]
        )
        pitching = pitching_board(filled)
    return AnalyticsOutputs(
        parsed=parsed,
        er_matrix=er_wide,
        linear_weights=lw,
        with_metrics=with_metrics,
        guts=guts,
        batting=batting,
        situational=situational,
        batted_ball=batted_ball,
        baserunning=baserunning,
        clutch=clutch,
        pitching=pitching,
    )

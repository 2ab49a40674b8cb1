"""Partition-invariance pins for the round-9 exact-aggregation work.

The round's doctrine claim: after the last raw-double sums became
1e-9-scaled-long aggregates (batting_board.re24_total,
linear_weights' per-event mean + woba_scale, guts_constants' woba_scale),
every published double is a fixed expression tree over exact integers —
so the SAME input under a DIFFERENT partitioning must produce BIT-IDENTICAL
results. A raw-double sum fails this (IEEE accumulation is
order-dependent); these tests pin the property the quantization bought,
which is also what lets the end-to-end pipelines hash against DuckDB
(z_pbp_dag / z_pbp_war) and what makes the published tables deterministic
across shuffle layouts at cluster scale.
"""

from __future__ import annotations

import pytest

from d3d_etl_spark.pbp.guts import guts_constants
from d3d_etl_spark.pbp.leaderboards import batting_board
from d3d_etl_spark.pbp.metrics import add_re24, expected_runs_long, linear_weights
from d3d_etl_spark.pbp.parser import parse_pbp


@pytest.fixture(scope="module")
def corpus_plays(spark, sf_dir):
    """A real multi-game corpus (not the 17-play fixture): enough rows per
    batter/event that a raw-double sum WOULD show order dependence."""
    from d3d_etl_spark.queries.domain import materialized_raw

    parsed = parse_pbp(materialized_raw(spark, sf_dir))
    return add_re24(parsed, expected_runs_long(parsed)).localCheckpoint()


def _hexmap(rows, keys, cols):
    """{key: (float64 bit patterns...)} — .hex() is exact, so equality here
    is bitwise equality, stricter than pytest.approx."""
    out = {}
    for r in rows:
        k = tuple(r[c] for c in keys)
        out[k] = tuple(
            float(r[c]).hex() if isinstance(r[c], float) else r[c] for c in cols
        )
    return out


def test_batting_board_re24_total_partition_invariant(corpus_plays):
    a = batting_board(corpus_plays).collect()
    b = batting_board(corpus_plays.repartition(7, "contest_id")).collect()
    c = batting_board(corpus_plays.coalesce(1)).collect()
    keys = ("division", "year", "batter_name")
    cols = ("pa", "re24_total", "ob_pct", "runs_driven")
    ha, hb, hc = (_hexmap(x, keys, cols) for x in (a, b, c))
    assert ha == hb == hc
    assert len(ha) > 50  # a real corpus, not a degenerate frame


def test_linear_weights_partition_invariant(corpus_plays):
    keys = ("division", "year", "events")
    cols = (
        "count",
        "linear_weights_above_average",
        "linear_weights_above_outs",
        "normalized_weight",
    )
    a = linear_weights(corpus_plays, lg_obp=0.360).collect()
    b = linear_weights(corpus_plays.repartition(11), lg_obp=0.360).collect()
    assert _hexmap(a, keys, cols) == _hexmap(b, keys, cols)


def test_guts_woba_scale_partition_invariant(corpus_plays):
    def run(df):
        lw = linear_weights(df, lg_obp=0.360)
        return guts_constants(df, lw).collect()

    keys = ("division", "year")
    cols = ("wbb", "whbp", "w1b", "w2b", "w3b", "whr", "woba_scale",
            "runs_cs", "runs_win")
    a = run(corpus_plays)
    b = run(corpus_plays.repartition(5, "batter_name"))
    assert _hexmap(a, keys, cols) == _hexmap(b, keys, cols)

"""RE24 + linear-weights derivation tests over the fixture game."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.metrics import add_re24, expected_runs_long, linear_weights
from d3d_etl_spark.pbp.parser import parse_pbp
from tests.test_pbp import _GAME


@pytest.fixture(scope="module")
def plays(spark):
    rows = [
        (2024, "ncaa_3", 100, inning,
         text if half == "T" else None,
         text if half == "B" else None,
         seq)
        for seq, (inning, half, text) in enumerate(_GAME)
    ]
    raw = spark.createDataFrame(
        rows,
        "year int, division string, contest_id long, inning int, "
        "away_text string, home_text string, source_seq long",
    )
    parsed = parse_pbp(raw)
    er = expected_runs_long(parsed)
    return add_re24(parsed, er)


def test_re24_telescopes_to_inning_runs(plays):
    """Within one half-inning, Σ re24 = total runs - RE(opening state):
    the RE terms telescope and the final state is worth 0."""
    rows = plays.orderBy("play_id").collect()
    halves: dict[tuple, list] = {}
    for r in rows:
        halves.setdefault((r["inning"], r["half"]), []).append(r)
    for plays_in_half in halves.values():
        first = min(plays_in_half, key=lambda r: r["play_id"])
        total_runs = sum(r["runs_on_play"] for r in plays_in_half)
        s = sum(r["re24"] for r in plays_in_half)
        assert s == pytest.approx(total_runs - first["re_before"], abs=1e-9)


def test_re24_end_of_inning_rewrite(plays):
    enders = plays.where(F.col("outs_after") >= 3).collect()
    assert len(enders) > 0
    for r in enders:
        assert r["re_after"] == 0.0


def test_linear_weights_shape_and_order(plays):
    lw = linear_weights(plays, lg_obp=0.360).collect()
    by_event = {r["events"]: r for r in lw}
    assert "single" in by_event and "out" in by_event
    # hits are worth more than outs, and weight ordering is sane
    assert by_event["out"]["linear_weights_above_outs"] == pytest.approx(0.0)
    if "home_run" in by_event and "single" in by_event:
        assert (
            by_event["home_run"]["linear_weights_above_average"]
            > by_event["single"]["linear_weights_above_average"]
        )
    # normalized weights: reaching events scaled, outs zero
    assert by_event["out"]["normalized_weight"] == 0.0
    for ev, r in by_event.items():
        if ev != "out":
            assert r["normalized_weight"] != 0.0

"""Win-probability layer tests: synthetic WE/LI lookup (full cross-product,
FIXTURES.md §11) + the fixture game; checks the end-of-play key rewrite,
batter-signed WPA, and score accumulation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.parser import parse_pbp
from d3d_etl_spark.pbp.win_prob import add_win_probability
from tests.test_pbp import _GAME

_CODES = ["NNN", "YNN", "NYN", "YYN", "NNY", "YNY", "NYY", "YYY"]


def _we(inning: int, half: str, runners: str, outs: int, diff: int) -> float:
    """Deterministic synthetic win expectancy: logistic in score diff with a
    small base-state/outs/inning adjustment. Shape only — tests exercise the
    joins and signs, not real baseball values."""
    runner_bonus = 0.03 * runners.count("Y") * (1 if half == "Bottom" else -1)
    outs_penalty = 0.02 * outs * (-1 if half == "Bottom" else 1)
    x = 0.6 * diff + runner_bonus + outs_penalty + 0.01 * inning
    return 1.0 / (1.0 + math.exp(-x))


@pytest.fixture(scope="module")
def lookups(spark):
    rows = [
        (i, h, r, o, d, _we(i, h, r, o, d), 0.5 + 0.1 * r.count("Y") + 0.05 * o)
        for i in range(1, 10)
        for h in ("Top", "Bottom")
        for r in _CODES
        for o in range(3)
        for d in range(-10, 11)
    ]
    df = spark.createDataFrame(
        rows,
        "inning int, half string, runners string, outs int, score_diff int, "
        "win_expectancy double, leverage_index double",
    )
    we = df.select("inning", "half", "runners", "outs", "score_diff", "win_expectancy")
    li = df.select("inning", "half", "runners", "outs", "score_diff", "leverage_index")
    return we, li


@pytest.fixture(scope="module")
def with_wp(spark, lookups):
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
    we, li = lookups
    return add_win_probability(parse_pbp(raw), we, li).orderBy("play_id").collect()


def test_scores_accumulate(with_wp):
    by_id = {r["play_id"]: r for r in with_wp}
    # Top 1st scored 2 away runs (plays 3 and 5); Bottom 1st: 1 home run (HR)
    assert (by_id[7]["away_score_before"], by_id[7]["home_score_before"]) == (2, 0)
    assert (by_id[8]["away_score_before"], by_id[8]["home_score_before"]) == (2, 1)
    # Top 2nd: two more away runs on play 13
    assert by_id[14]["away_score_before"] == 4


def test_we_lookup_and_rewrite(with_wp):
    for r in with_wp:
        assert r["we_before"] is not None, f"missing WE before at play {r['play_id']}"
        assert r["we_after"] is not None, f"missing WE after at play {r['play_id']}"
        expected_before = _we(
            r["inning"], r["half"], r["bases_before"], r["outs_before"],
            max(-10, min(10, r["home_score_before"] - r["away_score_before"])),
        )
        assert r["we_before"] == pytest.approx(expected_before)
        if r["outs_after"] >= 3:
            # end-of-inning rewrite: successor state is the NEXT half-inning
            nxt_inning = r["inning"] + (0 if r["half"] == "Top" else 1)
            nxt_half = "Bottom" if r["half"] == "Top" else "Top"
            expected_after = _we(
                nxt_inning, nxt_half, "NNN", 0,
                max(-10, min(10, r["home_score_after"] - r["away_score_after"])),
            )
            assert r["we_after"] == pytest.approx(expected_after)


def test_wpa_signs(with_wp):
    for r in with_wp:
        delta_home = r["we_after"] - r["we_before"]
        want = delta_home if r["half"] == "Bottom" else -delta_home
        assert r["wpa"] == pytest.approx(want)
        assert r["li"] > 0 and r["wpa_li"] == pytest.approx(r["wpa"] / r["li"])


def test_tied_extra_innings_has_we_after(spark, lookups):
    """A 9th-inning 3rd out with the game TIED rolls to extras: no lookup
    row exists past inning 9 and neither decided-outcome branch applies —
    we_after must still be defined (0.5) so the play keeps its WPA."""
    we, li = lookups
    plays = spark.createDataFrame(
        [
            # tied after the play -> extras (the once-NULL branch)
            (9, "Bottom", "YNN", 1, 3, 3, 3, 3, 3),
            # home wins it -> decided branch, WE_after = 1
            (9, "Bottom", "YNN", 1, 3, 3, 4, 3, 3),
        ],
        "inning int, half string, bases_before string, outs_before int, "
        "outs_after int, home_score_before int, home_score_after int, "
        "away_score_before int, away_score_after int",
    ).withColumn("bases_after", F.lit("NNN"))
    out = add_win_probability(plays, we, li).orderBy("home_score_after").collect()
    tied, won = out
    assert tied["we_after"] == pytest.approx(0.5)
    assert tied["wpa"] is not None
    assert won["we_after"] == pytest.approx(1.0)

"""Golden tests for the 76-column pbp_with_metrics parity projection
(pbp/metrics_full.py) — declared schema, substitution extraction, runner
after-states, times_through_order, the _eff_inn WE-lookup rewrite, and
per-event wOBA weights, against hand-built fixtures."""

from __future__ import annotations

import pytest

from d3d_etl_spark.pbp.metrics import expected_runs_long, linear_weights, add_re24
from d3d_etl_spark.pbp.metrics_full import PBP_WITH_METRICS_SCHEMA, pbp_with_metrics
from d3d_etl_spark.pbp.parser import parse_pbp
from tests.test_win_prob import _we


# a short 2-inning game with a pitching substitution mid-way:
# home fields the Top half; queue [Jones, Smith] advances on the sub
_SUB_GAME = [
    (1, "T", "Able singled to left field"),
    (1, "T", "Smith to p for Jones"),
    (1, "T", "Baker flied out to cf"),
    (1, "T", "Cole grounded out to ss"),
    (1, "T", "Dean popped up to 2b"),
    (1, "B", "Early singled to right field"),
    (1, "B", "Fox flied out to cf"),
    (1, "B", "Gray grounded out to ss"),
    (1, "B", "Hill lined out to 3b"),
    (2, "T", "Able walked"),
    (2, "T", "Baker flied out to cf"),
    (2, "T", "Cole grounded out to ss"),
    (2, "T", "Dean popped up to 2b"),
    (2, "B", "Early homered, RBI"),
    (2, "B", "Fox flied out to cf"),
    (2, "B", "Gray grounded out to ss"),
    (2, "B", "Hill lined out to 3b"),
]


def _raw(spark, game, contest_id=900):
    rows = [
        (2024, "ncaa_3", contest_id, inning,
         text if half == "T" else None,
         text if half == "B" else None,
         seq)
        for seq, (inning, half, text) in enumerate(game)
    ]
    return spark.createDataFrame(
        rows,
        "year int, division string, contest_id long, inning int, "
        "away_text string, home_text string, source_seq long",
    )


@pytest.fixture(scope="module")
def lookups(spark):
    _CODES = ["NNN", "YNN", "NYN", "YYN", "NNY", "YNY", "NYY", "YYY"]
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
def full(spark, lookups):
    we, li = lookups
    raw = _raw(spark, _SUB_GAME)
    parsed = parse_pbp(raw).cache()
    er = expected_runs_long(parsed)
    lw = linear_weights(add_re24(parsed, er), lg_obp=0.360)
    lineups = spark.createDataFrame(
        [(900, "home", 0, "Jones"), (900, "home", 1, "Smith"),
         (900, "away", 0, "Axel"), (900, "away", 1, "Burt")],
        "contest_id long, side string, pitch_order int, player_name string",
    )
    df = pbp_with_metrics(
        parsed, er, win_expectancy=we, leverage_index=li,
        pitching_lineups=lineups, lw=lw,
    )
    return df.orderBy("play_id").collect(), df


def test_declared_schema_exact(full):
    _, df = full
    # names, order and types must match exactly; nullability flags are
    # Catalyst inference artifacts (a cast of a non-null expr loses the flag)
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in PBP_WITH_METRICS_SCHEMA.fields]
    assert got == want
    # the reference's keep_columns list is exactly 78 entries
    # (add_pbp_metrics.py:260-342)
    assert len(df.schema) == 78


def test_substitution_extraction_and_queue(full):
    rows, _ = full
    sub = [r for r in rows if r["sub_fl"] == 1]
    assert len(sub) == 1
    s = sub[0]
    assert (s["sub_in"], s["sub_out"], s["sub_pos"]) == ("Smith", "Jones", "p")
    assert s["pitcher_sub_fl"] == 1
    # queue advanced: Top-half plays before the sub see Jones, after see Smith
    top1 = [r for r in rows if r["half"] == "Top" and r["inning"] == 1]
    assert top1[0]["pitcher_name"] == "Jones"
    assert top1[-1]["pitcher_name"] == "Smith"
    # away pitcher (Bottom half) is the away starter throughout
    assert all(
        r["pitcher_name"] == "Axel" for r in rows if r["half"] == "Bottom"
    )


def test_runner_after_states(full):
    rows, _ = full
    by_id = {r["play_id"]: r for r in rows}
    for r in rows:
        nxt = by_id.get(r["play_id"] + 1)
        if nxt and (nxt["inning"], nxt["half"]) == (r["inning"], r["half"]):
            assert r["r1_after"] == nxt["r1_name"]
            assert r["r2_after"] == nxt["r2_name"]
            assert r["r3_after"] == nxt["r3_name"]
        else:
            assert r["r1_after"] is None and r["r2_after"] is None and r["r3_after"] is None


def test_times_through_order_cumcounts(full):
    rows, _ = full
    seen: dict[tuple, int] = {}
    for r in rows:  # ordered by play_id
        key = (r["contest_id"], r["pitcher_name"], r["batter_name"], r["bat_order"])
        seen[key] = seen.get(key, 0) + 1
        assert r["times_through_order"] == seen[key]


def test_eff_inn_we_lookup(full):
    rows, _ = full
    # 2-inning game: eff_inn = inning + (9 - 2) = inning + 7
    for r in rows:
        eff = min(r["inning"] + 7, 9)
        want = _we(
            eff, r["half"], r["bases_before"], r["outs_before"],
            max(-10, min(10, r["score_diff_before"])),
        )
        assert r["home_win_exp_before"] == pytest.approx(want), r["play_id"]
        assert r["high_leverage_fl"] == (r["li"] >= 2)
        assert r["low_leverage_fl"] == (r["li"] <= 0.85)


def test_woba_weights_by_event_class(full):
    rows, _ = full
    for r in rows:
        if r["event_type"] in ("1B", "2B", "3B", "HR", "BB", "HBP"):
            # non-null weight joined per event class (sign is a run-environment
            # property — meaningless on a 17-play fixture)
            assert r["woba"] is not None, r["event_type"]
        elif r["event_type"] in ("GO", "FO", "LO", "PO", "SO"):
            assert r["woba"] == 0.0


def test_ids_and_teams(full):
    rows, _ = full
    import hashlib

    for r in rows:
        if r["batter_name"]:
            want = hashlib.sha256(f"d3d:{r['batter_name']}".encode()).hexdigest()[:16]
            assert r["batter_id"] == want
        assert r["bat_team_id"] == (
            r["away_team_id"] if r["half"] == "Top" else r["home_team_id"]
        )
        assert r["pitch_team_id"] == (
            r["home_team_id"] if r["half"] == "Top" else r["away_team_id"]
        )

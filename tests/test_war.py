"""Guts + WAR chain tests: fixture plays -> linear weights -> guts ->
batting WAR -> SoS adjust -> team rollup, with the reference's key
invariant (SoS redistribution preserves division totals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.guts import guts_constants
from d3d_etl_spark.pbp.metrics import add_re24, expected_runs_long, linear_weights
from d3d_etl_spark.pbp.parser import parse_pbp
from d3d_etl_spark.pbp.war import batting_war, sos_adjust, team_war
from tests.test_pbp import _GAME


@pytest.fixture(scope="module")
def guts(spark):
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
    plays = add_re24(parsed, expected_runs_long(parsed))
    lw = linear_weights(plays, lg_obp=0.360)
    return guts_constants(plays, lw)


@pytest.fixture(scope="module")
def std_guts(spark):
    """Realistic league constants (the fixture game is too small to derive
    non-degenerate weights — 17 plays; the derivation itself is covered by
    test_guts_row)."""
    return spark.createDataFrame(
        [("ncaa_3", 2024, 0.69, 0.72, 0.88, 1.24, 1.56, 1.95, 0.360, 1.15,
          0.2, -0.41, 0.3, 0.12, 0.16, 10.0, 3.1)],
        "division string, year int, wbb double, whbp double, w1b double, "
        "w2b double, w3b double, whr double, woba double, woba_scale double, "
        "runs_sb double, runs_cs double, cs_rate double, runs_pa double, "
        "runs_out double, runs_win double, cfip double",
    )


@pytest.fixture(scope="module")
def cube(spark):
    # two teams, four players (FIXTURES.md §3 core columns)
    rows = [
        ("p1", "Ace Hitter", "t1", "conf-a", "ncaa_3", 2024, 200, 70, 15, 2, 10, 30, 2, 5, 40, 3, 1, 8, 2),
        ("p2", "Avg Bat", "t1", "conf-a", "ncaa_3", 2024, 180, 45, 8, 1, 3, 15, 0, 2, 50, 2, 1, 2, 1),
        ("p3", "Slow Start", "t2", "conf-a", "ncaa_3", 2024, 150, 30, 5, 0, 1, 10, 0, 1, 55, 1, 0, 1, 3),
        ("p4", "Speedy", "t2", "conf-a", "ncaa_3", 2024, 120, 35, 4, 3, 0, 20, 1, 3, 25, 0, 2, 15, 2),
    ]
    return spark.createDataFrame(
        rows,
        "player_id string, player_name string, team_id string, conference string, "
        "division string, year int, ab long, h long, double_ long, triple_ long, "
        "hr long, bb long, ibb long, hbp long, k long, sf long, sh long, sb long, cs long",
    )


def test_guts_row(guts):
    rows = guts.collect()
    assert len(rows) == 1
    g = rows[0]
    assert g["division"] == "ncaa_3" and g["year"] == 2024
    # weights ordered sanely: HR worth more than single; outs convert runs>0
    assert g["whr"] > g["w1b"] > 0
    assert g["runs_out"] > 0 and g["runs_win"] > 3.0
    assert 0.0 < g["runs_pa"] < 1.0
    assert g["runs_cs"] < 0


def test_batting_war_ordering(std_guts, cube):
    war = {r["player_id"]: r for r in batting_war(cube, std_guts).collect()}
    assert war["p1"]["woba"] > war["p3"]["woba"], "better hitter -> higher woba"
    assert war["p1"]["war_raw"] > war["p3"]["war_raw"]
    for r in war.values():
        assert r["pa"] > 0 and r["woba"] is not None


def test_sos_preserves_division_total(spark, std_guts, cube):
    rankings = spark.createDataFrame(
        [("t1", "ncaa_3", 2024, 5.2), ("t2", "ncaa_3", 2024, -3.1)],
        "team_id string, division string, year int, sos_val double",
    )
    raw = batting_war(cube, std_guts)
    adjusted = sos_adjust(raw, rankings)
    totals = adjusted.groupBy("division", "year").agg(
        F.sum("war_raw").alias("raw"), F.sum("war").alias("adj")
    ).first()
    # total preserved to the 1e-9 quantization of the scaled-long rescale
    # ratio (sos_adjust sums war as 1e9-scaled longs, never raw doubles)
    assert totals["adj"] == pytest.approx(totals["raw"], abs=1e-6)
    # the tilt moved individual players (t1 has higher SoS -> rewarded)
    per_team = {r["team_id"]: r for r in team_war(adjusted).collect()}
    raw_per_team = {
        r["team_id"]: r["s"] for r in
        raw.groupBy("team_id").agg(F.sum("war_raw").alias("s")).collect()
    }
    assert per_team["t1"]["war"] > raw_per_team["t1"]
    assert per_team["t2"]["war"] < raw_per_team["t2"]


def test_pitching_war(spark, std_guts):
    from d3d_etl_spark.pbp.war import pitching_war, sos_adjust, team_war

    cube_p = spark.createDataFrame(
        [
            # ace: 60 IP, few walks/homers, many Ks
            ("q1", "Ace Arm", "t1", "conf-a", "ncaa_3", 2024, "60.0", 20, 55, 18, 3, 4, 80),
            # struggler: 30.2 IP, lots of traffic
            ("q2", "Wild Thing", "t2", "conf-a", "ncaa_3", 2024, "30.2", 28, 45, 30, 7, 6, 15),
        ],
        "player_id string, player_name string, team_id string, conference string, "
        "division string, year int, ip string, er long, h long, bb long, "
        "hr_a long, hbp long, so long",
    )
    war = {r["player_id"]: r for r in pitching_war(cube_p, std_guts).collect()}
    assert war["q1"]["ip_thirds"] == 180
    assert war["q2"]["ip_thirds"] == 92        # 30.2 -> 30*3+2
    assert war["q1"]["fip"] < war["q2"]["fip"]
    assert war["q1"]["war_raw"] > war["q2"]["war_raw"]
    assert war["q1"]["era"] == pytest.approx(9 * 20 / 60.0)
    # SoS + rollup compose on the pitching table too
    rankings = spark.createDataFrame(
        [("t1", "ncaa_3", 2024, 1.0), ("t2", "ncaa_3", 2024, -1.0)],
        "team_id string, division string, year int, sos_val double",
    )
    adjusted = sos_adjust(
        pitching_war(cube_p, std_guts).withColumnRenamed("ip_thirds", "pa"), rankings
    )
    teams = team_war(adjusted.withColumn("wraa", F.lit(0.0)).withColumn("bsr", F.lit(0.0)))
    assert teams.count() == 2


def test_conference_rates(spark, std_guts, cube):
    from d3d_etl_spark.pbp.war import add_conference_rates, batting_war

    # move p3/p4 to a second conference
    cube2 = cube.withColumn(
        "conference",
        F.when(F.col("player_id").isin("p3", "p4"), "conf-b").otherwise(F.col("conference")),
    )
    rated = add_conference_rates(batting_war(cube2, std_guts)).collect()
    by_conf = {}
    for r in rated:
        by_conf.setdefault(r["conference"], set()).add(
            (r["conf_pa"], round(r["conf_war_per_600pa"], 9))
        )
    # every member of a conference sees the same stamped rate
    assert all(len(v) == 1 for v in by_conf.values())
    assert by_conf.keys() == {"conf-a", "conf-b"}


def test_park_adjustment(spark, std_guts, cube):
    from d3d_etl_spark.pbp.war import add_park_adjusted, batting_war

    pf = spark.createDataFrame(
        [("t1", 110.0)], "team_id string, pf double"   # t2 missing -> neutral
    )
    adj = {r["player_id"]: r for r in
           add_park_adjusted(batting_war(cube, std_guts), pf, std_guts).collect()}
    assert adj["p1"]["pf"] == 110.0 and adj["p3"]["pf"] == 100.0
    # hitter-friendly park deflates wRC+ relative to a neutral park
    neutral = {r["player_id"]: r for r in
               add_park_adjusted(
                   batting_war(cube, std_guts),
                   spark.createDataFrame([("t1", 100.0)], "team_id string, pf double"),
                   std_guts,
               ).collect()}
    assert adj["p1"]["wrc_plus"] < neutral["p1"]["wrc_plus"]
    assert adj["p1"]["wrc"] == pytest.approx(neutral["p1"]["wrc"])  # wrc itself unscaled


def test_normalize_division_war_reconciliation(spark, std_guts, cube):
    """The reference's end-to-end WAR invariant (get_war.py:186-188):
    after division normalization, Σ batting WAR + Σ pitching WAR equals
    the standings target wins - 0.294*games, split 60/40."""
    from d3d_etl_spark.pbp.war import (
        batting_war,
        normalize_division_war,
        pitching_war,
        sos_adjust,
    )

    rankings = spark.createDataFrame(
        [("t1", "ncaa_3", 2024, 2.0), ("t2", "ncaa_3", 2024, -2.0)],
        "team_id string, division string, year int, sos_val double",
    )
    cube_p = spark.createDataFrame(
        [("q1", "Ace Arm", "t1", "conf-a", "ncaa_3", 2024, "60.0", 20, 55, 18, 3, 4, 80),
         ("q2", "Wild Thing", "t2", "conf-a", "ncaa_3", 2024, "30.2", 28, 45, 30, 7, 6, 15)],
        "player_id string, player_name string, team_id string, conference string, "
        "division string, year int, ip string, er long, h long, bb long, "
        "hr_a long, hbp long, so long",
    )
    bat = sos_adjust(batting_war(cube, std_guts), rankings)
    pit = sos_adjust(
        pitching_war(cube_p, std_guts).withColumnRenamed("ip_thirds", "pa"), rankings
    )
    standings = spark.createDataFrame(
        [("ncaa_3", 2024, "t1", 30, 40), ("ncaa_3", 2024, "t2", 12, 40)],
        "division string, year int, team_id string, wins long, games long",
    )
    nb, np_ = normalize_division_war(bat, pit, standings)
    target = (30 + 12) - 0.294 * 80
    bt = nb.agg(F.sum("war")).first()[0]
    pt = np_.agg(F.sum("war")).first()[0]
    assert bt == pytest.approx(target * 0.6, abs=1e-6)
    assert pt == pytest.approx(target * 0.4, abs=1e-6)
    assert bt + pt == pytest.approx(target, abs=1e-6)


def test_guts_cfip_from_pitching_totals(spark, guts):
    """cFIP derives from league pitching totals when supplied (reference
    get_guts.py:103-117): lgERA - FIP components per IP."""
    from d3d_etl_spark.pbp.guts import guts_constants
    from d3d_etl_spark.pbp.metrics import add_re24, expected_runs_long, linear_weights
    from d3d_etl_spark.pbp.parser import parse_pbp

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
    plays = add_re24(parsed, expected_runs_long(parsed))
    lw = linear_weights(plays, lg_obp=0.360)
    cube_p = spark.createDataFrame(
        [("q1", "ncaa_3", 2024, "60.0", 20, 18, 3, 4, 80),
         ("q2", "ncaa_3", 2024, "30.0", 28, 30, 7, 6, 15)],
        "player_id string, division string, year int, ip string, er long, "
        "bb long, hr_a long, hbp long, so long",
    )
    g = guts_constants(plays, lw, cube_pitching=cube_p).first()
    ip = 90.0  # 60 + 30 innings
    lg_era = (20 + 28) * 9 / ip
    comp = (13 * (3 + 7) + 3 * ((18 + 30) + (4 + 6)) - 2 * (80 + 15)) / ip
    assert g["cfip"] == pytest.approx(round(lg_era - comp, 3))
    # and the default stands in without pitching totals
    assert guts.first()["cfip"] == pytest.approx(3.10)

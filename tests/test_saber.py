"""Sabermetric formula library tests — hand-computed fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.functions import saber


@pytest.fixture(scope="module")
def batter(spark):
    # ab,h,2b,3b,hr,bb,ibb,hbp,k,sf,sh
    return spark.createDataFrame(
        [(400, 120, 25, 3, 15, 50, 5, 8, 80, 4, 2)],
        "ab long, h long, double_ long, triple_ long, hr long, bb long, "
        "ibb long, hbp long, k long, sf long, sh long",
    )


def test_batting_rates(batter):
    row = batter.select(
        saber.batting_avg(F.col("h"), F.col("ab")).alias("avg"),
        saber.obp(F.col("h"), F.col("bb"), F.col("hbp"), F.col("ab"), F.col("sf")).alias("obp"),
        saber.slg(F.col("h"), F.col("double_"), F.col("triple_"), F.col("hr"), F.col("ab")).alias("slg"),
        saber.pa(F.col("ab"), F.col("bb"), F.col("hbp"), F.col("sf"), F.col("sh")).alias("pa"),
        saber.babip(F.col("h"), F.col("hr"), F.col("ab"), F.col("k"), F.col("sf")).alias("babip"),
    ).first()
    assert row["avg"] == pytest.approx(120 / 400)
    assert row["obp"] == pytest.approx((120 + 50 + 8) / (400 + 50 + 8 + 4))
    # tb = 77*1 + 25*2 + 3*3 + 15*4 = 196
    assert row["slg"] == pytest.approx(196 / 400)
    assert row["pa"] == 464
    assert row["babip"] == pytest.approx((120 - 15) / (400 - 80 - 15 + 4))


def test_woba_and_derivatives(batter):
    weights = {"wbb": 0.69, "whbp": 0.72, "w1b": 0.88, "w2b": 1.24, "w3b": 1.56, "whr": 1.95}
    row = batter.select(
        saber.woba(
            F.col("bb"), F.col("hbp"),
            saber.singles(F.col("h"), F.col("double_"), F.col("triple_"), F.col("hr")),
            F.col("double_"), F.col("triple_"), F.col("hr"),
            F.col("ab"), F.col("ibb"), F.col("sf"),
            *[F.lit(weights[w]) for w in ("wbb", "whbp", "w1b", "w2b", "w3b", "whr")],
        ).alias("woba")
    ).first()
    num = 0.69 * 45 + 0.72 * 8 + 0.88 * 77 + 1.24 * 25 + 1.56 * 3 + 1.95 * 15
    den = 400 + 50 - 5 + 4 + 8
    assert row["woba"] == pytest.approx(num / den)


def test_pitching_rates(spark):
    df = spark.createDataFrame(
        [(60, 200, 75, 180, 12, 6, 55)],
        "er long, ip_thirds long, bb long, so long, hr_a long, hbp long, h long",
    )
    row = df.select(
        saber.era(F.col("er"), F.col("ip_thirds")).alias("era"),
        saber.whip(F.col("bb"), F.col("h"), F.col("ip_thirds")).alias("whip"),
        saber.k9(F.col("so"), F.col("ip_thirds")).alias("k9"),
        saber.fip(F.col("hr_a"), F.col("bb"), F.col("hbp"), F.col("so"), F.col("ip_thirds"), F.lit(3.1)).alias("fip"),
    ).first()
    ip = 200 / 3
    assert row["era"] == pytest.approx(9 * 60 / ip)
    assert row["whip"] == pytest.approx((75 + 55) / ip)
    assert row["k9"] == pytest.approx(9 * 180 / ip)
    assert row["fip"] == pytest.approx((13 * 12 + 3 * (75 + 6) - 2 * 180) / ip + 3.1)


def test_zero_denominators(spark):
    df = spark.createDataFrame([(0, 0)], "h long, ab long")
    row = df.select(saber.batting_avg(F.col("h"), F.col("ab")).alias("avg")).first()
    assert row["avg"] == 0.0


def test_reference_parity_batting_additions(batter):
    """The round-2 formula breadth (reference batting.py:11-129) against
    hand-computed values on the standard batter fixture."""
    row = batter.select(
        saber.pa_ref(F.col("ab"), F.col("bb"), F.col("ibb"), F.col("hbp"), F.col("sf")).alias("pa_ref"),
        saber.obp_ref(F.col("h"), F.col("bb"), F.col("hbp"), F.col("ibb"), F.col("ab"), F.col("sf")).alias("obp_ref"),
        saber.walks_per_k(F.col("bb"), F.col("k")).alias("bbk"),
        saber.walk_pct(F.col("bb"), F.lit(464)).alias("bb_pct"),
        saber.strikeout_pct(F.col("k"), F.lit(464)).alias("k_pct"),
        saber.stolen_base_pct(F.lit(12), F.lit(4)).alias("sb_pct"),
        saber.runs_created(
            saber.tb(F.col("h"), F.col("double_"), F.col("triple_"), F.col("hr")),
            F.col("h"), F.col("bb"), F.col("ab"),
        ).alias("rc"),
        saber.ops_plus(F.lit(0.380), F.lit(0.490), F.lit(0.340), F.lit(0.420)).alias("ops_plus"),
    ).first()
    assert row["pa_ref"] == 400 + 50 + 5 + 8 + 4
    assert row["obp_ref"] == pytest.approx((120 + 50 + 8 + 5) / (400 + 50 + 5 + 8 + 4))
    assert row["bbk"] == pytest.approx(50 / 80)
    assert row["bb_pct"] == pytest.approx(50 / 464 * 100)
    assert row["k_pct"] == pytest.approx(80 / 464 * 100)
    assert row["sb_pct"] == pytest.approx(12 / 16 * 100)
    assert row["rc"] == pytest.approx(196 * (120 + 50) / (400 + 50))
    assert row["ops_plus"] == pytest.approx(100 * (0.380 / 0.340 + 0.490 / 0.420 - 1))


def test_wsb_chain(spark):
    """wSB (reference batting.py:102-115): league rate, opportunities
    clip, per-player run value — hand-computed on a 2-player league."""
    df = spark.createDataFrame(
        [("a", 10, 2, 60, 30, 5, 3), ("b", 0, 1, 2, 1, 0, 4)],
        "pid string, sb long, cs long, b1 long, bb long, hbp long, ibb long",
    )
    runs_out = 0.12
    run_cs = -(2 * 0.12 + 0.075)             # -0.315
    lg_opps = (60 + 30 + 5 - 3) + (2 + 1 + 0 - 4)  # 92 + (-1) = 91
    lg_rate = (10 * 0.2 + 3 * run_cs) / lg_opps
    out = {
        r["pid"]: r
        for r in df.select(
            "pid",
            saber.wsb(
                F.col("sb"), F.col("cs"),
                saber.wsb_opps(F.col("b1"), F.col("bb"), F.col("hbp"), F.col("ibb")),
                F.lit(lg_rate), F.lit(runs_out),
            ).alias("wsb"),
        ).collect()
    }
    # player b's raw opportunities are negative -> clipped to 0
    assert out["b"]["wsb"] == pytest.approx(0 * 0.2 + 1 * run_cs - lg_rate * 0)
    assert out["a"]["wsb"] == pytest.approx(10 * 0.2 + 2 * run_cs - lg_rate * 92)


def test_reference_parity_pitching_additions(spark):
    p = spark.createDataFrame(
        [(200, 18, 70, 25, 6, 450, 30, 10)],
        "ip_thirds long, hr long, so long, bb long, hbp long, bf long, gs long, app long",
    )
    row = p.select(
        saber.h9(F.lit(80), F.col("ip_thirds")).alias("h9"),
        saber.hr9(F.col("hr"), F.col("ip_thirds")).alias("hr9"),
        saber.k_pct(F.col("so"), F.col("bf")).alias("kp"),
        saber.bb_pct(F.col("bb"), F.col("bf")).alias("bbp"),
        saber.inherited_runners_scored_pct(F.lit(3), F.lit(9)).alias("irs"),
        saber.era_plus_parity(F.lit(4.5), F.lit(5.4), F.lit(110.0)).alias("erap"),
        saber.dynamic_rpw(F.lit(6.0), F.lit(5.8), F.lit(4.2)).alias("drpw"),
        saber.replacement_level(F.lit(10), F.lit(10)).alias("rep_starter"),
        saber.replacement_level(F.lit(0), F.lit(10)).alias("rep_reliever"),
        saber.pitching_war_wins(F.lit(0.9), F.lit(9.0), F.lit(0.12), F.lit(60.0)).alias("pwar"),
        saber.leverage_adjustment(F.lit(1.0), F.lit(1.4), F.lit(10), F.lit(4)).alias("lev"),
    ).first()
    assert row["h9"] == pytest.approx(80 * 9 / (200 / 3))
    assert row["hr9"] == pytest.approx(18 * 9 / (200 / 3))
    assert row["kp"] == pytest.approx(70 / 450 * 100)
    assert row["bbp"] == pytest.approx(25 / 450 * 100)
    assert row["irs"] == pytest.approx(3 / 9 * 100)
    assert row["erap"] == pytest.approx(100 * (2 - (4.5 / 5.4) * (100 / 110.0)))
    assert row["drpw"] == pytest.approx((((18 - 6.0) * 5.8 + 6.0 * 4.2) / 18 + 2) * 1.5)
    assert row["rep_starter"] == pytest.approx(0.12)
    assert row["rep_reliever"] == pytest.approx(0.03)
    assert row["pwar"] == pytest.approx((0.9 / 9.0 + 0.12) * (60.0 / 9))
    # relief share 0.6: multiplier = 0.6*(1+1.4)/2 + 0.4 = 1.12
    assert row["lev"] == pytest.approx(1.12)


def test_guts_builders(spark):
    g = spark.createDataFrame([(300, 40, 120, 25, 400, 1800)],
        "er long, hr long, bb long, hbp long, so long, ip_thirds long")
    row = g.select(
        saber.cfip(F.col("er"), F.col("hr"), F.col("bb"), F.col("hbp"),
                   F.col("so"), F.col("ip_thirds")).alias("cfip"),
        saber.run_cs(F.lit(0.11)).alias("rcs"),
        saber.runs_win_per_game(F.lit(11.0)).alias("rw"),
        saber.replacement_runs(F.lit(100), F.lit(1000), F.lit(10.0), F.lit(200.0), F.lit(10.0)).alias("rep"),
        saber.batting_runs(F.lit(5.0), F.lit(100), F.lit(110.0), F.lit(0.12), F.lit(0.13)).alias("bruns"),
        saber.wrc_plus_parity(F.lit(5.0), F.lit(100), F.lit(0.12), F.lit(0.11), F.lit(110.0)).alias("wrcp"),
    ).first()
    ip = 1800 / 3
    lg_era = 300 * 9 / ip
    comp = (13 * 40 + 3 * (120 + 25) - 2 * 400) / ip
    assert row["cfip"] == pytest.approx(lg_era - comp)
    assert row["rcs"] == pytest.approx(-(2 * 0.11 + 0.075))
    assert row["rw"] == pytest.approx(11.0 / 2 * 1.5 + 3)
    games_played = 200.0 * 2 / 10.0
    rep_const = (10.0 / 2) * games_played - 10.0 * games_played * 0.294
    assert row["rep"] == pytest.approx(rep_const * 10.0 * (100 / 1000))
    assert row["bruns"] == pytest.approx(5.0 + (0.12 - 1.1 * 0.12) * 100 + (0.12 - 0.13) * 100)
    assert row["wrcp"] == pytest.approx(((5.0 / 100 + 0.12) + (0.12 - 1.1 * 0.12)) / 0.11 * 100)

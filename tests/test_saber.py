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

"""WAR calculator (SURVEY.md §3.3, reference war_calculation/calculator.py).

The reference builds player WAR through ~10 sequential pandas left joins
plus league/conference transform-sums, an SoS reward/punish pass (z-score,
clip, rescale) and a division-level normalization. Spark-first:

- the join tree is broadcast left joins (every side table is player- or
  team-grain dims);
- league/conference rates are window aggregates (W12);
- SoS adjust = z-score from EXACT integer moments (operators.windows) so
  the pipeline stays deterministic, then the group rescale (W14) restores
  each group's pre-adjustment total — reference sos_utils.py:93-105;
- team rollup (A7) is one groupBy-sum.

batting_war here implements the core wRAA -> runs-above-replacement -> WAR
chain with guts constants; the full 30-column reference parity (park
factors, positional adjustments, clutch blending) layers onto the same
shape as additional broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from d3d_etl_spark.functions import saber
from d3d_etl_spark.functions.math import safe_div, zclip
from d3d_etl_spark.operators.windows import zscore_from_stats, zscore_stats

REPLACEMENT_RUNS_PER_PA = 0.033  # replacement offset (reference: runs/PA scaled)


def batting_war(cube_batting: DataFrame, guts: DataFrame) -> DataFrame:
    """Player-season batting WAR from counting stats + league constants.

    `cube_batting` columns follow FIXTURES.md §3 (ab,h,double_,triple_,hr,
    bb,ibb,hbp,k,sf,sh,...); `guts` is pbp/guts.guts_constants output.
    """
    b = cube_batting.join(F.broadcast(guts), ["division", "year"], "left")
    h1b = saber.singles(F.col("h"), F.col("double_"), F.col("triple_"), F.col("hr"))
    pa = saber.pa(F.col("ab"), F.col("bb"), F.col("hbp"), F.col("sf"), F.col("sh"))
    woba = saber.woba(
        F.col("bb"), F.col("hbp"), h1b, F.col("double_"), F.col("triple_"), F.col("hr"),
        F.col("ab"), F.col("ibb"), F.col("sf"),
        F.col("wbb"), F.col("whbp"), F.col("w1b"), F.col("w2b"), F.col("w3b"), F.col("whr"),
    )
    wraa = saber.wraa(woba, F.col("woba"), F.col("woba_scale"), pa)
    sb_runs = F.col("sb") * F.col("runs_sb") + F.col("cs") * F.col("runs_cs")
    rar = wraa + sb_runs + REPLACEMENT_RUNS_PER_PA * pa
    return b.select(
        "player_id", "player_name", "team_id", "conference", "division", "year",
        pa.alias("pa"),
        woba.alias("woba"),
        wraa.alias("wraa"),
        sb_runs.alias("bsr"),
        rar.alias("rar"),
        safe_div(rar, F.col("runs_win"), 0.0).alias("war_raw"),
    )


def sos_adjust(war_df: DataFrame, rankings: DataFrame) -> DataFrame:
    """Strength-of-schedule reward/punish (reference sos_utils.py:38-109):
    join team SoS, z-score it within (division, year) clipped to ±3, tilt
    each player's WAR by the z, then rescale so every (division, year)
    group's total WAR is unchanged (the adjustment redistributes, never
    creates, wins).

    Exactness: SoS z uses integer-moment stats over sos_val scaled 1e6;
    the rescale ratio is exact-sum/exact-sum of WAR scaled 1e9 to long
    (never-sum-raw-doubles, functions/money.py — the ratio is identical
    for any partitioning, so the rescaled WAR survives a value-hash).
    """
    ranked = war_df.join(
        F.broadcast(rankings.select("team_id", "division", "year", "sos_val")),
        ["team_id", "division", "year"],
        "left",
    )
    sos_i = F.round(F.coalesce(F.col("sos_val"), F.lit(0.0)) * 1_000_000).cast("long")
    s1, s2, n = zscore_stats(sos_i, ["division", "year"])
    z = zclip(zscore_from_stats(sos_i, s1, s2, n))
    # additive reward: a multiplicative tilt would invert for negative-WAR
    # players (the reference adds SoS runs, sos_utils.py:93-105)
    tilted = ranked.withColumn("_z", F.when(n >= 2, z).otherwise(F.lit(0.0))).withColumn(
        "war_tilted", F.col("war_raw") + 0.1 * F.col("_z")
    )
    w = Window.partitionBy("division", "year")
    raw_total = F.sum(F.round(F.col("war_raw") * 1_000_000_000).cast("long")).over(w)
    tilt_total = F.sum(F.round(F.col("war_tilted") * 1_000_000_000).cast("long")).over(w)
    return (
        tilted.withColumn(
            "war",
            F.when(
                tilt_total != 0,
                F.col("war_tilted")
                * (raw_total.cast("double") / tilt_total.cast("double")),
            ).otherwise(F.col("war_raw")),
        )
        .drop("_z", "war_tilted")
    )


def team_war(player_war: DataFrame) -> DataFrame:
    """A7 team rollup: sum the player table to team grain.

    Rate/win columns are doubles, so they aggregate as 1e-9-scaled longs
    and convert back once (never-sum-raw-doubles, functions/money.py)."""

    def _sum_exact(c: str) -> Column:
        return (
            F.sum(F.round(F.col(c) * 1_000_000_000).cast("long")).cast("double") / 1e9
        ).alias(c)

    return player_war.groupBy("team_id", "division", "year").agg(
        F.count("*").alias("n_players"),
        F.sum("pa").alias("pa"),
        _sum_exact("wraa"),
        _sum_exact("bsr"),
        _sum_exact("rar"),
        _sum_exact("war"),
    )


def pitching_war(cube_pitching: DataFrame, guts: DataFrame, lg_era: float = 5.5) -> DataFrame:
    """Player-season pitching WAR from counting stats + league constants
    (reference calculator.py:226-319): FIP-based runs allowed vs replacement
    over innings, converted to wins by runs_win.

    `cube_pitching` follows FIXTURES.md §4 (ip is the base-3 string codec
    "6.2"; decoded via functions.math.ip_to_thirds). cfip comes from guts.
    """
    from d3d_etl_spark.functions.math import ip_to_thirds

    p = cube_pitching.join(F.broadcast(guts), ["division", "year"], "left")
    thirds = ip_to_thirds(F.col("ip"))
    fip = saber.fip(
        F.col("hr_a"), F.col("bb"), F.col("hbp"), F.col("so"), thirds, F.col("cfip")
    )
    ip_f = thirds.cast("double") / 3.0
    # runs prevented vs a replacement-level FIP (lg ERA + ~1 run)
    replacement_fip = F.lit(lg_era + 1.0)
    rar = (replacement_fip - fip) / 9.0 * ip_f
    return p.select(
        "player_id", "player_name", "team_id", "conference", "division", "year",
        thirds.alias("ip_thirds"),
        fip.alias("fip"),
        saber.era(F.col("er"), thirds).alias("era"),
        saber.whip(F.col("bb"), F.col("h"), thirds).alias("whip"),
        saber.k9(F.col("so"), thirds).alias("k9"),
        rar.alias("rar"),
        safe_div(rar, F.col("runs_win"), 0.0).alias("war_raw"),
    )


def add_conference_rates(war_df: DataFrame) -> DataFrame:
    """W12 — conference-level rates stamped per player (reference
    calculator.py:171-174, :258-264 uses groupby(conference).transform('sum')
    for conference R/PA): window sums over (division, year, conference),
    no extra join or shuffle beyond the window exchange."""
    w = Window.partitionBy("division", "year", "conference")
    conf_pa = F.sum("pa").over(w)
    # scaled-long sum: partition-order independent (functions/money.py)
    conf_war = (
        F.sum(F.round(F.col("war_raw") * 1_000_000_000).cast("long")).over(w).cast("double")
        / 1e9
    )
    return war_df.withColumn(
        "conf_war_per_600pa",
        F.when(conf_pa > 0, conf_war / conf_pa * 600.0).otherwise(F.lit(0.0)),
    ).withColumn("conf_pa", conf_pa)


def add_park_adjusted(war_df: DataFrame, park_factors: DataFrame, guts: DataFrame) -> DataFrame:
    """J6 — park-factor dimension join + wRC+ (reference calculator.py:82
    dict-lookup pf per team; batting.py:115-125 wRC+ with pf-adjusted league
    rate). `park_factors`: (team_id, pf) ~100-centered; missing teams get a
    neutral 100."""
    with_pf = war_df.join(
        F.broadcast(park_factors.select("team_id", "pf")), "team_id", "left"
    ).withColumn("pf", F.coalesce("pf", F.lit(100.0)))
    with_guts = with_pf.join(
        F.broadcast(guts.select("division", "year", "runs_pa")), ["division", "year"], "left"
    )
    wrc = saber.wrc(F.col("wraa"), F.col("runs_pa"), F.col("pa"))
    return with_guts.withColumn("wrc", wrc).withColumn(
        "wrc_plus", saber.wrc_plus(wrc, F.col("pa"), F.col("runs_pa"), F.col("pf"))
    ).drop("runs_pa")


def normalize_division_war(
    bat_war: DataFrame,
    pitch_war: DataFrame,
    standings: DataFrame,
    pitcher_share: float = 0.40,
    rep_wp: float = 0.294,
) -> tuple[DataFrame, DataFrame]:
    """W14 division-level rescale (reference sos_utils.py:112-138): scale
    batting and pitching WAR so the division's total equals the standings
    target ``wins - 0.294 * games``, split `pitcher_share` to pitchers.

    `standings`: (division, year, wins, games) at team grain. Totals are
    scaled-long sums (never-sum-raw-doubles); the reconciliation invariant
    Σwar == target (get_war.py:186-188) is asserted by tests/test_war.py.
    """

    def _scaled(df: DataFrame, target_frac: float) -> DataFrame:
        totals = standings.groupBy("division", "year").agg(
            F.sum("wins").alias("_w"), F.sum("games").alias("_g")
        )
        war_total = (
            F.sum(F.round(F.col("war") * 1_000_000_000).cast("long"))
            .over(Window.partitionBy("division", "year"))
            .cast("double")
            / 1e9
        )
        target = (F.col("_w") - rep_wp * F.col("_g")) * target_frac
        # a (division, year) absent from standings must stay unscaled, not
        # go NULL — gate the rescale on the join actually landing
        return (
            df.join(F.broadcast(totals), ["division", "year"], "left")
            .withColumn(
                "war",
                F.when(
                    F.col("_w").isNotNull()
                    & F.col("_g").isNotNull()
                    & (F.abs(war_total) > 1e-12),
                    F.col("war") * (target / war_total),
                ).otherwise(F.col("war")),
            )
            .drop("_w", "_g")
        )

    return _scaled(bat_war, 1.0 - pitcher_share), _scaled(pitch_war, pitcher_share)

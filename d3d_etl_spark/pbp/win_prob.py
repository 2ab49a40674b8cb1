"""Win-probability metrics (SURVEY.md §2.3 J7, reference add_pbp_metrics.py
:93-200): WE/LI lookup joins keyed by (inning, half, runners, outs,
score_diff), the end-of-play key TRANSFORMATION (the next state a play hands
to the lookup: 3 outs roll the game to the next half-inning with bases
empty), and WPA = signed delta home win expectancy.

Both lookups are small static tables (9x2x8x3xscore_range) -> broadcast;
the play table never shuffles for them. Score diffs are clamped into the
lookup's range like the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.functions.math import clip

SCORE_DIFF_RANGE = 10  # lookup tables cover home-away in [-10, 10]


def _state_after(df: DataFrame) -> DataFrame:
    """Columns for the state a play transitions INTO (the J7 key rewrite):
    - 3rd out: next half-inning, bases empty, 0 outs (Top->Bottom same
      inning; Bottom->Top next inning)
    - otherwise: same half, updated bases/outs.
    Score after the play includes its runs on the batting side.
    """
    is_top = F.col("half") == "Top"
    third_out = F.col("outs_after") >= 3
    return (
        df.withColumn(
            "a_inning",
            F.when(third_out & ~is_top, F.col("inning") + 1).otherwise(F.col("inning")),
        )
        .withColumn(
            "a_half",
            F.when(third_out & is_top, F.lit("Bottom"))
            .when(third_out & ~is_top, F.lit("Top"))
            .otherwise(F.col("half")),
        )
        .withColumn(
            "a_runners", F.when(third_out, F.lit("NNN")).otherwise(F.col("bases_after"))
        )
        .withColumn("a_outs", F.when(third_out, F.lit(0)).otherwise(F.col("outs_after")))
    )


def add_win_probability(plays: DataFrame, win_exp: DataFrame, leverage: DataFrame) -> DataFrame:
    """Join WE before/after + LI before; derive wpa (batter-signed) and
    wpa_li (leverage-normalized), mirroring add_pbp_metrics.py:140-200.

    `plays` needs: inning, half, bases_before/after, outs_before/after,
    home_score_before/after, away_score_before/after (score columns in the
    engine come from the running-sum windows, W4).
    """
    diff_before = clip(
        F.col("home_score_before") - F.col("away_score_before"),
        -SCORE_DIFF_RANGE, SCORE_DIFF_RANGE,
    ).cast("int")
    diff_after = clip(
        F.col("home_score_after") - F.col("away_score_after"),
        -SCORE_DIFF_RANGE, SCORE_DIFF_RANGE,
    ).cast("int")

    we_b = win_exp.select(
        F.col("inning").alias("inning"),
        F.col("half").alias("half"),
        F.col("runners").alias("bases_before"),
        F.col("outs").alias("outs_before"),
        F.col("score_diff").alias("_diff_b"),
        F.col("win_expectancy").alias("we_before"),
    )
    we_a = win_exp.select(
        F.col("inning").alias("a_inning"),
        F.col("half").alias("a_half"),
        F.col("runners").alias("a_runners"),
        F.col("outs").alias("a_outs"),
        F.col("score_diff").alias("_diff_a"),
        F.col("win_expectancy").alias("we_after_raw"),
    )
    li = leverage.select(
        F.col("inning").alias("inning"),
        F.col("half").alias("half"),
        F.col("runners").alias("bases_before"),
        F.col("outs").alias("outs_before"),
        F.col("score_diff").alias("_diff_li"),
        F.col("leverage_index").alias("li"),
    )

    staged = _state_after(
        plays.withColumn("_diff_b", diff_before).withColumn("_diff_a", diff_after)
    )
    joined = (
        staged.join(
            F.broadcast(we_b),
            ["inning", "half", "bases_before", "outs_before", "_diff_b"],
            "left",
        )
        .join(
            F.broadcast(we_a),
            ["a_inning", "a_half", "a_runners", "a_outs", "_diff_a"],
            "left",
        )
        .join(
            F.broadcast(li.withColumnRenamed("_diff_li", "_diff_b")),
            ["inning", "half", "bases_before", "outs_before", "_diff_b"],
            "left",
        )
    )
    # game over (no successor state in the table): WE_after = 1 if home leads.
    # A game rolling to extra innings TIED has no decided outcome and no
    # table row (innings stop at 9) — it gets 0.5 (a table row, if one ever
    # exists, wins) so we_after/wpa never go NULL and the play still counts
    # in WPA sums (clutch_board filters wpa.isNotNull()).
    game_over = (F.col("a_inning") > 9) & (F.col("a_half") == "Top")
    we_after = F.when(
        game_over,
        F.when(F.col("_diff_a") > 0, F.lit(1.0))
        .when(F.col("_diff_a") < 0, F.lit(0.0))
        .otherwise(F.coalesce(F.col("we_after_raw"), F.lit(0.5))),
    ).otherwise(F.col("we_after_raw"))
    delta_home = we_after - F.col("we_before")
    batter_is_home = F.col("half") == "Bottom"
    return (
        joined.withColumn("we_after", we_after)
        .withColumn(
            "wpa", F.when(batter_is_home, delta_home).otherwise(-delta_home)
        )
        .withColumn(
            "wpa_li",
            F.when(F.col("li") > 0, F.col("wpa") / F.col("li")).otherwise(F.lit(0.0)),
        )
        .drop("we_after_raw", "_diff_b", "_diff_a", "a_inning", "a_half", "a_runners", "a_outs")
    )

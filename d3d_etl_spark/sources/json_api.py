"""Nested-JSON source flattening (SURVEY.md §2.1 S10/S11).

The reference fetches game JSON and flattens
``periods[].playbyplayStats[].plays[]`` by hand with nested Python loops
(collect_game.py:87-134), forward-filling the running score. Spark-first:
`from_json` with a declared schema, one `explode` per nesting level
(Catalyst turns these into Generate operators — no Python in the loop), and
the score forward-fill is a `last(ignorenulls)` window (W9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PLAY_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("side", StringType()),  # "away"/"home"
        StructField("score", StringType()),  # "3-2", may be null mid-sequence
    ]
)

GAME_JSON_SCHEMA = StructType(
    [
        StructField("contest_id", LongType()),
        StructField(
            "periods",
            ArrayType(
                StructType(
                    [
                        StructField("inning", IntegerType()),
                        StructField(
                            "playbyplayStats",
                            ArrayType(
                                StructType(
                                    [StructField("plays", ArrayType(PLAY_SCHEMA))]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def flatten_game_json(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """One JSON document per row -> one play per row, with running score
    forward-filled and a persisted `source_seq` total order.

    Triple explode mirrors periods[].playbyplayStats[].plays[]; the ordinal
    positions (posexplode) compose into the within-game sequence so every
    downstream window has a total order even though the source had none.
    """
    parsed = raw.select(F.from_json(F.col(json_col), GAME_JSON_SCHEMA).alias("g"))
    plays = (
        parsed.select("g.contest_id", F.posexplode("g.periods").alias("p_idx", "period"))
        .select(
            "contest_id",
            "p_idx",
            F.col("period.inning").alias("inning"),
            F.posexplode("period.playbyplayStats").alias("s_idx", "stanza"),
        )
        .select(
            "contest_id",
            "p_idx",
            "inning",
            "s_idx",
            F.posexplode("stanza.plays").alias("play_idx", "play"),
        )
        .select(
            "contest_id",
            "inning",
            (
                F.col("p_idx").cast("long") * 1_000_000
                + F.col("s_idx").cast("long") * 10_000
                + F.col("play_idx")
            ).alias("source_seq"),
            F.col("play.text").alias("play_text"),
            F.col("play.side").alias("side"),
            F.col("play.score").alias("score_raw"),
        )
    )
    w = Window.partitionBy("contest_id").orderBy("source_seq")
    ffilled = F.last("score_raw", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        plays.withColumn("score", F.coalesce(ffilled, F.lit("0-0")))
        .withColumn("away_score", F.split("score", "-").getItem(0).cast("int"))
        .withColumn("home_score", F.split("score", "-").getItem(1).cast("int"))
        .drop("score_raw", "score")
    )


BOXSCORE_JSON_SCHEMA = StructType(
    [
        StructField("contest_id", LongType()),
        StructField(
            "teamBoxscore",
            ArrayType(
                StructType(
                    [
                        StructField("team_id", LongType()),
                        StructField("side", StringType()),
                        StructField(
                            "playerStats",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("player_name", StringType()),
                                        StructField("position", StringType()),
                                        StructField("number", StringType()),
                                        StructField("bat_order", IntegerType()),
                                        StructField("ip", StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def flatten_boxscore_json(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """S11: boxscore lineups — ``teamBoxscore[].playerStats[]`` to one player
    row per (contest, team), with the within-lineup ordinal preserved (the
    pitcher-queue FSM consumes pitchers in this order) and an `is_pitcher`
    split mirroring the reference's batter/pitcher partition
    (collect_game.py:137-178)."""
    parsed = raw.select(F.from_json(F.col(json_col), BOXSCORE_JSON_SCHEMA).alias("b"))
    return (
        parsed.select("b.contest_id", F.explode("b.teamBoxscore").alias("tb"))
        .select(
            "contest_id",
            F.col("tb.team_id").alias("team_id"),
            F.col("tb.side").alias("side"),
            F.posexplode("tb.playerStats").alias("lineup_idx", "ps"),
        )
        .select(
            "contest_id",
            "team_id",
            "side",
            "lineup_idx",
            F.col("ps.player_name").alias("player_name"),
            F.col("ps.position").alias("position"),
            F.col("ps.number").alias("number"),
            F.col("ps.bat_order").alias("bat_order"),
            F.col("ps.ip").alias("ip"),
            (F.lower(F.col("ps.position")) == "p").alias("is_pitcher"),
        )
    )

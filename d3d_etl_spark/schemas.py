"""First-class StructType schemas for every engine table.

The reference is schema-on-read pandas CSV with inferred dtypes — its chief
fragility (SURVEY.md §1.2). This engine declares every table. Two families:

- the driver testdata star schema (parquet, schema embedded — listed here
  for documentation and validation), and
- the reference domain tables (FIXTURES.md §1-§14), declared for the
  baseball-pipeline stages: these are the ingest contracts the parser/WAR/
  leaderboard layers build against.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# --- reference domain tables (FIXTURES.md citations) ------------------------

# FIXTURES.md §1; scrapers/collect_game.py:14-26
PBP_RAW = StructType(
    [
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("contest_id", LongType()),
        _f("date", StringType()),
        _f("inning", IntegerType()),
        _f("home_team_id", StringType()),
        _f("away_team_id", StringType()),
        _f("home_text", StringType()),
        _f("away_text", StringType()),
        _f("home_score", IntegerType()),
        _f("away_score", IntegerType()),
        # persisted source ordering — gives every window a total order
        # (SURVEY.md §4: Spark sorts are not stable; the reference relied on
        # pandas stable sort)
        _f("source_seq", LongType(), nullable=False),
    ]
)

# FIXTURES.md §2; scrapers/collect_game.py:28-48
BATTING_LINEUPS = StructType(
    [
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("contest_id", LongType()),
        _f("team_id", StringType()),
        _f("player_name", StringType()),
        _f("position", StringType()),
        _f("number", IntegerType()),
        _f("is_sub", BooleanType()),
        _f("player_id", StringType()),
    ]
)

PITCHING_LINEUPS = StructType(
    [
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("contest_id", LongType()),
        _f("team_id", StringType()),
        _f("player_name", StringType()),
        _f("number", IntegerType()),
        _f("is_starter", BooleanType()),
        _f("is_reliever", BooleanType()),
        _f("player_id", StringType()),
        _f("pitch_order", IntegerType()),
    ]
)

# FIXTURES.md §6; consumed pbp_parser/main.py:110-115
TEAM_HISTORY = StructType(
    [
        _f("org_id", LongType()),
        _f("team_id", StringType()),
        _f("team_name", StringType()),
        _f("college_id", LongType()),
        _f("college_name", StringType()),
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("conference", StringType()),
    ]
)

# FIXTURES.md §13; get_er_matrix.py:104-121
EXPECTED_RUNS = StructType(
    [
        _f("division", StringType()),
        _f("year", IntegerType()),
        _f("bases", StringType()),  # 8 codes NNN..YYY
        _f("erv_0", DoubleType()),
        _f("erv_1", DoubleType()),
        _f("erv_2", DoubleType()),
        _f("prob_0", DoubleType()),
        _f("prob_1", DoubleType()),
        _f("prob_2", DoubleType()),
    ]
)

# FIXTURES.md §14; get_linear_weights.py:94-151
LINEAR_WEIGHTS = StructType(
    [
        _f("events", StringType()),
        _f("count", LongType()),
        _f("linear_weights_above_average", DoubleType()),
        _f("linear_weights_above_outs", DoubleType()),
        _f("normalized_weight", DoubleType()),
        _f("division", StringType()),
        _f("year", IntegerType()),
    ]
)

# FIXTURES.md §12; get_guts.py:120-137, validated GutsConstants models.py:43-67
GUTS_CONSTANTS = StructType(
    [
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("wbb", DoubleType()),
        _f("whbp", DoubleType()),
        _f("w1b", DoubleType()),
        _f("w2b", DoubleType()),
        _f("w3b", DoubleType()),
        _f("whr", DoubleType()),
        _f("woba", DoubleType()),
        _f("woba_scale", DoubleType()),
        _f("runs_sb", DoubleType()),
        _f("runs_cs", DoubleType()),
        _f("cs_rate", DoubleType()),
        _f("runs_pa", DoubleType()),
        _f("runs_out", DoubleType()),
        _f("runs_win", DoubleType()),
        _f("cfip", DoubleType()),
    ]
)

# FIXTURES.md §11; consumed add_pbp_metrics.py:93-120
WIN_EXPECTANCY = StructType(
    [
        _f("inning", IntegerType()),
        _f("half", StringType()),
        _f("runners", StringType()),
        _f("outs", IntegerType()),
        _f("score_diff", IntegerType()),
        _f("win_expectancy", DoubleType()),
    ]
)

LEVERAGE_INDEX = StructType(
    [
        _f("inning", IntegerType()),
        _f("half", StringType()),
        _f("runners", StringType()),
        _f("outs", IntegerType()),
        _f("score_diff", IntegerType()),
        _f("leverage_index", DoubleType()),
    ]
)

# FIXTURES.md §8; scrapers/collect_schedules.py:31-47
SCHEDULES = StructType(
    [
        _f("year", IntegerType()),
        _f("division", StringType()),
        _f("contest_id", LongType()),
        _f("team_name", StringType()),
        _f("team_slug", StringType()),
        _f("opponent_team_name", StringType()),
        _f("opponent_team_slug", StringType()),
        _f("date", DateType()),
        _f("team_score", IntegerType()),
        _f("opponent_score", IntegerType()),
        _f("is_neutral_site", BooleanType()),
        _f("attendance", IntegerType()),
    ]
)

# --- driver testdata star schema (documentation; parquet embeds these) ------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType([_f("r_regionkey", IntegerType()), _f("r_name", StringType())]),
    "nation": StructType(
        [
            _f("n_nationkey", IntegerType()),
            _f("n_name", StringType()),
            _f("n_regionkey", IntegerType()),
        ]
    ),
    "events": StructType(
        [
            _f("event_id", LongType()),
            _f("ts", TimestampType()),
            _f("user_id", LongType()),
            _f("event_type", StringType()),
            _f("value", DoubleType()),
            _f("props", StringType()),
        ]
    ),
}

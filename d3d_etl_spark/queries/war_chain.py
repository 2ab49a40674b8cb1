"""The rest of the reference WAR surface as oracled queries: pitching WAR
(reference war_calculation/pitching.py:10-87, calculator.py:226-319), the
team rollup + SoS reward/punish + division normalization chain
(sos_utils.py:38-138, get_war.py:142-188), and the year-gated score-delta
run-counting mode (reference pbp_parser/main.py:57-89).

All three run the REAL engine operators (pbp/war.py, pbp/parser.py) over
the materialized parse; the oracles recompute the identical arithmetic in
SQL. Determinism: every aggregate of doubles goes through 1e9-scaled longs
(functions/money.py doctrine), every published double is a fixed expression
tree over exact integer sums, so the driver's value-hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.queries.domain import (
    _PA_EVENTS,
    _PARSED_GLOB,
    _SO_EVENTS,
    _WAR_CTES_CHAIN,
    _sql_in,
    _war_batting_full,
    materialized_parsed,
)
from d3d_etl_spark.functions.strings import sql_md5_int, sql_md5_int_seeded
from d3d_etl_spark.queries.registry import register

_SO_IN = _sql_in(_SO_EVENTS)
_PA_IN = _sql_in(_PA_EVENTS)
_LG_ERA = 5.5  # pitching_war default replacement anchor

# ---------------------------------------------------------------------------
# domain_war_pitching — FIP-based pitching WAR over per-pitcher counting
# stats derived from the plays (pitcher identity = the deterministic
# mid-game pitching change shared with domain_pitching_board). Exercises
# the base-3 IP codec (M4) in anger: counting emits the "6.2" string, the
# WAR chain decodes it back to exact thirds.
# ---------------------------------------------------------------------------

_PIT_CTES = f"""
pwp AS (
  SELECT *,
         'P' || (CASE WHEN inning <= 2 THEN '0' ELSE '1' END)
             || '_' || (CASE WHEN half = 'Top' THEN 'home' ELSE 'away' END)
             || '_' || CAST(contest_id AS VARCHAR) AS pitcher_name,
         'T_' || CAST(contest_id AS VARCHAR)
              || (CASE WHEN half = 'Top' THEN '_home' ELSE '_away' END) AS pitch_team_id
  FROM read_parquet('{_PARSED_GLOB}')
),
pcount AS (
  SELECT division, year, pitcher_name AS player_id,
         MIN(pitch_team_id) AS team_id,
         CAST(SUM(outs_on_play) AS BIGINT) AS thirds,
         CAST(SUM(runs_on_play) AS BIGINT) AS er,
         CAST(SUM(CASE WHEN event_type = 'HR' THEN 1 ELSE 0 END) AS BIGINT) AS hr_a,
         CAST(SUM(CASE WHEN event_type IN ('BB', 'IBB') THEN 1 ELSE 0 END) AS BIGINT) AS bb,
         CAST(SUM(CASE WHEN event_type = 'HBP' THEN 1 ELSE 0 END) AS BIGINT) AS hbp,
         CAST(SUM(CASE WHEN event_type IN {_SO_IN} THEN 1 ELSE 0 END) AS BIGINT) AS so,
         CAST(SUM(CASE WHEN event_type IN ('1B', '2B', '3B', 'HR') THEN 1 ELSE 0 END) AS BIGINT) AS h,
         CAST(SUM(CASE WHEN event_type IN {_PA_IN} THEN 1 ELSE 0 END) AS BIGINT) AS pa
  FROM pwp
  WHERE pitcher_name IS NOT NULL
  GROUP BY 1, 2, 3
),
pguts AS (
  SELECT division, year,
         ROUND(
           (CASE WHEN SUM(outs_on_play) != 0
                 THEN 27.0 * CAST(SUM(runs_on_play) AS DOUBLE) / CAST(SUM(outs_on_play) AS DOUBLE)
                 ELSE 0.0 END)
           - (CASE WHEN SUM(outs_on_play) != 0
                   THEN 3.0 * CAST(13 * SUM(CASE WHEN event_type = 'HR' THEN 1 ELSE 0 END)
                                   + 3 * (SUM(CASE WHEN event_type IN ('BB', 'IBB') THEN 1 ELSE 0 END)
                                          + SUM(CASE WHEN event_type = 'HBP' THEN 1 ELSE 0 END))
                                   - 2 * SUM(CASE WHEN event_type IN {_SO_IN} THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(SUM(outs_on_play) AS DOUBLE)
                   ELSE 0.0 END),
           3) AS cfip,
         9.0 * (CAST(SUM(runs_on_play) AS DOUBLE) * 3.0 / SUM(outs_on_play)) * 1.5 + 3.0 AS runs_win
  FROM read_parquet('{_PARSED_GLOB}')
  GROUP BY 1, 2
),
pitwar AS (
  SELECT c.player_id, c.player_id AS player_name, c.team_id,
         c.division AS conference, c.division, c.year,
         c.thirds AS ip_thirds, c.pa,
         (CASE WHEN c.thirds != 0
               THEN 3.0 * CAST(13 * c.hr_a + 3 * (c.bb + c.hbp) - 2 * c.so AS DOUBLE)
                    / CAST(c.thirds AS DOUBLE) ELSE 0.0 END) + g.cfip AS fip,
         CASE WHEN c.thirds != 0
              THEN 27.0 * CAST(c.er AS DOUBLE) / CAST(c.thirds AS DOUBLE) ELSE 0.0 END AS era,
         CASE WHEN c.thirds != 0
              THEN 3.0 * CAST(c.bb + c.h AS DOUBLE) / CAST(c.thirds AS DOUBLE) ELSE 0.0 END AS whip,
         CASE WHEN c.thirds != 0
              THEN 27.0 * CAST(c.so AS DOUBLE) / CAST(c.thirds AS DOUBLE) ELSE 0.0 END AS k9,
         ({_LG_ERA} + 1.0
          - ((CASE WHEN c.thirds != 0
                   THEN 3.0 * CAST(13 * c.hr_a + 3 * (c.bb + c.hbp) - 2 * c.so AS DOUBLE)
                        / CAST(c.thirds AS DOUBLE) ELSE 0.0 END) + g.cfip))
           / 9.0 * (CAST(c.thirds AS DOUBLE) / 3.0) AS rar,
         g.runs_win
  FROM pcount c
  JOIN pguts g ON c.division = g.division AND c.year = g.year
),
pitwar2 AS (
  SELECT *, CASE WHEN runs_win != 0 THEN rar / runs_win ELSE 0.0 END AS war_raw
  FROM pitwar
)"""

_PIT_ORACLE = f"""
WITH {_PIT_CTES}
SELECT player_id, player_name, team_id, conference, division, year,
       ip_thirds, fip, era, whip, k9, rar, war_raw
FROM pitwar2
"""


def _pitching_war_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pitcher counting stats -> cube_pitching shape (ip as the base-3
    string codec) -> the real pbp.war.pitching_war chain."""
    from d3d_etl_spark.functions.math import thirds_to_ip
    from d3d_etl_spark.pbp.events import PA_EVENTS, SO_EVENTS
    from d3d_etl_spark.pbp.war import pitching_war
    from d3d_etl_spark.queries.boards import _with_ids

    wp = _with_ids(materialized_parsed(spark, sf_dir))
    ev = F.col("event_type")
    n = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    cube = (
        wp.where(F.col("pitcher_name").isNotNull())
        .groupBy("division", "year", F.col("pitcher_name").alias("player_id"))
        .agg(
            F.min("pitch_team_id").alias("team_id"),
            F.sum("outs_on_play").alias("_thirds"),
            F.sum("runs_on_play").alias("er"),
            n(ev == "HR").alias("hr_a"),
            n(ev.isin("BB", "IBB")).alias("bb"),
            n(ev == "HBP").alias("hbp"),
            n(ev.isin(*SO_EVENTS)).alias("so"),
            n(ev.isin("1B", "2B", "3B", "HR")).alias("h"),
            n(ev.isin(*PA_EVENTS)).alias("pa"),
        )
        .withColumn("player_name", F.col("player_id"))
        .withColumn("conference", F.col("division"))
        # round-trip through the reference's "6.2" codec (M4)
        .withColumn("ip", thirds_to_ip(F.col("_thirds")))
    )
    cube = cube.localCheckpoint()  # consumed by the WAR chain AND the pa join-back
    guts = _pitching_guts(spark, sf_dir)
    return pitching_war(cube, guts, lg_era=_LG_ERA).join(
        cube.select("player_id", "division", "year", "pa"),
        ["player_id", "division", "year"],
    )


def _pitching_guts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """League cfip (rounded 3, reference get_guts.py:103-117) + runs_win
    from the play totals — the minimal guts slice pitching_war consumes."""
    from d3d_etl_spark.functions import saber
    from d3d_etl_spark.pbp.events import SO_EVENTS

    parsed = materialized_parsed(spark, sf_dir)
    ev = F.col("event_type")
    n = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    lg = parsed.groupBy("division", "year").agg(
        F.sum("outs_on_play").alias("_outs"),
        F.sum("runs_on_play").alias("_runs"),
        n(ev == "HR").alias("_hr"),
        n(ev.isin("BB", "IBB")).alias("_bb"),
        n(ev == "HBP").alias("_hbp"),
        n(ev.isin(*SO_EVENTS)).alias("_so"),
    )
    return lg.select(
        "division", "year",
        F.round(
            saber.cfip(
                F.col("_runs"), F.col("_hr"), F.col("_bb"), F.col("_hbp"),
                F.col("_so"), F.col("_outs"),
            ),
            3,
        ).alias("cfip"),
        (
            9.0 * (F.col("_runs").cast("double") * 3.0 / F.col("_outs")) * 1.5 + 3.0
        ).alias("runs_win"),
    )


# ---------------------------------------------------------------------------
# domain_war_team_sos — the full post-WAR chain at team grain: player WAR
# (both sides) -> SoS reward/punish (z-score of team SoS, clipped ±3,
# additive tilt, group-total-preserving rescale; reference
# sos_utils.py:38-109) -> team rollup (A7, common.py:39-48) -> division
# normalization to the standings target wins - 0.294*games with the 60/40
# batting/pitching split (sos_utils.py:112-138, get_war.py:186-188).
# Rankings and standings are md5-derived deterministic dims.
# ---------------------------------------------------------------------------


def _sos_chain_sql(src: str, frac: float, zero_wraa: bool) -> str:
    """SQL for: player WAR frame -> sos tilt -> team rollup -> normalize.
    Mirrors pbp/war.py sos_adjust + team_war + normalize_division_war
    expression-for-expression (1e9-scaled-long totals)."""
    wraa = "0.0 AS wraa, 0.0 AS bsr" if zero_wraa else "wraa, bsr"
    wraa_sum = (
        "0.0 AS wraa, 0.0 AS bsr"
        if zero_wraa
        else (
            "CAST(SUM(CAST(ROUND(wraa * 1000000000) AS BIGINT)) AS DOUBLE) / 1e9 AS wraa, "
            "CAST(SUM(CAST(ROUND(bsr * 1000000000) AS BIGINT)) AS DOUBLE) / 1e9 AS bsr"
        )
    )
    return f"""
{src}0 AS (
  SELECT s.*, COALESCE(r.sos_val, 0.0) AS sosv
  FROM {src} s
  LEFT JOIN rank r ON s.team_id = r.team_id AND s.division = r.division AND s.year = r.year
),
{src}1 AS (
  SELECT *,
         CAST(ROUND(sosv * 1000000) AS BIGINT) AS sos_i,
         SUM(CAST(ROUND(sosv * 1000000) AS BIGINT)) OVER (PARTITION BY division, year) AS s1,
         SUM(CAST(ROUND(sosv * 1000000) AS BIGINT) * CAST(ROUND(sosv * 1000000) AS BIGINT))
           OVER (PARTITION BY division, year) AS s2,
         COUNT(*) OVER (PARTITION BY division, year) AS n
  FROM {src}0
),
{src}2 AS (
  SELECT *,
         war_raw + 0.1 * (CASE WHEN n >= 2 THEN GREATEST(-3.0, LEAST(3.0,
           (CAST(sos_i AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
             / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))
         )) ELSE 0.0 END) AS war_tilted
  FROM {src}1
),
{src}3 AS (
  SELECT *,
         SUM(CAST(ROUND(war_raw * 1000000000) AS BIGINT)) OVER (PARTITION BY division, year) AS rawt,
         SUM(CAST(ROUND(war_tilted * 1000000000) AS BIGINT)) OVER (PARTITION BY division, year) AS tiltt
  FROM {src}2
),
{src}adj AS (
  SELECT *,
         CASE WHEN tiltt != 0
              THEN war_tilted * (CAST(rawt AS DOUBLE) / CAST(tiltt AS DOUBLE))
              ELSE war_raw END AS war
  FROM {src}3
),
{src}team AS (
  SELECT team_id, division, year,
         CAST(COUNT(*) AS BIGINT) AS n_players,
         CAST(SUM(pa) AS BIGINT) AS pa,
         {wraa_sum},
         CAST(SUM(CAST(ROUND(rar * 1000000000) AS BIGINT)) AS DOUBLE) / 1e9 AS rar,
         CAST(SUM(CAST(ROUND(war * 1000000000) AS BIGINT)) AS DOUBLE) / 1e9 AS war
  FROM {src}adj
  GROUP BY 1, 2, 3
),
{src}team2 AS (
  SELECT *,
         CAST(SUM(CAST(ROUND(war * 1000000000) AS BIGINT)) OVER (PARTITION BY division, year) AS DOUBLE)
           / 1e9 AS wartot
  FROM {src}team
),
{src}norm AS (
  SELECT b.team_id, b.division, b.year, b.n_players, b.pa, b.wraa, b.bsr, b.rar,
         -- CAST to DOUBLE before the decimal literals touch the BIGINTs:
         -- DuckDB evaluates DECIMAL * BIGINT exactly (0.294*2400 = 705.6),
         -- Spark in binary doubles (705.6000...01) — ULP drift that fails
         -- the value hash. Forcing DOUBLE mirrors Spark's IEEE tree.
         CASE WHEN s.w IS NOT NULL AND s.g IS NOT NULL AND ABS(b.wartot) > 1e-12
              THEN b.war * (((CAST(s.w AS DOUBLE) - 0.294 * CAST(s.g AS DOUBLE)) * {frac}) / b.wartot)
              ELSE b.war END AS war
  FROM {src}team2 b
  LEFT JOIN standtot s ON b.division = s.division AND b.year = s.year
)"""


_TEAM_SOS_ORACLE = f"""
WITH {_WAR_CTES_CHAIN},
{_PIT_CTES},
bat AS (
  SELECT division, year, team_id, pa, wraa, bsr, rar, war AS war_raw FROM batwar
),
pit AS (
  SELECT division, year, team_id, pa, rar, war_raw FROM pitwar2
),
allteams AS (
  SELECT DISTINCT team_id, division, year FROM (
    SELECT team_id, division, year FROM bat
    UNION ALL SELECT team_id, division, year FROM pit
  )
),
rank AS (
  SELECT team_id, division, year,
         CAST(('0x' || substr(md5(team_id), 1, 6))::BIGINT % 1000 AS DOUBLE) / 1000.0 - 0.5 AS sos_val
  FROM allteams
),
stand AS (
  SELECT team_id, division, year,
         ('0x' || substr(md5(team_id), 1, 4))::BIGINT % 21 + 10 AS wins,
         40 AS games
  FROM allteams
),
standtot AS (
  SELECT division, year, CAST(SUM(wins) AS BIGINT) AS w, CAST(SUM(games) AS BIGINT) AS g
  FROM stand GROUP BY 1, 2
),
{_sos_chain_sql("bat", 0.6, zero_wraa=False)},
{_sos_chain_sql("pit", 0.4, zero_wraa=True)}
SELECT 'batting' AS grain, division, year, team_id, n_players, pa, wraa, bsr, rar, war
FROM batnorm
UNION ALL
SELECT 'pitching' AS grain, division, year, team_id, n_players, pa, wraa, bsr, rar, war
FROM pitnorm
"""


@register("domain_war_team_sos", _TEAM_SOS_ORACLE, tags=("domain", "war"))
def domain_war_team_sos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL pbp.war chain: sos_adjust -> team_war ->
    normalize_division_war over both WAR sides, with md5-derived rankings
    (sos_val) and standings (wins, games)."""
    from d3d_etl_spark.pbp.war import normalize_division_war, sos_adjust, team_war

    # player-grain frames feed allteams AND the sos chain — materialize once
    bat = _war_batting_full(spark, sf_dir).withColumnRenamed("war", "war_raw").localCheckpoint()
    pit = (
        _pitching_war_df(spark, sf_dir)
        .select("division", "year", "team_id", "pa", "rar", "war_raw")
        .withColumn("wraa", F.lit(0.0))
        .withColumn("bsr", F.lit(0.0))
        .localCheckpoint()
    )
    allteams = (
        bat.select("team_id", "division", "year")
        .unionByName(pit.select("team_id", "division", "year"))
        .distinct()
    )
    h = lambda k: F.conv(F.substring(F.md5(F.col("team_id")), 1, k), 16, 10).cast("long")  # noqa: E731
    rankings = allteams.select(
        "team_id", "division", "year",
        ((h(6) % 1000).cast("double") / 1000.0 - 0.5).alias("sos_val"),
    )
    standings = allteams.select(
        "team_id", "division", "year",
        (h(4) % 21 + 10).alias("wins"),
        F.lit(40).alias("games"),
    )
    bat_adj = sos_adjust(bat, rankings)
    pit_adj = sos_adjust(pit, rankings)
    nb, np_ = normalize_division_war(
        team_war(bat_adj), team_war(pit_adj), standings, pitcher_share=0.40
    )
    cols = ["division", "year", "team_id", "n_players", "pa", "wraa", "bsr", "rar", "war"]
    return nb.select(F.lit("batting").alias("grain"), *cols).unionByName(
        np_.select(F.lit("pitching").alias("grain"), *cols)
    )


# ---------------------------------------------------------------------------
# domain_run_modes — the year-gated score-delta run-counting mode (reference
# pbp_parser/main.py:57-89: current-year feeds carry running scores, so runs
# are lagged score deltas clipped at 0 against scorer corrections) driven
# against a feed derived from the materialized plays, with a deterministic
# correction injected every 97th play so the clip path has real work.
# Published next to the narration-mode runs so the two modes' divergence is
# itself hash-checked.
# ---------------------------------------------------------------------------

_RUN_MODES_ORACLE = f"""
WITH feed AS (
  SELECT division, year, contest_id, play_id, half,
         runs_on_play AS runs_narration,
         CAST(away_score_after - (CASE WHEN play_id % 97 = 0 THEN 1 ELSE 0 END) AS VARCHAR) AS away_score,
         CAST(home_score_after - (CASE WHEN play_id % 97 = 0 THEN 1 ELSE 0 END) AS VARCHAR) AS home_score
  FROM read_parquet('{_PARSED_GLOB}')
),
lagged AS (
  SELECT *,
         COALESCE(TRY_CAST(away_score AS INTEGER), 0) AS a_after,
         COALESCE(TRY_CAST(home_score AS INTEGER), 0) AS h_after
  FROM feed
),
w AS (
  SELECT *,
         COALESCE(LAG(a_after) OVER (PARTITION BY contest_id ORDER BY play_id), 0) AS a_before,
         COALESCE(LAG(h_after) OVER (PARTITION BY contest_id ORDER BY play_id), 0) AS h_before
  FROM lagged
)
SELECT division, year, contest_id, play_id, runs_narration,
       CAST(CASE WHEN half = 'Top' THEN GREATEST(a_after - a_before, 0)
                 ELSE GREATEST(h_after - h_before, 0) END AS INTEGER) AS runs_delta,
       a_before AS away_score_before, a_after AS away_score_after,
       h_before AS home_score_before, h_after AS home_score_after
FROM w
"""


@register("domain_run_modes", _RUN_MODES_ORACLE, tags=("domain",))
def domain_run_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.pbp.parser import add_source_score_runs

    parsed = materialized_parsed(spark, sf_dir)
    fix = F.when(F.col("play_id") % 97 == 0, 1).otherwise(0)
    feed = parsed.select(
        "division", "year", "contest_id", "play_id", "half",
        F.col("runs_on_play").alias("runs_narration"),
        (F.col("away_score_after") - fix).cast("string").alias("away_score"),
        (F.col("home_score_after") - fix).cast("string").alias("home_score"),
    )
    out = add_source_score_runs(feed)
    return out.select(
        "division", "year", "contest_id", "play_id", "runs_narration",
        F.col("runs_on_play").alias("runs_delta"),
        F.col("away_score_before").cast("int").alias("away_score_before"),
        F.col("away_score_after").cast("int").alias("away_score_after"),
        F.col("home_score_before").cast("int").alias("home_score_before"),
        F.col("home_score_after").cast("int").alias("home_score_after"),
    )


# ---------------------------------------------------------------------------
# domain_war_players — batting WAR + pitching WAR as one tagged union
# (round-3 consolidation): batting arm = the full wOBA->wRAA->RAR->WAR
# chain (reference war_calculation/batting.py:363-418, calculator.py:
# 124-224); pitching arm = the FIP-based chain (pitching.py:10-87,
# calculator.py:226-319). Side-specific metric columns are NULL on the
# other arm; shared columns (pa, rar, war) align.
# ---------------------------------------------------------------------------

_WAR_PLAYERS_ORACLE = f"""
WITH {_WAR_CTES_CHAIN},
{_PIT_CTES}
SELECT 'batting' AS grain, division, year, batter_name AS player, team_id,
       pa, ab, sb, cs, woba, wraa,
       CAST(NULL AS BIGINT) AS ip_thirds, CAST(NULL AS DOUBLE) AS fip,
       CAST(NULL AS DOUBLE) AS era, CAST(NULL AS DOUBLE) AS whip,
       CAST(NULL AS DOUBLE) AS k9,
       rar, war
FROM batwar
UNION ALL
SELECT 'pitching', division, year, player_id, team_id,
       pa, NULL, NULL, NULL, NULL, NULL,
       ip_thirds, fip, era, whip, k9,
       rar, war_raw
FROM pitwar2
"""


@register("domain_war_players", _WAR_PLAYERS_ORACLE, tags=("domain", "war"))
def domain_war_players(spark: SparkSession, sf_dir: str) -> DataFrame:
    b_null = F.lit(None).cast("long")
    d_null = F.lit(None).cast("double")
    bat = _war_batting_full(spark, sf_dir).select(
        F.lit("batting").alias("grain"), "division", "year",
        F.col("batter_name").alias("player"), "team_id",
        F.col("pa").cast("long").alias("pa"),
        F.col("ab").cast("long").alias("ab"),
        F.col("sb").cast("long").alias("sb"),
        F.col("cs").cast("long").alias("cs"),
        "woba", "wraa",
        b_null.alias("ip_thirds"), d_null.alias("fip"), d_null.alias("era"),
        d_null.alias("whip"), d_null.alias("k9"),
        "rar", "war",
    )
    pit = _pitching_war_df(spark, sf_dir).select(
        F.lit("pitching").alias("grain"), "division", "year",
        F.col("player_id").alias("player"), "team_id",
        F.col("pa").cast("long").alias("pa"),
        b_null.alias("ab"), b_null.alias("sb"), b_null.alias("cs"),
        d_null.alias("woba"), d_null.alias("wraa"),
        F.col("ip_thirds").cast("long").alias("ip_thirds"),
        "fip", "era", "whip", "k9",
        "rar",
        F.col("war_raw").alias("war"),
    )
    return bat.unionByName(pit)


# ---------------------------------------------------------------------------
# z_war_park — the last two unoracled links of reference calculator.py as a
# tagged union over the REAL operators:
#   grain='park': add_park_adjusted (pbp/war.py:172; reference
#     calculator.py:82 park-factor dict lookup, get_war.py:118,
#     batting.py:115-125 wRC+) over the full batting-WAR chain, with an
#     md5-derived park-factor dim (pf in 90..110; ~1/4 of teams absent from
#     the dim to exercise the neutral-100 coalesce).
#   grain='conf': add_conference_rates (pbp/war.py:154; reference
#     calculator.py:171-174 groupby(conference).transform('sum')) over the
#     pitching-WAR chain with an md5-derived 3-way conference split.
# Every published double is a fixed expression tree over already-oracled
# inputs (wraa, war_raw, exact counting sums), so the value hash is stable.
# ---------------------------------------------------------------------------

_GUTS_RPA_CTE = f"""
rpa AS (
  SELECT division, year,
         CASE WHEN SUM(CASE WHEN event_type IN {_PA_IN} THEN 1 ELSE 0 END) != 0
              THEN CAST(SUM(runs_on_play) AS DOUBLE)
                   / SUM(CASE WHEN event_type IN {_PA_IN} THEN 1 ELSE 0 END)
              ELSE 0.0 END AS runs_pa
  FROM read_parquet('{_PARSED_GLOB}')
  GROUP BY 1, 2
)"""

_PARK_ORACLE = f"""
WITH {_WAR_CTES_CHAIN},
{_PIT_CTES},
{_GUTS_RPA_CTE},
pfdim AS (
  SELECT team_id,
         CAST(90 + {sql_md5_int("team_id")} % 21 AS DOUBLE) AS pf
  FROM (SELECT DISTINCT team_id FROM batwar)
  WHERE {sql_md5_int_seeded("team_id", 7)} % 4 != 0
),
parkbase AS (
  SELECT b.division, b.year, b.batter_name AS player, b.team_id,
         COALESCE(p.pf, 100.0) AS pf,
         b.wraa + g.runs_pa * b.pa AS wrc,
         g.runs_pa, b.pa
  FROM batwar b
  LEFT JOIN pfdim p ON b.team_id = p.team_id
  LEFT JOIN rpa g ON b.division = g.division AND b.year = g.year
),
park AS (
  SELECT division, year, player, team_id, pf, wrc,
         100.0 * (CASE WHEN (runs_pa * pf / 100.0) != 0
                       THEN (CASE WHEN CAST(pa AS DOUBLE) != 0
                                  THEN wrc / CAST(pa AS DOUBLE) ELSE 0.0 END)
                            / (runs_pa * pf / 100.0)
                       ELSE 0.0 END) AS wrc_plus
  FROM parkbase
),
confp AS (
  SELECT division, year, player_id AS player, team_id,
         'c' || CAST({sql_md5_int("team_id")} % 3 AS VARCHAR) AS conference,
         pa, war_raw
  FROM pitwar2
),
conf AS (
  SELECT division, year, player, team_id, conference,
         SUM(pa) OVER w AS conf_pa,
         CASE WHEN SUM(pa) OVER w > 0
              THEN (CAST(SUM(CAST(ROUND(war_raw * 1000000000) AS BIGINT)) OVER w AS DOUBLE) / 1e9)
                   / (SUM(pa) OVER w) * 600.0
              ELSE 0.0 END AS conf_rate
  FROM confp
  WINDOW w AS (PARTITION BY division, year, conference)
)
SELECT 'park' AS grain, division, year, player, team_id, pf, wrc, wrc_plus,
       CAST(NULL AS VARCHAR) AS conference, CAST(NULL AS BIGINT) AS conf_pa,
       CAST(NULL AS DOUBLE) AS conf_rate
FROM park
UNION ALL
SELECT 'conf', division, year, player, team_id,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       conference, conf_pa, conf_rate
FROM conf
"""


@register("z_war_park", _PARK_ORACLE, tags=("domain", "war"))
def z_war_park(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.functions.strings import md5_int, md5_int_seeded
    from d3d_etl_spark.pbp.events import PA_EVENTS
    from d3d_etl_spark.pbp.war import add_conference_rates, add_park_adjusted

    d_null = F.lit(None).cast("double")

    # league run environment (pbp/guts.py:96 runs_pa) straight off the plays
    parsed = materialized_parsed(spark, sf_dir)
    lg_pa = F.sum(F.when(F.col("event_type").isin(*PA_EVENTS), 1).otherwise(0))
    guts = parsed.groupBy("division", "year").agg(
        F.sum("runs_on_play").alias("lg_runs"), lg_pa.alias("lg_pa")
    ).select(
        "division", "year",
        F.when(
            F.col("lg_pa") != 0, F.col("lg_runs").cast("double") / F.col("lg_pa")
        ).otherwise(F.lit(0.0)).alias("runs_pa"),
    )

    bat = _war_batting_full(spark, sf_dir)
    pf_dim = (
        bat.select("team_id").distinct()
        .where(F.pmod(md5_int_seeded(F.col("team_id"), 7), F.lit(4)) != 0)
        .select(
            "team_id",
            (F.lit(90) + F.pmod(md5_int(F.col("team_id")), F.lit(21)))
            .cast("double").alias("pf"),
        )
    )
    park = add_park_adjusted(bat, pf_dim, guts).select(
        F.lit("park").alias("grain"), "division", "year",
        F.col("batter_name").alias("player"), "team_id",
        "pf", "wrc", "wrc_plus",
        F.lit(None).cast("string").alias("conference"),
        F.lit(None).cast("long").alias("conf_pa"),
        d_null.alias("conf_rate"),
    )

    pit = _pitching_war_df(spark, sf_dir).withColumn(
        "conference",
        F.concat(F.lit("c"), F.pmod(md5_int(F.col("team_id")), F.lit(3)).cast("string")),
    )
    conf = add_conference_rates(pit).select(
        F.lit("conf").alias("grain"), "division", "year",
        F.col("player_id").alias("player"), "team_id",
        d_null.alias("pf"), d_null.alias("wrc"), d_null.alias("wrc_plus"),
        "conference",
        F.col("conf_pa").cast("long").alias("conf_pa"),
        F.col("conf_war_per_600pa").alias("conf_rate"),
    )
    return park.unionByName(conf)

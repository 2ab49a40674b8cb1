"""domain_roster_cascade — the reference's map_ncaa_to_cube five-tier
roster reconciliation (jersey -> exact -> unique-last -> initial+last ->
fuzzy >= 0.7) as ONE `roster_cascade` configuration, oracled tier-by-tier.

Probes are part names deterministically shaped into the five match
classes by partkey mod 5 (jersey-only, exact, last-only, initial+last,
truncated), so every tier has real work; the DuckDB oracle recomputes the
full cascade including the block-level uniqueness rules and the
token-sorted Levenshtein top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.io import load_table
from d3d_etl_spark.operators.fuzzy_join import roster_cascade
from d3d_etl_spark.queries.registry import register

_CUTOFF = 0.7

_NORM = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


def _norm(x: str) -> str:
    return _NORM.format(x=x)


def _tsk(x: str) -> str:
    """token_sort_key: normalized, tokens sorted, space-joined."""
    return f"array_to_string(list_sort(string_split({_norm(x)}, ' ')), ' ')"


_ROSTER_ORACLE = f"""
WITH cand AS (
  SELECT p_partkey AS cand_id, p_brand, p_name AS cname,
         p_partkey % 100 AS cnum,
         {_norm("p_name")} AS cnorm
  FROM part
),
cfeat AS (
  SELECT *,
         string_split(cnorm, ' ')[len(string_split(cnorm, ' '))] AS clast,
         substr(cnorm, 1, 1) || ' ' ||
           string_split(cnorm, ' ')[len(string_split(cnorm, ' '))] AS cinitlast
  FROM cand
),
probes AS (
  SELECT p_partkey AS probe_id, p_brand,
         CASE p_partkey % 5
           WHEN 0 THEN 'unknown player'
           WHEN 1 THEN p_name
           WHEN 2 THEN string_split({_norm("p_name")}, ' ')[len(string_split({_norm("p_name")}, ' '))]
           WHEN 3 THEN substr({_norm("p_name")}, 1, 1) || ' ' ||
                       string_split({_norm("p_name")}, ' ')[len(string_split({_norm("p_name")}, ' '))]
           ELSE substr(p_name, 1, len(p_name) - 2)
         END AS pname,
         CASE WHEN p_partkey % 5 = 0 THEN CAST(p_partkey % 100 AS VARCHAR) END AS pnum
  FROM part
),
jersey AS (
  SELECT probe_id, matched_id, 'jersey' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY c.cand_id) AS rn
    FROM probes p
    JOIN cand c ON p.p_brand = c.p_brand
    WHERE regexp_extract(p.pnum, '^\\s*(\\d+)', 1) != ''
      AND CAST(regexp_extract(p.pnum, '^\\s*(\\d+)', 1) AS INTEGER) = c.cnum
  ) WHERE rn = 1
),
exact AS (
  SELECT probe_id, matched_id, 'exact' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY c.cand_id) AS rn
    FROM probes p
    JOIN cand c ON p.p_brand = c.p_brand
    WHERE trim(p.pname) = trim(c.cname)
      AND p.probe_id NOT IN (SELECT probe_id FROM jersey)
  ) WHERE rn = 1
),
uniq_last AS (
  SELECT p_brand, clast AS k, MIN(cand_id) AS matched_id
  FROM cfeat GROUP BY 1, 2 HAVING COUNT(*) = 1
),
last_t AS (
  SELECT p.probe_id, u.matched_id, 'last' AS tier
  FROM probes p
  JOIN uniq_last u
    ON p.p_brand = u.p_brand
   AND string_split({_norm("p.pname")}, ' ')[len(string_split({_norm("p.pname")}, ' '))] = u.k
  WHERE p.probe_id NOT IN (SELECT probe_id FROM jersey)
    AND p.probe_id NOT IN (SELECT probe_id FROM exact)
),
uniq_initlast AS (
  -- two-token guard (reference map_ncaa_to_cube: by_initlast only built
  -- for len(parts) >= 2; single-token probes skip tier 4)
  SELECT p_brand, cinitlast AS k, MIN(cand_id) AS matched_id
  FROM cfeat
  WHERE len(string_split(cnorm, ' ')) >= 2
  GROUP BY 1, 2 HAVING COUNT(*) = 1
),
initlast_t AS (
  SELECT p.probe_id, u.matched_id, 'initlast' AS tier
  FROM probes p
  JOIN uniq_initlast u
    ON p.p_brand = u.p_brand
   AND substr({_norm("p.pname")}, 1, 1) || ' ' ||
       string_split({_norm("p.pname")}, ' ')[len(string_split({_norm("p.pname")}, ' '))] = u.k
  WHERE p.probe_id NOT IN (SELECT probe_id FROM jersey)
    AND p.probe_id NOT IN (SELECT probe_id FROM exact)
    AND p.probe_id NOT IN (SELECT probe_id FROM last_t)
    AND len(string_split({_norm("p.pname")}, ' ')) >= 2
),
fuzzy AS (
  SELECT probe_id, matched_id, 'fuzzy' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           1.0 - CAST(levenshtein({_tsk("p.pname")}, {_tsk("c.cname")}) AS DOUBLE)
               / GREATEST(len({_tsk("p.pname")}), len({_tsk("c.cname")})) AS score,
           ROW_NUMBER() OVER (
             PARTITION BY p.probe_id
             ORDER BY 1.0 - CAST(levenshtein({_tsk("p.pname")}, {_tsk("c.cname")}) AS DOUBLE)
                      / GREATEST(len({_tsk("p.pname")}), len({_tsk("c.cname")})) DESC,
                      c.cand_id
           ) AS rn
    FROM probes p
    JOIN cand c ON p.p_brand = c.p_brand
    WHERE p.probe_id NOT IN (SELECT probe_id FROM jersey)
      AND p.probe_id NOT IN (SELECT probe_id FROM exact)
      AND p.probe_id NOT IN (SELECT probe_id FROM last_t)
      AND p.probe_id NOT IN (SELECT probe_id FROM initlast_t)
      AND 1.0 - CAST(levenshtein({_tsk("p.pname")}, {_tsk("c.cname")}) AS DOUBLE)
          / GREATEST(len({_tsk("p.pname")}), len({_tsk("c.cname")})) >= {_CUTOFF}
  ) WHERE rn = 1
)
SELECT * FROM jersey
UNION ALL SELECT * FROM exact
UNION ALL SELECT * FROM last_t
UNION ALL SELECT * FROM initlast_t
UNION ALL SELECT * FROM fuzzy
"""


@register("domain_roster_cascade", _ROSTER_ORACLE, tags=("domain", "fuzzy", "join"))
def domain_roster_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.functions.strings import normalize_name

    part = load_table(spark, sf_dir, "part")
    cands = part.select(
        F.col("p_partkey").alias("cand_id"),
        "p_brand",
        F.col("p_name").alias("cname"),
        (F.col("p_partkey") % 100).cast("string").alias("cnum"),
    )
    norm = normalize_name(F.col("p_name"))
    last = F.substring_index(norm, " ", -1)
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        "p_brand",
        F.when(F.col("p_partkey") % 5 == 0, F.lit("unknown player"))
        .when(F.col("p_partkey") % 5 == 1, F.col("p_name"))
        .when(F.col("p_partkey") % 5 == 2, last)
        .when(
            F.col("p_partkey") % 5 == 3,
            F.concat(F.substring(norm, 1, 1), F.lit(" "), last),
        )
        .otherwise(F.expr("substr(p_name, 1, length(p_name) - 2)"))
        .alias("pname"),
        F.when(
            F.col("p_partkey") % 5 == 0, (F.col("p_partkey") % 100).cast("string")
        ).alias("pnum"),
    )
    return roster_cascade(
        probes, cands,
        block_keys=["p_brand"],
        probe_id="probe_id", probe_name="pname",
        cand_id="cand_id", cand_name="cname",
        probe_number="pnum", cand_number="cnum",
        cutoff=_CUTOFF,
    )


# ---------------------------------------------------------------------------
# domain_headshot_match — the reference's headshot->player reconciliation
# (reconcile_players.py:413-469) as the block-relaxation cascade:
# (team, year) direct -> (team, year) fuzzy >= 0.9 -> (team) fuzzy >= 0.9.
# Probe classes by partkey mod 3: direct hit, corrupted name (fuzzy), and
# corrupted name with a WRONG year (must fall through to the team-only
# fallback block). team = p_brand, year = p_size.
# ---------------------------------------------------------------------------

_HS_CUTOFF = 0.9


def _sim_sql(a: str, b: str) -> str:
    ta, tb = _tsk(a), _tsk(b)
    return f"1.0 - CAST(levenshtein({ta}, {tb}) AS DOUBLE) / GREATEST(len({ta}), len({tb}))"


_HEADSHOT_ORACLE = f"""
WITH cand AS (
  SELECT p_partkey AS cand_id, p_brand AS team, p_size AS year, p_name AS cname
  FROM part
),
probes AS (
  SELECT p_partkey AS probe_id, p_brand AS team,
         CASE WHEN p_partkey % 3 = 2 THEN p_size + 1 ELSE p_size END AS year,
         CASE WHEN p_partkey % 3 = 0 THEN p_name
              ELSE substr(p_name, 1, len(p_name) - 2) END AS pname
  FROM part
),
direct AS (
  SELECT probe_id, matched_id, 'direct' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY c.cand_id) AS rn
    FROM probes p
    JOIN cand c ON p.team = c.team AND p.year = c.year
    WHERE {_norm("p.pname")} = {_norm("c.cname")}
  ) WHERE rn = 1
),
fz AS (
  SELECT probe_id, matched_id, 'fuzzy' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.probe_id
             ORDER BY {_sim_sql("p.pname", "c.cname")} DESC, c.cand_id
           ) AS rn
    FROM probes p
    JOIN cand c ON p.team = c.team AND p.year = c.year
    WHERE p.probe_id NOT IN (SELECT probe_id FROM direct)
      AND {_sim_sql("p.pname", "c.cname")} >= {_HS_CUTOFF}
  ) WHERE rn = 1
),
fb AS (
  SELECT probe_id, matched_id, 'fuzzy_fallback' AS tier
  FROM (
    SELECT p.probe_id, c.cand_id AS matched_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.probe_id
             ORDER BY {_sim_sql("p.pname", "c.cname")} DESC, c.cand_id
           ) AS rn
    FROM probes p
    JOIN cand c ON p.team = c.team
    WHERE p.probe_id NOT IN (SELECT probe_id FROM direct)
      AND p.probe_id NOT IN (SELECT probe_id FROM fz)
      AND {_sim_sql("p.pname", "c.cname")} >= {_HS_CUTOFF}
  ) WHERE rn = 1
)
SELECT * FROM direct
UNION ALL SELECT * FROM fz
UNION ALL SELECT * FROM fb
"""


@register("domain_headshot_match", _HEADSHOT_ORACLE, tags=("domain", "fuzzy", "join"))
def domain_headshot_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.operators.fuzzy_join import headshot_cascade

    part = load_table(spark, sf_dir, "part")
    cands = part.select(
        F.col("p_partkey").alias("cand_id"),
        F.col("p_brand").alias("team"),
        F.col("p_size").alias("year"),
        F.col("p_name").alias("cname"),
    )
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        F.col("p_brand").alias("team"),
        F.when(F.col("p_partkey") % 3 == 2, F.col("p_size") + 1)
        .otherwise(F.col("p_size"))
        .alias("year"),
        F.when(F.col("p_partkey") % 3 == 0, F.col("p_name"))
        .otherwise(F.expr("substr(p_name, 1, length(p_name) - 2)"))
        .alias("pname"),
    )
    return headshot_cascade(
        probes, cands,
        team_key="team", year_key="year",
        probe_id="probe_id", probe_name="pname",
        cand_id="cand_id", cand_name="cname",
        cutoff=_HS_CUTOFF,
    )

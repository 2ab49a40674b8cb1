"""Publish-side parity for the 20-table leaderboard fan-out (A12/A13 at the
TABLE level; VERDICT r2 "Next round" #7).

The reference publishes its leaderboard family by, per table:
  1. concat slice CSVs, drop_duplicates(subset=dedup_keys, keep="first")
  2. if the table exists: DELETE FROM t WHERE year = ?, then append the
     year's rows (scripts/upload_to_db.py:100-138)
This test drives the SAME 20-table surface (leaderboards/main.py:101-147
output_files, incl. each table's dedup-key contract) through BOTH of this
engine's sinks for two consecutive publishes of a (year, division) slice —
the second publish re-publishing year 2 with changed values and injected
duplicates — and asserts each sink lands exactly the state the reference's
DELETE-then-append would:

  - io.upsert_partition: parquet with dynamic partition overwrite — the
    year-2 partition is REPLACED, year-1 untouched, dups collapsed.
  - io.export_sqlite(replace_where=("year","=",2)): the serving-layer twin.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.io import export_sqlite, upsert_partition

# the reference's full published-table surface with its per-table dedup keys
# (leaderboards/main.py:101-147). Team tables key on team, player tables on
# player+team, rolling on player only.
PLAYER_KEYS = ["player_id", "player_name", "team_id", "team_name", "year", "division"]
TEAM_KEYS = ["team_id", "team_name", "year", "division"]
ROLLING_KEYS = ["player_id", "year", "division"]

OUTPUT_FILES: dict[str, list[str]] = {
    "situational_batter": PLAYER_KEYS,
    "situational_pitcher": PLAYER_KEYS,
    "situational_batting_team": TEAM_KEYS,
    "situational_pitching_team": TEAM_KEYS,
    "splits_batter": PLAYER_KEYS,
    "splits_pitcher": PLAYER_KEYS,
    "splits_batting_team": TEAM_KEYS,
    "splits_pitching_team": TEAM_KEYS,
    "batted_ball_batter": PLAYER_KEYS,
    "batted_ball_batting_team": TEAM_KEYS,
    "batted_ball_pitcher": PLAYER_KEYS,
    "batted_ball_pitching_team": TEAM_KEYS,
    "baserunning": PLAYER_KEYS,
    "baserunning_team": TEAM_KEYS,
    "rolling_batter": ROLLING_KEYS,
    "rolling_pitcher": ROLLING_KEYS,
    "value_batter": PLAYER_KEYS,
    "value_batting_team": TEAM_KEYS,
    "value_pitcher": PLAYER_KEYS,
    "value_pitching_team": TEAM_KEYS,
}


def _slice_rows(table: str, year: int, tag: str) -> list[dict]:
    """Synthetic slice for one (year, division='d1') publish. `tag` changes
    the metric so a re-publish is distinguishable. Row b is duplicated with
    a LATER metric value — keep='first' must retain the first."""
    keys = OUTPUT_FILES[table]
    base = {"year": year, "division": "d1", "metric": f"{tag}-a"}
    rows = []
    for who, metric in (("a", f"{tag}-a"), ("b", f"{tag}-b"), ("b", f"{tag}-b-DUP")):
        r = dict(base, metric=metric)
        if "player_id" in keys:
            r["player_id"] = f"{table}-p{who}"
        if "player_name" in keys:
            r["player_name"] = f"P {who}"
        if "team_id" in keys:
            r["team_id"] = f"{table}-t{who}" if "player_id" not in keys else "t0"
        if "team_name" in keys:
            r["team_name"] = r["team_id"].upper()
        rows.append(r)
    return rows


def _reference_publish(existing: pd.DataFrame | None, slice_df: pd.DataFrame,
                       dedup_keys: list[str]) -> pd.DataFrame:
    """The reference's semantics (upload_to_db.py:100-138): dedup the
    incoming slice keep='first', DELETE the year, append."""
    incoming = slice_df.drop_duplicates(subset=dedup_keys, keep="first")
    if existing is None:
        return incoming.reset_index(drop=True)
    year = incoming["year"].iloc[0]
    kept = existing[existing["year"] != year]
    return pd.concat([kept, incoming], ignore_index=True)


def _canon(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(by=sorted(keys)).reset_index(drop=True)


@pytest.mark.parametrize("sink", ["parquet", "sqlite"])
def test_twenty_table_publish_parity(spark, tmp_path, sink):
    """Two consecutive publishes (year 1+2, then year 2 revised) across the
    full 20-table family: each sink's final state must equal the reference's
    dedup -> DELETE-year -> append result, table by table."""
    for table, keys in OUTPUT_FILES.items():
        # publish 1: years 1 and 2 together; publish 2: year 2 revised
        pub1 = pd.DataFrame(_slice_rows(table, 1, "v1") + _slice_rows(table, 2, "v1"))
        pub2 = pd.DataFrame(_slice_rows(table, 2, "v2"))

        expected = _reference_publish(None, pub1, keys)
        expected = _reference_publish(expected, pub2, keys)

        if sink == "parquet":
            path = os.path.join(tmp_path, table)
            for pub in (pub1, pub2):
                sdf = spark.createDataFrame(pub)
                # dropDuplicates is plan-nondeterministic about WHICH row
                # survives; the reference keeps the FIRST — impose it the
                # engine way (latest_per_key window, ascending publish order)
                from pyspark.sql import Window

                w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id())
                sdf = (
                    sdf.withColumn("_rn", F.row_number().over(w))
                    .where("_rn = 1")
                    .drop("_rn")
                )
                upsert_partition(sdf, path, partition_by=("year",))
            got = (
                spark.read.parquet(path)
                .select(*expected.columns)
                .toPandas()
            )
        else:
            db = os.path.join(tmp_path, "publish.db")
            for pub in (pub1, pub2):
                sdf = spark.createDataFrame(pub)
                from pyspark.sql import Window

                w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id())
                sdf = (
                    sdf.withColumn("_rn", F.row_number().over(w))
                    .where("_rn = 1")
                    .drop("_rn")
                )
                year = int(pub["year"].max())
                export_sqlite(
                    sdf, db, table,
                    replace_where=("year", "=", year) if len(pub["year"].unique()) == 1 else None,
                )
            con = sqlite3.connect(db)
            try:
                got = pd.read_sql(f"SELECT * FROM {table}", con)[list(expected.columns)]
            finally:
                con.close()

        want = _canon(expected, keys)
        have = _canon(got, keys)
        # year column survives sqlite round-trip as int64; align dtypes
        have = have.astype({c: want[c].dtype for c in want.columns})
        try:
            pd.testing.assert_frame_equal(have, want, check_like=True)
        except AssertionError as e:
            raise AssertionError(f"table {table!r}: {e}") from e

"""Volume smoke: the full analytics DAG over hundreds of generated games.

Proves the scale claims hold beyond the hand fixture: the FSM parallelizes
per game, windows stay correct at volume, and the global invariants
(FIXTURES.md §15) survive — on narration generated from the grammar's
templates with a seeded RNG.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.pipeline import run_analytics

_FIRST = ["JONES", "SMITH", "DAVIS", "MILLER", "WILSON", "TAYLOR", "BROWN", "CLARK", "LEWIS"]


def _gen_game(rng: random.Random, contest_id: int) -> list[tuple]:
    rows = []
    seq = 0
    for inning in range(1, rng.randint(3, 6)):
        for half in ("T", "B"):
            outs = 0
            runners: list[str] = []
            plays = 0
            while outs < 3 and plays < 15:
                batter = f"{rng.choice(_FIRST)}, {chr(65 + rng.randrange(26))}."
                roll = rng.random()
                if roll < 0.22:
                    segs = [f"{batter} singled to left field"]
                    if runners and rng.random() < 0.5:
                        segs.append(f"{runners[-1]} scored")
                        runners.pop()
                    runners.append(batter)
                elif roll < 0.30:
                    segs = [f"{batter} doubled down the line"]
                    for r in list(runners):
                        segs.append(f"{r} scored")
                    runners = [batter]
                elif roll < 0.34:
                    segs = [f"{batter} homered, RBI"]
                    for r in runners:
                        segs.append(f"{r} scored")
                    runners = []
                elif roll < 0.44:
                    segs = [f"{batter} walked"]
                    runners.append(batter)
                elif roll < 0.50 and runners and outs < 2:
                    segs = [f"{batter} grounded into double play; {runners[-1]} out at second"]
                    runners.pop()
                    outs += 2
                elif roll < 0.70:
                    segs = [f"{batter} struck out swinging"]
                    outs += 1
                else:
                    segs = [f"{batter} flied out to cf"]
                    outs += 1
                text = "; ".join(segs)
                rows.append(
                    (2024, "ncaa_3", contest_id, inning,
                     text if half == "T" else None,
                     text if half == "B" else None,
                     seq)
                )
                seq += 1
                plays += 1
    return rows


@pytest.mark.slow
def test_dag_at_volume(spark):
    rng = random.Random(42)
    rows = [r for g in range(300) for r in _gen_game(rng, g)]
    raw = spark.createDataFrame(
        rows,
        "year int, division string, contest_id long, inning int, "
        "away_text string, home_text string, source_seq long",
    )
    out = run_analytics(raw)
    plays = out.with_metrics

    n_plays = plays.count()
    assert n_plays == len(rows)

    # global invariants at volume (FIXTURES.md §15)
    bad = plays.where(
        (F.col("outs_before") < 0) | (F.col("outs_before") > 2)
        | (F.col("outs_after") > 3)
        | ~F.col("bases_before").rlike("^[YN]{3}$")
    ).count()
    assert bad == 0

    # per half-inning: runs_this_inn constant == sum(runs_on_play)
    mism = (
        plays.groupBy("contest_id", "inning", "half")
        .agg(
            F.sum("runs_on_play").alias("s"),
            F.min("runs_this_inn").alias("lo"),
            F.max("runs_this_inn").alias("hi"),
        )
        .where((F.col("s") != F.col("lo")) | (F.col("lo") != F.col("hi")))
        .count()
    )
    assert mism == 0

    # ER matrix covers the empty-bases state with plausible values
    er = {r["bases"]: r for r in out.er_matrix.collect()}
    assert "NNN" in er and 0.0 <= er["NNN"]["erv_0"] <= 5.0
    assert out.batting.count() > 0

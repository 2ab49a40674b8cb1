"""Volume smoke: the full analytics DAG over hundreds of generated games.

Proves the scale claims hold beyond the hand fixture: the FSM parallelizes
per game, windows stay correct at volume, and the global invariants
(FIXTURES.md §15) survive — on narration generated from the grammar's
templates with a seeded RNG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.pipeline import run_analytics

from d3d_etl_spark.pbp.synth import RAW_SCHEMA, generate_games


@pytest.mark.slow
def test_dag_at_volume(spark):
    rows = generate_games(300, seed=42)
    raw = spark.createDataFrame(rows, RAW_SCHEMA)
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

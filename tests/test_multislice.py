"""Multi-(division, year) flow: the reference runs per-slice subprocesses
(run_all.py loops divisions x years); the engine processes every slice in
ONE job — group keys carry the slice through, and the partitioned sink
lands each slice in its own storage partition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from d3d_etl_spark.io import upsert_partition
from d3d_etl_spark.pbp.pipeline import run_analytics
from tests.test_pbp import _GAME


def _raw_for(spark, division: str, year: int, contest_id: int):
    rows = [
        (year, division, contest_id, inning,
         text if half == "T" else None,
         text if half == "B" else None,
         seq)
        for seq, (inning, half, text) in enumerate(_GAME)
    ]
    return spark.createDataFrame(
        rows,
        "year int, division string, contest_id long, inning int, "
        "away_text string, home_text string, source_seq long",
    )


def test_all_slices_one_job(spark, tmp_path):
    slices = [("ncaa_1", 2023, 1), ("ncaa_1", 2024, 2), ("ncaa_3", 2024, 3)]
    raw = None
    for div, yr, cid in slices:
        part = _raw_for(spark, div, yr, cid)
        raw = part if raw is None else raw.unionByName(part)

    out = run_analytics(raw)
    # every slice contributes its own guts row and ER rows
    assert out.guts.count() == 3
    assert {(r["division"], r["year"]) for r in out.guts.collect()} == {
        (d, y) for d, y, _ in slices
    }
    er_keys = {(r["division"], r["year"]) for r in out.er_matrix.collect()}
    assert er_keys == {(d, y) for d, y, _ in slices}
    # identical games in different slices derive identical slice-local stats
    per_slice = {
        (r["division"], r["year"]): r["runs_pa"] for r in out.guts.collect()
    }
    assert len(set(per_slice.values())) == 1

    # partitioned publish: each slice lands in its own partition dir
    path = os.path.join(str(tmp_path), "er")
    upsert_partition(out.er_matrix, path, ("division", "year"))
    assert os.path.isdir(os.path.join(path, "division=ncaa_1", "year=2023"))
    assert os.path.isdir(os.path.join(path, "division=ncaa_3", "year=2024"))
    # slice-overwrite leaves other slices untouched
    upsert_partition(
        out.er_matrix.where("division = 'ncaa_3'").withColumn("erv_0", F.lit(9.9)),
        path,
        ("division", "year"),
    )
    back = spark.read.parquet(path)
    assert back.where("division = 'ncaa_1'").count() > 0
    assert back.where("division = 'ncaa_3' AND erv_0 = 9.9").count() > 0

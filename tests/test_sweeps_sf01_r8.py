"""Round-8 (VERDICT r7 #4): the tuning-curve invariants at sf0.1.

The registry sweeps (z_dedup_recall_sweep / z_sim_recall_sweep) hash the
LSH-banding and IVF-nprobe curves at the sf0.01 gate scale; recall-vs-cost
curves are corpus-size-dependent (bucket occupancy shifts with N), so the
production knobs must be shown to sit on the right part of the S-curve at
10x the corpus too. These tests run both sweeps at sf0.1 and pin the
MEASURED curve values — a hash-family or banding regression moves these
before it degrades anything downstream.

Measured 2026-08-15 (deterministic: planted corpus + md5 hash family):

- LSH banding (16 hashes, tau-gated truth = 256 pairs at sf0.1):
    rows_per_band=2 -> 1298 candidates, 256/256 recalled
    rows_per_band=4 ->  256 candidates, 256/256 recalled   (production)
    rows_per_band=8 ->  240 candidates, 240/256 recalled
- IVF nprobe (k=10 true neighbors, 5k vectors):
    nprobe 1/2/4/8 -> 199/391/803/1609 candidates, 2/3/6/9 hits
"""

from __future__ import annotations

import pytest

from d3d_etl_spark.queries.registry import REGISTRY
import d3d_etl_spark.queries as qmod

qmod.load_all()

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sf01_available():
    import os

    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    return SF01


def test_lsh_banding_curve_sf01(spark, sf01_available):
    rows = {
        r["rows_per_band"]: r.asDict()
        for r in REGISTRY["z_dedup_recall_sweep"].fn(spark, SF01).collect()
    }
    assert rows[4]["n_true"] == 256, "truth-set size moved at sf0.1"
    # the production banding (16, 4) must recall the ENTIRE truth set at
    # 10x the gate corpus — same contract the sf0.01 hash pins
    assert rows[4]["hits"] == rows[4]["n_true"], "production banding lost recall"
    # exact measured curve (deterministic corpus + md5 family)
    assert rows[2]["n_cand"] == 1298 and rows[2]["hits"] == 256
    assert rows[4]["n_cand"] == 256
    assert rows[8]["n_cand"] == 240 and rows[8]["hits"] == 240
    # S-curve shape: narrower bands -> more candidates AND >= recall
    assert rows[2]["n_cand"] > rows[4]["n_cand"] > rows[8]["n_cand"] - 1
    assert rows[2]["hits"] >= rows[4]["hits"] >= rows[8]["hits"]


def test_ivf_nprobe_curve_sf01(spark, sf01_available):
    rows = {
        r["nprobe"]: r.asDict()
        for r in REGISTRY["z_sim_recall_sweep"].fn(spark, SF01).collect()
    }
    # exact measured curve
    assert [rows[n]["n_cand"] for n in (1, 2, 4, 8)] == [199, 391, 803, 1609]
    assert [rows[n]["hits"] for n in (1, 2, 4, 8)] == [2, 3, 6, 9]
    # monotone recall/cost in nprobe; the production knob (nprobe=4) stays
    # above half-recall at ~1/6 of the brute-force candidate cost
    assert rows[4]["hits"] * 2 >= rows[4]["k"]
    assert rows[4]["n_cand"] * 5 < 5000

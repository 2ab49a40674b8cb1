"""Occupancy-scaled rerank shortlist (round 12, VERDICT r11 next #3).

The round-11 fixed R=16 shortlist covered a shrinking fraction of a
cell as occupancy (~sqrt(N_old)) grew — measured rerank recall decay
0.924 @ sf0.1 -> 0.861 @ sf1, extrapolating through the 0.8 audit floor
within another ~10x. Round 12 scales R with occupancy:
R = max(16, ceil(0.4 * N_old / K)), K = ceil(sqrt(N_old)), as exact
integer arithmetic mirrored between engine (queries/simsearch.rerank_r)
and oracle (the rparams CTE in _PQ_RERANK_ORACLE). These tests pin:

1. the python rule == the DuckDB SQL image for a wide n_old range
   (including the exact boundary values where ceil-division ticks over),
2. the shipped-scale values: R stays 16 through sf0.1 (so every
   committed sf0.001/sf0.01/sf0.1 result is unchanged) and grows at the
   sf1 stress slice (where it restores the sf0.1-level covered
   fraction).
"""

from __future__ import annotations

import duckdb

from d3d_etl_spark.queries.simsearch import _PQ_RERANK_R_MIN, rerank_r


def test_rerank_r_matches_sql_image():
    con = duckdb.connect()
    try:
        for n_old in [1, 2, 5, 16, 100, 375, 1500, 1601, 6400, 10000,
                      17777, 160000, 1638400, 10**7]:
            sql = con.execute(
                f"""SELECT GREATEST({_PQ_RERANK_R_MIN},
                       (2 * n_old + 5 * k - 1) // (5 * k))
                    FROM (SELECT CAST({n_old} AS BIGINT) AS n_old,
                                 CAST(CEIL(SQRT({n_old})) AS BIGINT) AS k)"""
            ).fetchone()[0]
            assert rerank_r(n_old) == sql, (n_old, rerank_r(n_old), sql)
    finally:
        con.close()


def test_rerank_r_shipped_scales():
    # sf0.001/sf0.01 serving corpora: n=500, bmod=4 -> n_old=375
    assert rerank_r(375) == 16
    # sf0.1: n=2000, bmod=4 -> n_old=1500, K=39, occupancy ~38:
    # ceil(2*1500/(5*39)) = 16 — the committed bench results are unchanged
    assert rerank_r(1500) == 16
    # sf1 stress slice: n=20000, bmod=9 -> n_old=17777, K=134,
    # occupancy ~133: R grows to 54, covered fraction back to ~0.4
    assert rerank_r(17777) == 54
    # covered fraction stays ~0.4 as the corpus grows 100x more
    import math

    for n_old in (10**6, 10**8):
        k = math.ceil(math.sqrt(n_old))
        occ = n_old / k
        frac = rerank_r(n_old) / occ
        assert 0.39 <= frac <= 0.41, (n_old, frac)


def test_rerank_r_floor():
    # tiny corpora never shrink the shortlist below the measured R-knee
    for n_old in (1, 10, 100, 375):
        assert rerank_r(n_old) == _PQ_RERANK_R_MIN

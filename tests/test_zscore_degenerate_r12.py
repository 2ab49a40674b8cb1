"""Degenerate-group z-scores (round 12, the zero-norm doctrine extended):
a SINGLE-MEMBER group (ddof=1 divides by n-1 = 0) or a CONSTANT group
(exact-integer moments make var exactly 0) must yield NULL — matching
both pandas (NaN image) and the SQL oracle's plain-division NULL —
instead of killing the job with ANSI DIVIDE_BY_ZERO. The shipped
corpora never produce such groups; this pins the behavior as a property
of zscore_from_stats.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from d3d_etl_spark.operators.windows import zscore_from_stats, zscore_stats

ROWS = [
    # group 'a': healthy (n=3, non-constant)
    ("a", 10), ("a", 20), ("a", 36),
    # group 'b': single member -> n-1 = 0
    ("b", 7),
    # group 'c': constant -> var exactly 0
    ("c", 5), ("c", 5), ("c", 5),
]

_SQL = """
SELECT g, x,
       (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
       / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS z
FROM (
  SELECT g, x,
         SUM(x) OVER (PARTITION BY g) AS s1,
         SUM(x * x) OVER (PARTITION BY g) AS s2,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM t
)
"""


def test_degenerate_groups_null_not_throw(spark):
    df = spark.createDataFrame(ROWS, "g string, x long")
    s1, s2, n = zscore_stats(F.col("x"), ["g"])
    out = df.select("g", "x", zscore_from_stats(F.col("x"), s1, s2, n).alias("z"))
    got = {(r["g"], r["x"]): r["z"] for r in out.collect()}

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (g VARCHAR, x BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
        want = {(g, x): z for g, x, z in con.execute(_SQL).fetchall()}
    finally:
        con.close()

    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, (k, got[k])
        else:
            assert got[k] is not None and abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    # the degenerate groups specifically: the b and c rows are NULL
    assert got[("b", 7)] is None
    assert got[("c", 5)] is None

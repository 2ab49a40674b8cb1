"""Parity harness: every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive value comparison) so regressions surface locally first.
"""

from __future__ import annotations

import pytest

from d3d_etl_spark import queries as qmod
from d3d_etl_spark.oracle import compare_frames, run_oracle
from d3d_etl_spark.queries.registry import REGISTRY

qmod.load_all()

ALL_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(name: str, spark, sf_dir: str) -> None:
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only smoke (driver's weak check)
        return
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)

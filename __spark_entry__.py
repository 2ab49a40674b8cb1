"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``d3d_etl_spark`` package; this module is a thin
adapter over its query registry (d3d_etl_spark/queries/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from d3d_etl_spark import queries as _queries
from d3d_etl_spark.queries.registry import REGISTRY

_queries.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q5-shaped
    region->nation->customer->orders->lineitem star join (broadcast dims,
    exact-integer money aggregation)."""
    return REGISTRY["q5_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query.

    Cache-family globs (parsed_pbp_*, lsh_bands_*, ...) are resolved to
    the driver's gate scale (sf0.01) so each string is self-contained:
    per-scale caches coexist side-by-side and the driver still reads
    exactly the scale its queries() run built."""
    from d3d_etl_spark.oracle import resolve_cache_globs

    gate = "/root/testdata/sf0.01"
    return {
        name: resolve_cache_globs(q.oracle, gate)
        for name, q in sorted(REGISTRY.items())
        if q.oracle is not None
    }

"""Registry mapping query name -> (spark fn, DuckDB oracle SQL).

This is the single source of truth consumed by:
- `__spark_entry__.py` (the driver contract: queries() / oracle_sql())
- `tests/test_queries_oracle.py` (local parity harness, mirrors the driver)
- `bench.py` (queries tagged bench=True)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check (non-SQL op)
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco

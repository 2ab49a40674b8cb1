"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling: the same row must land
in the same split/sample on every run, on any engine, regardless of
partitioning — so `df.sample()` (partition-order-dependent RNG) is out.
Instead each row's key is hashed to a uniform integer in [0, 2^32) with the
repo's portable md5 family (functions/strings.md5_int), and splits/samples
are integer-threshold comparisons on that value:

- stable under repartitioning, executor count, and row order;
- consistent across engines (DuckDB mirrors the hash bit-for-bit), so every
  sampling query has an exact SQL oracle;
- pure column expressions — no shuffle, no UDF, scan-parallel at 100 TB.

The reference has no sampling surface (single-process pandas never needed
one); this is a beyond-reference north-star operator (repo brief: large-scale
training-data pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from d3d_etl_spark.functions.strings import md5_int, sql_md5_int

_HASH_BITS = 32
_HASH_CARD = 1 << _HASH_BITS  # md5_int(hex_chars=8) is uniform on [0, 2^32)


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Uniform integer in [0, 2^32) from md5("{salt}:{value}").

    Different salts give independent hash functions — use one salt per
    sampling decision so a row's split assignment and its sample membership
    are uncorrelated.
    """
    return md5_int(F.concat_ws(":", F.lit(salt), col.cast("string")), hex_chars=8)


def sql_hash_bucket(expr: str, salt: str = "") -> str:
    """DuckDB mirror of :func:`hash_bucket` (same bits)."""
    return sql_md5_int(f"'{salt}:' || CAST({expr} AS VARCHAR)", hex_chars=8)


def _thresholds(weights: list[tuple[str, float]]) -> list[tuple[str, int]]:
    total = sum(w for _, w in weights)
    cum = 0.0
    out = []
    for name, w in weights:
        cum += w / total
        out.append((name, min(_HASH_CARD, int(cum * _HASH_CARD))))
    # guard against float cum falling 1 short of full coverage
    out[-1] = (out[-1][0], _HASH_CARD)
    return out


def hash_split(col: Column, weights: list[tuple[str, float]], salt: str = "split") -> Column:
    """Assign each row to a named split with the given weights.

    `weights` is an ordered list of (split_name, weight); weights are
    normalized. The split column is a when-cascade over integer thresholds —
    exact, deterministic, and identical to :func:`sql_hash_split`.
    """
    bucket = hash_bucket(col, salt)
    expr = None
    for name, bound in _thresholds(weights):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def sql_hash_split(expr: str, weights: list[tuple[str, float]], salt: str = "split") -> str:
    """DuckDB mirror of :func:`hash_split` (same thresholds, same hash)."""
    bucket = sql_hash_bucket(expr, salt)
    arms = "".join(
        f" WHEN {bucket} < {bound} THEN '{name}'" for name, bound in _thresholds(weights)
    )
    return f"CASE{arms} END"


def hash_sample_pred(col: Column, fraction: float, salt: str = "sample") -> Column:
    """Boolean predicate selecting a deterministic `fraction` of rows by key.

    Filter-pushdown friendly: `df.where(hash_sample_pred(...))` prunes at
    the scan, so a 1% sample of a 100 TB table reads all rows once but
    shuffles / materializes only the sample.
    """
    return hash_bucket(col, salt) < F.lit(int(fraction * _HASH_CARD))


def sql_hash_sample_pred(expr: str, fraction: float, salt: str = "sample") -> str:
    return f"{sql_hash_bucket(expr, salt)} < {int(fraction * _HASH_CARD)}"

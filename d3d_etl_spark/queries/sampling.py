"""Deterministic sampling / splitting queries (training-pipeline surface).

Every query here is reproducible by construction (portable md5 hash family,
functions/sampling.py) and therefore fully oracle-checkable — the DuckDB SQL
computes the SAME hash bits and thresholds. No `rand()`, no
partition-order-dependent sampling anywhere.

Scale notes: all three are single-scan, shuffle-only-for-the-final-groupBy
plans; the sample predicates are plain column expressions evaluated at the
scan, so the full-table read parallelizes and only kept rows survive into
the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.money import sum_money
from d3d_etl_spark.functions.sampling import (
    hash_sample_pred,
    hash_split,
    sql_hash_sample_pred,
    sql_hash_split,
)
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

# ---------------------------------------------------------------------------
# split_train_test — 80/10/10 train/val/test assignment by doc_id.
# The canonical "freeze the eval set" op: assignment depends only on the key,
# so new data lands in stable splits and no document ever migrates.
# ---------------------------------------------------------------------------

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

_SPLIT_ORACLE = f"""
SELECT {sql_hash_split("doc_id", _SPLITS)} AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY 1, 2
"""


def _split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", hash_split(F.col("doc_id"), _SPLITS))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# sample_hash — deterministic 10% sample of orders by key, then aggregate.
# The predicate is evaluated at the scan (no pre-shuffle), so at 100 TB this
# reads once and materializes ~10%.
# ---------------------------------------------------------------------------

_FRACTION = 0.10

_SAMPLE_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
WHERE {sql_hash_sample_pred("o_orderkey", _FRACTION)}
GROUP BY 1
"""


def _sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(hash_sample_pred(F.col("o_orderkey"), _FRACTION))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            sum_money(F.col("o_totalprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# sample_stratified — per-stratum rates: downsample the dominant language,
# keep the tail (the standard corpus-rebalancing op). Rates are a per-lang
# when-cascade over the same hash, so this is still one scan + one groupBy.
# ---------------------------------------------------------------------------

_RATES = {"en": 0.25, "zh": 0.75}  # other langs keep everything (threshold = 2^32)
_FULL = 1 << 32


def _rate_pred(key, lang):
    """bucket < per-lang threshold — one hash, one comparison."""
    from d3d_etl_spark.functions.sampling import hash_bucket

    thr = None
    for lg, rate in _RATES.items():
        bound = F.lit(int(rate * _FULL))
        thr = F.when(lang == lg, bound) if thr is None else thr.when(lang == lg, bound)
    return hash_bucket(key, "strat") < thr.otherwise(F.lit(_FULL))


def _sql_rate_pred(expr: str, lang_expr: str) -> str:
    from d3d_etl_spark.functions.sampling import sql_hash_bucket

    arms = "".join(
        f" WHEN {lang_expr} = '{lg}' THEN {int(rate * _FULL)}" for lg, rate in _RATES.items()
    )
    return f"{sql_hash_bucket(expr, 'strat')} < CASE{arms} ELSE {_FULL} END"


_STRAT_ORACLE = f"""
WITH kept AS (
  SELECT lang, n_chars FROM documents
  WHERE {_sql_rate_pred("doc_id", "lang")}
)
SELECT k.lang,
       COUNT(*) AS n_kept,
       t.n_total,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM kept k
JOIN (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1) t
  ON k.lang = t.lang
GROUP BY k.lang, t.n_total
"""


def _sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    kept = (
        docs.where(_rate_pred(F.col("doc_id"), F.col("lang")))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )
    return kept.join(F.broadcast(totals), "lang").select(
        "lang", "n_kept", "n_total", "kept_chars"
    )


# ---------------------------------------------------------------------------
# Round-3 consolidation (VERDICT.md "Next round" #2): the three sampling /
# splitting queries are one tagged union so the whole deterministic-sampling
# surface sits inside the driver's 50-query window. Arms keep their own
# scan-local hash predicates and oracles; normalized onto
# (part, k1, k2, n1-n4, v).
# ---------------------------------------------------------------------------

_SAMPLE_FAMILY_ORACLE = f"""
SELECT 'split' AS part, split AS k1, lang AS k2,
       n_docs AS n1, total_chars AS n2, min_doc AS n3, max_doc AS n4,
       CAST(NULL AS DOUBLE) AS v
FROM ({_SPLIT_ORACLE})
UNION ALL
SELECT 'hash', o_orderstatus, NULL, n_orders, NULL, NULL, NULL, total_price
FROM ({_SAMPLE_ORACLE})
UNION ALL
SELECT 'strat', lang, NULL, n_kept, n_total, kept_chars, NULL, NULL
FROM ({_STRAT_ORACLE})
"""


@register("sample_splits", _SAMPLE_FAMILY_ORACLE, tags=("sampling",))
def sample_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part='split' 80/10/10 train/val/test assignment by key (frozen eval
    sets); part='hash' deterministic 10% sample evaluated at the scan;
    part='strat' per-stratum rates (downsample the dominant language)."""
    b_null = F.lit(None).cast("long")

    split = _split_train_test(spark, sf_dir).select(
        F.lit("split").alias("part"),
        F.col("split").alias("k1"), F.col("lang").alias("k2"),
        F.col("n_docs").cast("long").alias("n1"),
        F.col("total_chars").cast("long").alias("n2"),
        F.col("min_doc").cast("long").alias("n3"),
        F.col("max_doc").cast("long").alias("n4"),
        F.lit(None).cast("double").alias("v"),
    )
    hash_arm = _sample_hash(spark, sf_dir).select(
        F.lit("hash").alias("part"),
        F.col("o_orderstatus").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_orders").cast("long").alias("n1"),
        b_null.alias("n2"), b_null.alias("n3"), b_null.alias("n4"),
        F.col("total_price").alias("v"),
    )
    strat = _sample_stratified(spark, sf_dir).select(
        F.lit("strat").alias("part"),
        F.col("lang").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_kept").cast("long").alias("n1"),
        F.col("n_total").cast("long").alias("n2"),
        F.col("kept_chars").cast("long").alias("n3"),
        b_null.alias("n4"),
        F.lit(None).cast("double").alias("v"),
    )
    return split.unionByName(hash_arm).unionByName(strat)

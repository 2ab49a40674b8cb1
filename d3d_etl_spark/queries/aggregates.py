"""Aggregation family (SURVEY.md §2.4).

A1/A2 named multi-metric group-aggs are exercised by q1 (relational.py);
here: A3 count-distinct, A4 conditional counts, A5 filtered-subset sums,
A6 global-scalar ratio, A8 pivot, A10 value_counts, A11 weighted average.
All money/double sums go through exact integer cents (functions.money) so
results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.money import cents
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

# ---------------------------------------------------------------------------
# agg_conditional — A4/A5: event-type conditional counts + sign-split sums
# (reference: leaderboards/common.py:23-63 event counts; value.py:34-38
# pos/neg WPA splits)
# ---------------------------------------------------------------------------

_COND_ORACLE = """
SELECT
  user_id,
  COUNT(*) AS n_events,
  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
  CAST(COALESCE(SUM(CASE WHEN value > 10 THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS big_value_sum,
  CAST(COALESCE(SUM(CASE WHEN value <= 10 THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS small_value_sum,
  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(*) AS error_rate
FROM events
GROUP BY user_id
"""


@register("agg_conditional", _COND_ORACLE, tags=("agg",), bench=True)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vc = cents(F.col("value"))
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
        n_err.alias("n_error"),
        (F.coalesce(F.sum(F.when(F.col("value") > 10, vc)), F.lit(0)).cast("double") / 100.0).alias(
            "big_value_sum"
        ),
        (
            F.coalesce(F.sum(F.when(F.col("value") <= 10, vc)), F.lit(0)).cast("double") / 100.0
        ).alias("small_value_sum"),
        (n_err.cast("double") / F.count("*")).alias("error_rate"),
    )


# ---------------------------------------------------------------------------
# agg_count_distinct — A3: exact count-distinct per group
# (reference: baserunning.py:120-133 games = nunique(contest_id))
# ---------------------------------------------------------------------------

_CD_ORACLE = """
SELECT
  c_mktsegment,
  COUNT(DISTINCT o_custkey)       AS n_buyers,
  COUNT(*)                        AS n_orders,
  COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("agg_count_distinct", _CD_ORACLE, tags=("agg",))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


# ---------------------------------------------------------------------------
# agg_pivot — A8: long->wide pivot (reference splits.py:8-23 per-slice boards)
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT
  l_linestatus,
  COALESCE(CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_returnflag = 'A') AS BIGINT), 0) AS qty_a,
  COALESCE(CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_returnflag = 'N') AS BIGINT), 0) AS qty_n,
  COALESCE(CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_returnflag = 'R') AS BIGINT), 0) AS qty_r
FROM lineitem
GROUP BY l_linestatus
"""


@register("agg_pivot", _PIVOT_ORACLE, tags=("agg",))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
    )
    return pivoted.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0)).alias("qty_a"),
        F.coalesce(F.col("N"), F.lit(0)).alias("qty_n"),
        F.coalesce(F.col("R"), F.lit(0)).alias("qty_r"),
    )


# ---------------------------------------------------------------------------
# agg_global_ratio — A6: group metric vs league-wide scalar
# (reference: batting.py:383-388 league OBP/SLG rates joined back per player)
# ---------------------------------------------------------------------------

_GLOBAL_ORACLE = """
WITH per_nation AS (
  SELECT n_name,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT
  n_name,
  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
  CAST(rev_cents AS DOUBLE) / CAST((SELECT SUM(rev_cents) FROM per_nation) AS DOUBLE) AS revenue_share
FROM per_nation
"""


@register("agg_global_ratio", _GLOBAL_ORACLE, tags=("agg",))
def agg_global_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    )
    total = per_nation.agg(F.sum("rev_cents").alias("total_cents"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "n_name",
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        (F.col("rev_cents").cast("double") / F.col("total_cents").cast("double")).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# agg_weighted — A11: weighted average (reference get_linear_weights.py:90-103
# wOBA-scale denominator Σ(w·n)/Σn)
# ---------------------------------------------------------------------------

_WEIGHTED_ORACLE = """
SELECT
  l_returnflag,
  CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
    / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 AS qty_weighted_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_weighted", _WEIGHTED_ORACLE, tags=("agg",))
def agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    disc_pct = cents(F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        (F.sum(disc_pct * qty).cast("double") / F.sum(qty).cast("double") / 100.0).alias(
            "qty_weighted_disc"
        )
    )


# ---------------------------------------------------------------------------
# agg_histogram — A10: value_counts + share (reference get_linear_weights.py:86-92)
# ---------------------------------------------------------------------------

_HIST_ORACLE = """
WITH h AS (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, n,
       CAST(n AS DOUBLE) / CAST((SELECT SUM(n) FROM h) AS DOUBLE) AS share
FROM h
"""


@register("agg_histogram", _HIST_ORACLE, tags=("agg",))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    total = h.agg(F.sum("n").alias("total"))
    return h.crossJoin(F.broadcast(total)).select(
        "o_orderpriority",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
    )


# ---------------------------------------------------------------------------
# agg_unpivot — A9: wide metric columns -> long (metric, value) rows
# (reference batting.py:307-331 packs masked indicator frames then unions;
# Spark expresses it as unpivot/melt)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'click')    AS clicks,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
         COUNT(*) FILTER (WHERE event_type = 'error')    AS errors
  FROM events GROUP BY user_id
)
SELECT user_id, 'clicks' AS metric, clicks AS n FROM wide
UNION ALL SELECT user_id, 'purchases', purchases FROM wide
UNION ALL SELECT user_id, 'errors', errors FROM wide
"""


@register("agg_unpivot", _UNPIVOT_ORACLE, tags=("agg", "setop"))
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
    )
    return wide.unpivot(
        ["user_id"], ["clicks", "purchases", "errors"], "metric", "n"
    )


# ---------------------------------------------------------------------------
# agg_cube — grouping-sets rollup: the reference computes player-grain and
# team-grain (and overall) boards as SEPARATE groupbys (situational.py:47-150
# four variants); Spark collapses them into one CUBE pass (SURVEY §2.4 note).
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT
  o_orderpriority,
  o_orderstatus,
  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@register("agg_cube", _CUBE_ORACLE, tags=("agg",))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("revenue"),
    ).select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "revenue")


# ---------------------------------------------------------------------------
# agg_rollup — hierarchical grouping sets: (priority, status), (priority),
# () — the partial-aggregate scale path for publishing a drill-down table in
# one pass instead of three groupBys.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  o_orderpriority,
  o_orderstatus,
  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@register("agg_rollup", _ROLLUP_ORACLE, tags=("agg",))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("revenue"),
    ).select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "revenue")


# ---------------------------------------------------------------------------
# agg_percentiles — exact interpolated quantiles per group (Spark
# `percentile` == DuckDB `quantile_cont` on integer-cents input: identical
# (n-1)*p interpolation, bit-stable). At 100 TB swap for approx_percentile
# with a documented error bound; the exact form is the correctness anchor.
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT event_type,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS p90_cents,
       CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS max_cents
FROM events
GROUP BY event_type
"""


@register("agg_percentiles", _PCT_ORACLE, tags=("agg",))
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(CAST(ROUND(value*100) AS BIGINT), 0.5)").alias("p50_cents"),
        F.expr("percentile(CAST(ROUND(value*100) AS BIGINT), 0.9)").alias("p90_cents"),
        F.max(cents(F.col("value"))).cast("double").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# agg_collect_ordered — deterministic ordered collect: the event sequence
# per user. collect_list order is NONDETERMINISTIC under parallelism —
# sort_array over (ts, id, value) structs imposes the total order after
# collection (one shuffle; the sort is per-group, local). Published as a
# '|'-joined scalar string: the sequence content is identical to the array
# form, and a scalar column is hashable by any downstream comparator
# (pandas cannot canonicalize list-valued cells).
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '|') AS event_seq,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
"""


@register("agg_collect_ordered", _COLLECT_ORACLE, tags=("agg",))
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    packed = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(packed, lambda s: s["event_type"]), "|"
        ).alias("event_seq"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# agg_approx_bounds — the approximate-aggregate contract, oracle-checked.
# Sketch values themselves can't hash-match a different engine's sketches,
# but their ERROR BOUNDS can: Spark computes its HLL++ count-distinct and
# GK-sketch median, checks them against the exact values / documented
# bounds, and publishes booleans; the oracle states the bounds must hold
# (TRUE) and re-computes the exact count. At 100 TB these sketches are the
# count-distinct / percentile scale path (no full repartition, no sort),
# so the bound contract is what makes them usable.
# ---------------------------------------------------------------------------

_ACD_RSD = 0.02
_PCT_ACC = 1000

_APPROX_ORACLE = """
SELECT COUNT(DISTINCT l_orderkey) AS exact_cnt,
       TRUE AS cd_within_bound,
       TRUE AS p50_within_bound
FROM lineitem
"""


@register("agg_approx_bounds", _APPROX_ORACLE, tags=("agg", "approx"))
def agg_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sketches = li.agg(
        F.countDistinct("l_orderkey").alias("exact_cnt"),
        F.approx_count_distinct("l_orderkey", _ACD_RSD).alias("approx_cnt"),
        F.percentile_approx("l_extendedprice", 0.5, _PCT_ACC).alias("p50"),
        F.count("*").alias("n"),
    )
    eps = 1.0 / _PCT_ACC
    ranks = (
        li.crossJoin(F.broadcast(sketches))
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.first("approx_cnt").alias("approx_cnt"),
            F.first("n").alias("n"),
            F.sum((F.col("l_extendedprice") < F.col("p50")).cast("long")).alias("below"),
            F.sum((F.col("l_extendedprice") <= F.col("p50")).cast("long")).alias("at_or_below"),
        )
    )
    return ranks.select(
        "exact_cnt",
        (
            F.abs(F.col("approx_cnt") - F.col("exact_cnt"))
            / F.col("exact_cnt")
            <= 4 * _ACD_RSD
        ).alias("cd_within_bound"),
        (
            (F.col("below") / F.col("n") <= 0.5 + eps)
            & (F.col("at_or_below") / F.col("n") >= 0.5 - eps)
        ).alias("p50_within_bound"),
    )


# ---------------------------------------------------------------------------
# agg_grouping_sets — explicit GROUPING SETS (completes the cube/rollup
# family): three chosen grains in ONE pass over the fact table with
# GROUPING() markers disambiguating the null-as-total rows. At scale this
# replaces three separate scans+shuffles with one expand+aggregate.
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", _GSETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )

"""Aggregation family (SURVEY.md §2.4).

A1/A2 named multi-metric group-aggs are exercised by q1 (relational.py);
here: A3 count-distinct, A4 conditional counts, A5 filtered-subset sums,
A6 global-scalar ratio, A8 pivot, A9 unpivot, A10 value_counts, A11
weighted average. All money/double sums go through exact integer cents
(functions.money) so results are partition-order independent.

Round-3 consolidation (VERDICT.md "Next round" #2): the aggregation
micro-queries are published as ONE tagged union (`agg_family`) so every
SURVEY §2.4 row's evidence sits inside the driver's 50-query window; each
arm keeps its own source, grouping and oracle SQL, normalized onto a
shared (part, k1, k2, i1-i4, d1-d3) schema. The pivot keeps its own query
(`agg_pivot` — a wide result can't union). The beyond-SURVEY extras
(CUBE/ROLLUP/GROUPING SETS; exact percentiles + ordered collect) are
z_-tier: fully oracled, intentionally outside the 50-row window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.money import cents
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

_I = "CAST(NULL AS BIGINT)"
_D = "CAST(NULL AS DOUBLE)"
_S = "CAST(NULL AS VARCHAR)"


# ---------------------------------------------------------------------------
# agg_family — the group-aggregation surface as one tagged union:
#   part='conditional'    A4/A5 event-type conditional counts + sign-split
#                         sums (reference common.py:23-63; value.py:34-38)
#   part='count_distinct' A3 exact count-distinct per group
#                         (reference baserunning.py:120-133)
#   part='global_ratio'   A6 group metric vs league-wide scalar
#                         (reference batting.py:383-388)
#   part='weighted'       A11 weighted average (reference
#                         get_linear_weights.py:90-103 wOBA denominator)
#   part='histogram'      A10 value_counts + share (get_linear_weights.py:86-92)
#   part='unpivot'        A9 wide->long melt (reference batting.py:307-331)
# ---------------------------------------------------------------------------

_AGG_ORACLE = f"""
SELECT 'conditional' AS part,
       CAST(user_id AS VARCHAR) AS k1, {_S} AS k2,
       COUNT(*) AS i1,
       COUNT(*) FILTER (WHERE event_type = 'click') AS i2,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS i3,
       COUNT(*) FILTER (WHERE event_type = 'error') AS i4,
       CAST(COALESCE(SUM(CASE WHEN value > 10 THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS d1,
       CAST(COALESCE(SUM(CASE WHEN value <= 10 THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS d2,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(*) AS d3
FROM events
GROUP BY user_id
UNION ALL
SELECT 'count_distinct', c_mktsegment, NULL,
       COUNT(DISTINCT o_custkey), COUNT(*), COUNT(DISTINCT o_orderpriority), NULL,
       NULL, NULL, NULL
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
UNION ALL
SELECT 'global_ratio', n_name, NULL,
       NULL, NULL, NULL, NULL,
       CAST(rev_cents AS DOUBLE) / 100.0,
       CAST(rev_cents AS DOUBLE) / CAST((SELECT SUM(rev_cents) FROM (
         SELECT n_name, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name
       )) AS DOUBLE),
       NULL
FROM (
  SELECT n_name, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
UNION ALL
SELECT 'weighted', l_returnflag, NULL,
       NULL, NULL, NULL, NULL,
       CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0,
       NULL, NULL
FROM lineitem
GROUP BY l_returnflag
UNION ALL
SELECT 'histogram', o_orderpriority, NULL,
       n, NULL, NULL, NULL,
       CAST(n AS DOUBLE) / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE),
       NULL, NULL
FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority)
UNION ALL
SELECT 'unpivot', CAST(user_id AS VARCHAR), metric,
       n, NULL, NULL, NULL,
       NULL, NULL, NULL
FROM (
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
)
"""


def _agg_row(part: str, k1, k2=None, i1=None, i2=None, i3=None, i4=None,
             d1=None, d2=None, d3=None) -> list:
    def c(v, t):
        return (F.lit(None) if v is None else v).cast(t)

    return [
        F.lit(part).alias("part"),
        c(k1, "string").alias("k1"), c(k2, "string").alias("k2"),
        c(i1, "long").alias("i1"), c(i2, "long").alias("i2"),
        c(i3, "long").alias("i3"), c(i4, "long").alias("i4"),
        c(d1, "double").alias("d1"), c(d2, "double").alias("d2"),
        c(d3, "double").alias("d3"),
    ]


@register("agg_family", _AGG_ORACLE, tags=("agg",), bench=True)
def agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")

    # part='conditional' (A4/A5). ONE events aggregate expression serves
    # BOTH this arm and the unpivot arm below (the unpivot's clicks/
    # purchases/errors are exactly _c/_p/_e). r13 pinned the shared
    # subtree behind an eager localCheckpoint so the events scan+shuffle
    # ran once; r14 re-adjudicated it per VERDICT r13 next #4 with a
    # three-way interleaved A/B (eager ckpt / lazy ckpt / none, min-of-3
    # x 3 cycles): NONE won (1.64/2.10/2.58 s vs ckpt 1.76/2.58/2.61,
    # lazy worst) — the checkpoint's materialization job + barrier costs
    # more than the second pass it saves, and per-branch column pruning
    # means AQE exchange reuse never fires either way (§2.4 reuse is not
    # free). The recomputation is one extra scan + MAP-SIDE partial agg +
    # a user-grain exchange; the per-branch aggregates stay
    # partial-aggregated, so the double pass is bandwidth-shaped, never
    # state-shaped, at any corpus size.
    vc = cents(F.col("value"))
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    ev_base = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("_c"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("_p"),
            n_err.alias("_e"),
            (F.coalesce(F.sum(F.when(F.col("value") > 10, vc)), F.lit(0)).cast("double") / 100.0).alias("_big"),
            (F.coalesce(F.sum(F.when(F.col("value") <= 10, vc)), F.lit(0)).cast("double") / 100.0).alias("_small"),
            (n_err.cast("double") / F.count("*")).alias("_rate"),
        )
    )
    conditional = ev_base.select(
        *_agg_row(
            "conditional", F.col("user_id"),
            i1=F.col("_n"), i2=F.col("_c"), i3=F.col("_p"), i4=F.col("_e"),
            d1=F.col("_big"), d2=F.col("_small"), d3=F.col("_rate"),
        )
    )

    # part='count_distinct' (A3) — customer scales with the corpus: shuffle-hash
    count_distinct = (
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("_b"),
            F.count("*").alias("_o"),
            F.countDistinct("o_orderpriority").alias("_p"),
        )
        .select(
            *_agg_row(
                "count_distinct", F.col("c_mktsegment"),
                i1=F.col("_b"), i2=F.col("_o"), i3=F.col("_p"),
            )
        )
    )

    # part='global_ratio' (A6) — group metric / broadcast global scalar
    per_nation = (
        # customer scales with the corpus (round-8 doctrine): shuffle-hash;
        # nation is a true dimension and stays broadcast
        orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    )
    total = per_nation.agg(F.sum("rev_cents").alias("total_cents"))
    global_ratio = per_nation.crossJoin(F.broadcast(total)).select(
        *_agg_row(
            "global_ratio", F.col("n_name"),
            d1=F.col("rev_cents").cast("double") / 100.0,
            d2=F.col("rev_cents").cast("double") / F.col("total_cents").cast("double"),
        )
    )

    # part='weighted' (A11)
    qty = F.col("l_quantity").cast("long")
    weighted = (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(cents(F.col("l_discount")) * qty).cast("double")
                / F.sum(qty).cast("double")
                / 100.0
            ).alias("_w")
        )
        .select(*_agg_row("weighted", F.col("l_returnflag"), d1=F.col("_w")))
    )

    # part='histogram' (A10)
    h = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    h_total = h.agg(F.sum("n").alias("total"))
    histogram = h.crossJoin(F.broadcast(h_total)).select(
        *_agg_row(
            "histogram", F.col("o_orderpriority"),
            i1=F.col("n"),
            d1=F.col("n").cast("double") / F.col("total").cast("double"),
        )
    )

    # part='unpivot' (A9) — real .unpivot over the wide conditional counts,
    # read from the SHARED events aggregate (same sums, zero extra scan)
    wide = ev_base.select(
        "user_id",
        F.col("_c").alias("clicks"),
        F.col("_p").alias("purchases"),
        F.col("_e").alias("errors"),
    )
    unpivot = wide.unpivot(["user_id"], ["clicks", "purchases", "errors"], "metric", "n").select(
        *_agg_row("unpivot", F.col("user_id"), k2=F.col("metric"), i1=F.col("n"))
    )

    return (
        conditional.unionByName(count_distinct)
        .unionByName(global_ratio)
        .unionByName(weighted)
        .unionByName(histogram)
        .unionByName(unpivot)
    )


# ---------------------------------------------------------------------------
# agg_pivot — A8: long->wide pivot (reference splits.py:8-23 per-slice
# boards). Kept standalone: the wide result is the point of the operator.
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
# z_agg_multilevel — multi-grain aggregation in one pass (z_ tier, beyond
# SURVEY): CUBE and ROLLUP over orders, explicit GROUPING SETS over
# lineitem, unioned with GROUPING() markers. At scale this replaces N
# separate scans+shuffles with one expand+aggregate (the reference computes
# player/team/overall boards as separate groupbys, situational.py:47-150).
# ---------------------------------------------------------------------------

_MULTI_ORACLE = """
SELECT 'cube' AS part, o_orderpriority AS g1, o_orderstatus AS g2,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS v
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
UNION ALL
SELECT 'rollup', o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT),
       COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
UNION ALL
SELECT 'gsets', l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT),
       COUNT(*),
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("z_agg_multilevel", _MULTI_ORACLE, tags=("agg",))
def z_agg_multilevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("v")
    cube = orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n"), rev
    ).select(
        F.lit("cube").alias("part"),
        F.col("o_orderpriority").alias("g1"), F.col("o_orderstatus").alias("g2"),
        F.col("gid").cast("long").alias("gid"), "n", "v",
    )
    rollup = orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n"), rev
    ).select(
        F.lit("rollup").alias("part"),
        F.col("o_orderpriority").alias("g1"), F.col("o_orderstatus").alias("g2"),
        F.col("gid").cast("long").alias("gid"), "n", "v",
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS part, l_returnflag AS g1, l_linestatus AS g2,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS v
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
    return cube.unionByName(rollup).unionByName(gsets)


# ---------------------------------------------------------------------------
# z_agg_order_stats — order-statistic extras (z_ tier, beyond SURVEY):
# exact interpolated quantiles per group (Spark `percentile` == DuckDB
# `quantile_cont` on integer-cents input) and the deterministic ordered
# collect (sort_array over structs — collect_list alone is
# partition-order-nondeterministic). At 100 TB the quantiles swap for
# approx_percentile (bound contract: agg_approx_bounds).
# ---------------------------------------------------------------------------

_ORDER_STATS_ORACLE = """
SELECT 'pct' AS part, event_type AS key, CAST(NULL AS VARCHAR) AS seq,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS d1,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS d2,
       CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS d3,
       CAST(NULL AS BIGINT) AS n
FROM events
GROUP BY event_type
UNION ALL
SELECT 'collect', CAST(user_id AS VARCHAR),
       array_to_string(list(event_type ORDER BY ts, event_id), '|'),
       NULL, NULL, NULL,
       COUNT(*)
FROM events
GROUP BY user_id
"""


@register("z_agg_order_stats", _ORDER_STATS_ORACLE, tags=("agg",))
def z_agg_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(CAST(ROUND(value*100) AS BIGINT), 0.5)").alias("d1"),
        F.expr("percentile(CAST(ROUND(value*100) AS BIGINT), 0.9)").alias("d2"),
        F.max(cents(F.col("value"))).cast("double").alias("d3"),
    ).select(
        F.lit("pct").alias("part"),
        F.col("event_type").alias("key"),
        F.lit(None).cast("string").alias("seq"),
        "d1", "d2", "d3",
        F.lit(None).cast("long").alias("n"),
    )
    packed = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    collect = ev.groupBy("user_id").agg(
        F.array_join(F.transform(packed, lambda s: s["event_type"]), "|").alias("seq"),
        F.count("*").alias("n"),
    ).select(
        F.lit("collect").alias("part"),
        F.col("user_id").cast("string").alias("key"),
        "seq",
        F.lit(None).cast("double").alias("d1"),
        F.lit(None).cast("double").alias("d2"),
        F.lit(None).cast("double").alias("d3"),
        "n",
    )
    return pct.unionByName(collect)

"""Window/ordered-computation queries (SURVEY.md §2.5 W1-W16, §2.6 O3/O4,
§2.2 P5 keep-last dedup) over the `events` and `customer` tables.

Each query exercises an operator from d3d_etl_spark.operators.windows with
the (partition, total order) discipline the PBP pipeline needs:
(user_id, ts, event_id) plays the role of (contest_id, play order, play_id).
Money values pass through exact cents so window sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from d3d_etl_spark.functions.math import clip
from d3d_etl_spark.functions.money import cents
from d3d_etl_spark.io import load_table
from d3d_etl_spark.operators import windows as W
from d3d_etl_spark.queries.registry import register

_EV_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"


def _events_window():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


# ---------------------------------------------------------------------------
# window_lag_lead — W1/W2 (reference main.py:61-66 score_before shift;
# batting.py:263-266 next-play runners)
# ---------------------------------------------------------------------------

_LAG_ORACLE = f"""
SELECT
  event_id, user_id, value,
  LAG(value)  OVER ({_EV_ORDER}) AS prev_value,
  LEAD(value) OVER ({_EV_ORDER}) AS next_value,
  LAG(event_type, 1, 'none') OVER ({_EV_ORDER}) AS prev_type
FROM events
"""


@register("window_lag_lead", _LAG_ORACLE, tags=("window",))
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    return ev.select(
        "event_id",
        "user_id",
        "value",
        W.lag_over(F.col("value"), w).alias("prev_value"),
        W.lead_over(F.col("value"), w).alias("next_value"),
        W.lag_over(F.col("event_type"), w, 1, "none").alias("prev_type"),
    )


# ---------------------------------------------------------------------------
# window_running_sum — W3: cumulative before/incl (reference columns.py:131-137)
# ---------------------------------------------------------------------------

_CUM_ORACLE = f"""
SELECT
  event_id, user_id,
  CAST(COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER ({_EV_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 100.0 AS cum_before,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER ({_EV_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS cum_incl
FROM events
"""


@register("window_running_sum", _CUM_ORACLE, tags=("window",), bench=True)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    vc = cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        (W.running_sum_before(vc, w).cast("double") / 100.0).alias("cum_before"),
        (W.running_sum(vc, w).cast("double") / 100.0).alias("cum_incl"),
    )


# ---------------------------------------------------------------------------
# window_reverse_sum — W6: current row to end of group (reference
# columns.py:219-232 runs_roi, label for the RE24 matrix)
# ---------------------------------------------------------------------------

_REV_ORACLE = f"""
SELECT
  event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER ({_EV_ORDER} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) / 100.0 AS value_rest
FROM events
"""


@register("window_reverse_sum", _REV_ORACLE, tags=("window",))
def window_reverse_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    return ev.select(
        "event_id",
        "user_id",
        (W.reverse_running_sum(cents(F.col("value")), w).cast("double") / 100.0).alias(
            "value_rest"
        ),
    )


# ---------------------------------------------------------------------------
# window_group_total — W5/W12: group total stamped per row + share
# (reference columns.py:206-216 runs_this_inn; calculator.py:171-174)
# ---------------------------------------------------------------------------

_TOTAL_ORACLE = """
SELECT
  event_id, user_id,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (PARTITION BY user_id) AS DOUBLE) / 100.0 AS user_total,
  CAST(CAST(ROUND(value*100) AS BIGINT) AS DOUBLE) / CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (PARTITION BY user_id) AS DOUBLE) AS value_share
FROM events
"""


@register("window_group_total", _TOTAL_ORACLE, tags=("window",))
def window_group_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vc = cents(F.col("value"))
    total = W.group_total(vc, ["user_id"])
    return ev.select(
        "event_id",
        "user_id",
        (total.cast("double") / 100.0).alias("user_total"),
        (vc.cast("double") / total.cast("double")).alias("value_share"),
    )


# ---------------------------------------------------------------------------
# window_first_last — W7/W15/W16/O4: first+latest row per key
# (reference columns.py:241-253 game flags; reconcile_players.py:476-478)
# ---------------------------------------------------------------------------

_FL_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_asc,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events
)
SELECT
  f.user_id,
  f.event_id AS first_event_id, f.event_type AS first_type,
  l.event_id AS last_event_id,  l.event_type AS last_type
FROM (SELECT * FROM ranked WHERE rn_asc = 1) f
JOIN (SELECT * FROM ranked WHERE rn_desc = 1) l USING (user_id)
"""


@register("window_first_last", _FL_ORACLE, tags=("window",))
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_asc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        W.row_number_over(w_asc).alias("rn_asc"),
        W.latest_per_key(w_desc).alias("rn_desc"),
    )
    first = ranked.where("rn_asc = 1").select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_type"),
    )
    last = ranked.where("rn_desc = 1").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
    )
    return first.join(last, "user_id")


# ---------------------------------------------------------------------------
# window_rolling — W10: rolling mean over last n rows with pandas min-periods
# null semantics + offset compare (reference leaderboards/rolling.py:19-43)
# ---------------------------------------------------------------------------

_ROLL_N = 5

_ROLL_ORACLE = f"""
SELECT
  event_id, user_id,
  CASE WHEN COUNT(*) OVER ({_EV_ORDER} ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW) = {_ROLL_N}
       THEN CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER ({_EV_ORDER} ROWS BETWEEN {_ROLL_N - 1} PRECEDING AND CURRENT ROW) AS DOUBLE) / {_ROLL_N} / 100.0
  END AS roll_mean,
  CASE WHEN COUNT(*) OVER ({_EV_ORDER} ROWS BETWEEN {2 * _ROLL_N - 1} PRECEDING AND {_ROLL_N} PRECEDING) = {_ROLL_N}
       THEN CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER ({_EV_ORDER} ROWS BETWEEN {2 * _ROLL_N - 1} PRECEDING AND {_ROLL_N} PRECEDING) AS DOUBLE) / {_ROLL_N} / 100.0
  END AS roll_mean_prev
FROM events
"""


@register("window_rolling", _ROLL_ORACLE, tags=("window",), bench=True)
def window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    vc = cents(F.col("value"))
    s, c = W.rolling_sum_minp(vc, w, _ROLL_N)
    # offset window: the same n-frame ending n rows earlier (pandas shift(n))
    prev_frame = w.rowsBetween(-(2 * _ROLL_N - 1), -_ROLL_N)
    s_prev = F.sum(vc).over(prev_frame)
    c_prev = F.count(vc).over(prev_frame)
    return ev.select(
        "event_id",
        "user_id",
        F.when(c == _ROLL_N, s.cast("double") / _ROLL_N / 100.0).alias("roll_mean"),
        F.when(c_prev == _ROLL_N, s_prev.cast("double") / _ROLL_N / 100.0).alias(
            "roll_mean_prev"
        ),
    )


# ---------------------------------------------------------------------------
# window_ffill — W9: grouped ffill then bfill of a sparse column
# (reference helpers.py:131-139 bat_order propagation)
# ---------------------------------------------------------------------------

_FFILL_ORACLE = f"""
SELECT
  event_id, user_id,
  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER ({_EV_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value,
  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER ({_EV_ORDER} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_value
FROM events
"""


@register("window_ffill", _FFILL_ORACLE, tags=("window",))
def window_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        W.ffill(sparse, w).alias("last_purchase_value"),
        W.bfill(sparse, w).alias("next_purchase_value"),
    )


# ---------------------------------------------------------------------------
# window_zscore — W13: z-score within group, clipped ±3, from exact moments
# (reference sos_utils.py:83-89)
# ---------------------------------------------------------------------------

_Z_ORACLE = """
WITH stats AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c,
         SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) OVER (PARTITION BY c_nationkey) AS s1,
         SUM(CAST(ROUND(c_acctbal*100) AS BIGINT) * CAST(ROUND(c_acctbal*100) AS BIGINT)) OVER (PARTITION BY c_nationkey) AS s2,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
)
SELECT
  c_custkey, c_nationkey,
  GREATEST(-3.0, LEAST(3.0,
    (CAST(bal_c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
      / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))
  )) AS bal_z
FROM stats
WHERE n >= 2
"""


@register("window_zscore", _Z_ORACLE, tags=("window",))
def window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_c = cents(F.col("c_acctbal"))
    s1, s2, n = W.zscore_stats(bal_c, ["c_nationkey"])
    z = W.zscore_from_stats(bal_c, s1, s2, n)
    return (
        cust.select("c_custkey", "c_nationkey", clip(z, -3.0, 3.0).alias("bal_z"), n.alias("n"))
        .where(F.col("n") >= 2)
        .select("c_custkey", "c_nationkey", "bal_z")
    )


# ---------------------------------------------------------------------------
# window_rescale — W14: rescale group values so each group total hits a target
# (reference sos_utils.py:93-105 SoS-adjusted WAR rescale)
# ---------------------------------------------------------------------------

_RESCALE_ORACLE = """
WITH g AS (
  SELECT s_suppkey, s_nationkey,
         CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c,
         SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) OVER (PARTITION BY s_nationkey) AS grp_c,
         COUNT(DISTINCT s_nationkey) OVER () AS n_groups,
         SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) OVER () AS global_c
  FROM supplier
)
SELECT
  s_suppkey,
  CAST(bal_c AS DOUBLE) * (CAST(global_c AS DOUBLE) / n_groups) / CAST(grp_c AS DOUBLE) / 100.0 AS scaled_bal
FROM g
"""


@register("window_rescale", _RESCALE_ORACLE, tags=("window",))
def window_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    bal_c = cents(F.col("s_acctbal"))
    w_all = Window.partitionBy()
    grp_c = W.group_total(bal_c, ["s_nationkey"])
    global_c = F.sum(bal_c).over(w_all)
    n_groups = F.size(F.collect_set("s_nationkey").over(w_all))
    return supp.select(
        "s_suppkey",
        (
            bal_c.cast("double")
            * (global_c.cast("double") / n_groups)
            / grp_c.cast("double")
            / 100.0
        ).alias("scaled_bal"),
    )


# ---------------------------------------------------------------------------
# window_cumcount_mod — W8: ordered cumcount + modular slot
# (reference helpers.py:119-128 bat_order = ((pa_idx-1) % 9) + 1)
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
SELECT
  event_id, user_id,
  ROW_NUMBER() OVER ({_EV_ORDER}) AS seq,
  CAST((ROW_NUMBER() OVER ({_EV_ORDER}) - 1) % 9 + 1 AS BIGINT) AS slot
FROM events
"""


@register("window_cumcount_mod", _CC_ORACLE, tags=("window",))
def window_cumcount_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    rn = W.row_number_over(w)
    return ev.select(
        "event_id",
        "user_id",
        rn.cast("long").alias("seq"),
        ((rn - 1) % 9 + 1).cast("long").alias("slot"),
    )


# ---------------------------------------------------------------------------
# dedup_keep_last — P5 keep="last": latest row per composite key
# (reference leaderboards/main.py:191-194; collect_schedules.py:168)
# ---------------------------------------------------------------------------

_KEEP_LAST_ORACLE = """
SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("dedup_keep_last", _KEEP_LAST_ORACLE, tags=("dedup", "window"))
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", W.latest_per_key(w))
        .where("rn = 1")
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
    )


# ---------------------------------------------------------------------------
# topk_per_group — O3: deterministic top-k per group (reference
# process.extractOne top-1-by-score, map_ncaa_to_cube.py:169-173)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
"""


@register("topk_per_group", _TOPK_ORACLE, tags=("topk", "window"))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where("rn <= 3")
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# window_segmented_sum — W4: running sum within segments delimited by marker
# rows (reference columns.py:144-159: score accumulation across game
# segments delimited by lagged game_end flags — segment key = running count
# of boundaries, then a running sum per (key, segment))
# ---------------------------------------------------------------------------

_SEG_ORACLE = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS boundary
  FROM events
),
seg AS (
  SELECT *,
         CAST(SUM(boundary) OVER ({_EV_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
  FROM flagged
)
SELECT event_id, user_id, segment_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
         PARTITION BY user_id, segment_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS seg_running_value
FROM seg
"""


@register("window_segmented_sum", _SEG_ORACLE, tags=("window",))
def window_segmented_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _events_window()
    boundary = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    seg_id = F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
    with_seg = ev.withColumn("segment_id", seg_id)
    w_seg = Window.partitionBy("user_id", "segment_id").orderBy("ts", "event_id")
    return with_seg.select(
        "event_id",
        "user_id",
        "segment_id",
        (W.running_sum(cents(F.col("value")), w_seg).cast("double") / 100.0).alias(
            "seg_running_value"
        ),
    )


# ---------------------------------------------------------------------------
# window_range_days — RANGE frame over a date axis: 30-day trailing revenue
# per customer. The rows-based frames above (W10) count rows; a range frame
# bounds by VALUE distance, so same-day orders are frame peers and gaps in
# the date axis shrink the window — the shape used for time-decayed rolling
# metrics at scale (one shuffle on the partition key, no self-join).
# ---------------------------------------------------------------------------

_RANGE_DAYS = 30

_RANGE_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dnum,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
)
SELECT o_orderkey, o_custkey,
       CAST(SUM(pc) OVER w AS DOUBLE) / 100.0 AS rev_30d,
       COUNT(*) OVER w AS n_orders_30d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY dnum
             RANGE BETWEEN {_RANGE_DAYS} PRECEDING AND CURRENT ROW)
"""


@register("window_range_days", _RANGE_ORACLE, tags=("window",))
def window_range_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("dnum"),
        cents(F.col("o_totalprice")).alias("pc"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("dnum")
        .rangeBetween(-_RANGE_DAYS, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum("pc").over(w).cast("double") / 100.0).alias("rev_30d"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


# ---------------------------------------------------------------------------
# window_rank_family — the complete ranking-function surface over one
# deterministic total order (cents desc, key asc): rank, dense_rank,
# percent_rank, cume_dist, ntile. All JVM-native window evaluation over a
# single sort per partition — one shuffle on the partition key.
# ---------------------------------------------------------------------------

_RANKF_ORACLE = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_custkey < 100
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
)
"""


@register("window_rank_family", _RANKF_ORACLE, tags=("window",))
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        cents(F.col("o_totalprice")).desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )

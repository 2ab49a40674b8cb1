"""Scalar-function surface (SURVEY.md §2.9 T1-T9/D1-D3/M1-M5, §2.2 P10,
§2.7 set ops).

Everything here is a pure Catalyst expression (whole-stage codegen, no UDFs,
no shuffle beyond the final exchange) — the reference does all of it with
row-wise pandas string/number ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.math import clip, ip_to_innings, ip_to_thirds, safe_div, thirds_to_ip
from d3d_etl_spark.functions.money import cents
from d3d_etl_spark.functions.strings import hash_id, md5_int, normalize_name
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

# ---------------------------------------------------------------------------
# string_normalize — T4/T5: lower/strip/extract/flip (reference
# names/helpers.py:6-19 "Last, First" flip + normalize_name)
# ---------------------------------------------------------------------------

_STR_ORACLE = """
SELECT
  p_partkey,
  lower(trim(regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))) AS norm_name,
  regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
  regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
  regexp_extract(p_name, '(\\w+)$', 1) || ', ' || regexp_extract(p_name, '^(\\w+)', 1) AS keyed_name,
  trim(regexp_extract(regexp_extract(p_name, '(\\w+)$', 1) || ', ' || regexp_extract(p_name, '^(\\w+)', 1), ',(.*)$', 1))
    || ' ' ||
  trim(regexp_extract(regexp_extract(p_name, '(\\w+)$', 1) || ', ' || regexp_extract(p_name, '^(\\w+)', 1), '^([^,]+),', 1)) AS unflipped
FROM part
"""


@register("string_normalize", _STR_ORACLE, tags=("string",))
def string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.functions.strings import flip_last_first

    part = load_table(spark, sf_dir, "part")
    first_word = F.regexp_extract("p_name", r"^(\w+)", 1)
    last_word = F.regexp_extract("p_name", r"(\w+)$", 1)
    keyed = F.concat(last_word, F.lit(", "), first_word)
    return part.select(
        "p_partkey",
        normalize_name(F.col("p_name")).alias("norm_name"),
        first_word.alias("first_word"),
        last_word.alias("last_word"),
        keyed.alias("keyed_name"),
        flip_last_first(keyed).alias("unflipped"),
    )


# ---------------------------------------------------------------------------
# regex_classify — T1: priority-ordered regex classifier (reference
# pbp_parser/columns.py:532-619: 26 event types where rule ORDER is semantics)
# ---------------------------------------------------------------------------

_CLASSIFY_ORACLE = r"""
SELECT
  doc_id,
  CASE
    WHEN regexp_matches(text, '\bvector\b') AND regexp_matches(text, '\bjoin\b') THEN 'vector_join'
    WHEN regexp_matches(text, '\bvector\b') THEN 'vector'
    WHEN regexp_matches(text, '\bstream\b') THEN 'streaming'
    WHEN regexp_matches(text, '\bspark\b')  THEN 'spark'
    WHEN regexp_matches(text, '\b(join|merge)\b') THEN 'join'
    ELSE 'other'
  END AS doc_class
FROM documents
"""


@register("regex_classify", _CLASSIFY_ORACLE, tags=("string", "regex"))
def regex_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # Order is semantics — mirrors the reference's priority cascade.
    doc_class = (
        F.when(t.rlike(r"\bvector\b") & t.rlike(r"\bjoin\b"), "vector_join")
        .when(t.rlike(r"\bvector\b"), "vector")
        .when(t.rlike(r"\bstream\b"), "streaming")
        .when(t.rlike(r"\bspark\b"), "spark")
        .when(t.rlike(r"\b(join|merge)\b"), "join")
        .otherwise("other")
    )
    return docs.select("doc_id", doc_class.alias("doc_class"))


# ---------------------------------------------------------------------------
# regex_count_extract — T2/T3: match counting + group extraction (reference
# columns.py:179-203 "scored" counting; regexes.py:174-188 name extraction)
# ---------------------------------------------------------------------------

_RCE_ORACLE = r"""
SELECT
  doc_id,
  len(regexp_extract_all(text, '\bagg\b'))         AS n_agg,
  len(regexp_extract_all(text, '\b(scan|sort)\b')) AS n_scan_sort,
  regexp_extract(text, '^(\w+) (\w+)', 2)          AS second_word
FROM documents
"""


@register("regex_count_extract", _RCE_ORACLE, tags=("string", "regex"))
def regex_count_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"\bagg\b")).cast("long").alias("n_agg"),
        F.regexp_count(t, F.lit(r"\b(scan|sort)\b")).cast("long").alias("n_scan_sort"),
        F.regexp_extract(t, r"^(\w+) (\w+)", 2).alias("second_word"),
    )


# ---------------------------------------------------------------------------
# hash_ids — T8: salted 16-hex ids + portable 32-bit bucket hash (reference
# scripts/hash_player_ids.py:11-38)
# ---------------------------------------------------------------------------

_HASH_ORACLE = """
SELECT
  c_custkey,
  substr(sha256('d3d:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS hashed_id,
  ('0x' || substr(md5(c_name), 1, 8))::BIGINT AS name_bucket_hash,
  ('0x' || substr(md5(c_name), 1, 8))::BIGINT % 1024 AS bucket
FROM customer
"""


@register("hash_ids", _HASH_ORACLE, tags=("string", "hash"))
def hash_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    h = md5_int(F.col("c_name"))
    return cust.select(
        "c_custkey",
        hash_id(F.col("c_custkey")).alias("hashed_id"),
        h.alias("name_bucket_hash"),
        (h % 1024).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# date_funcs — D1/D2: date parse/extract + max-watermark + day arithmetic
# (reference collect_schedules.py:90-98 resume-by-watermark)
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT
  o_custkey,
  CAST(MAX(o_orderdate) AS DATE)     AS last_order_date,
  CAST(MAX(o_orderdate) AS DATE) + 1 AS resume_date,
  CAST(year(MAX(o_orderdate)) AS BIGINT)  AS last_year,
  COUNT(DISTINCT year(o_orderdate)) AS n_years,
  COUNT(DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)) AS n_months
FROM orders
GROUP BY o_custkey
"""


@register("date_funcs", _DATE_ORACLE, tags=("date",))
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    max_d = F.max(F.col("o_orderdate")).cast("date")
    return orders.groupBy("o_custkey").agg(
        max_d.alias("last_order_date"),
        F.date_add(max_d, 1).alias("resume_date"),
        F.year(F.max("o_orderdate")).cast("long").alias("last_year"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        F.countDistinct(F.trunc("o_orderdate", "month")).alias("n_months"),
    )


# ---------------------------------------------------------------------------
# cast_coerce — P10: to_numeric(errors="coerce") parity via try_cast +
# JSON field extraction (reference leaderboards/main.py:197-205; S10 JSON)
# ---------------------------------------------------------------------------

_CAST_ORACLE = """
SELECT
  event_id,
  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
  TRY_CAST(event_type AS DOUBLE) AS bad_num,
  TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
FROM events
"""


@register("cast_coerce", _CAST_ORACLE, tags=("cast",))
def cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_val"),
        F.col("event_type").try_cast("double").alias("bad_num"),
        F.get_json_object("props", "$.missing").try_cast("long").alias("missing_val"),
    )


# ---------------------------------------------------------------------------
# set ops — U1-U4 (reference concat/set-difference/overlap idioms)
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_union_distinct", _UNION_ORACLE, tags=("setop",))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("custkey"))
    o = orders.where("o_orderstatus = 'O'").select(F.col("o_custkey").alias("custkey"))
    return f.unionByName(o).distinct()


_EXCEPT_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_except", _EXCEPT_ORACLE, tags=("setop",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("custkey"))
    o = orders.where("o_orderstatus = 'O'").select(F.col("o_custkey").alias("custkey"))
    return f.distinct().exceptAll(o.distinct())


_INTERSECT_ORACLE = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register("set_intersect", _INTERSECT_ORACLE, tags=("setop",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("custkey"))
    p = orders.where("o_orderstatus = 'P'").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(p)


# ---------------------------------------------------------------------------
# math_funcs — M1-M5: safe divide, clip, round, innings codec, signum
# (reference common.py:5-36, sos_utils.py:89-91, get_er_matrix.py:26-27)
# ---------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  CAST(CAST(l_quantity AS BIGINT) // 3 AS VARCHAR) || '.' || CAST(CAST(l_quantity AS BIGINT) % 3 AS VARCHAR) AS ip_str,
  CAST(l_quantity AS BIGINT) AS thirds_roundtrip,
  CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) / 3.0 AS innings,
  CASE WHEN CAST(l_quantity AS BIGINT) != 0
       THEN CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / CAST(l_quantity AS BIGINT)
       ELSE 0.0 END AS rate_cents_per_unit,
  GREATEST(5.0, LEAST(40.0, l_quantity)) AS qty_clipped,
  ROUND(CAST(ROUND(l_discount * 100) AS BIGINT) * CAST(l_quantity AS BIGINT) / 100.0, 2) AS disc_qty,
  CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign
FROM lineitem
"""


@register("math_funcs", _MATH_ORACLE, tags=("math",))
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    ip_str = thirds_to_ip(qty)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ip_str.alias("ip_str"),
        ip_to_thirds(ip_str).alias("thirds_roundtrip"),
        ip_to_innings(ip_str).alias("innings"),
        safe_div(cents(F.col("l_extendedprice")).cast("double"), qty, 0.0).alias(
            "rate_cents_per_unit"
        ),
        clip(F.col("l_quantity"), 5.0, 40.0).alias("qty_clipped"),
        F.round(cents(F.col("l_discount")) * qty / 100.0, 2).alias("disc_qty"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )

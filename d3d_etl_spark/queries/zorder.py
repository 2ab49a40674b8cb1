"""z_io_zorder — Z-order (Morton) clustering for multi-dimensional data
skipping: the lakehouse OPTIMIZE-ZORDER technique, engine-native.

A table range-partitioned by time alone skips beautifully on time
predicates and not at all on user predicates — every time slice spans
every user. Interleaving the bits of the two dimensions into one Morton
key and range-bucketing ON THE KEY gives files/buckets that are small
RECTANGLES in (time, user) space: a prefix of 2k Morton bits fixes k bits
of EACH dimension, so every bucket's min/max span is ~1/2^k of BOTH
ranges and predicates on either dimension (or both) prune buckets by
their min/max stats. This query publishes exactly those per-bucket
skipping stats — (bucket, n_events, min/max of each raw dimension) — so
the rectangle property itself is inside the driver hash, and
tests/test_zorder_r5.py pins the skipping advantage quantitatively
against time-only bucketing.

Determinism: grid coordinates are exact integer affine maps of the raw
values (scaled by the global min/max, integer division), the interleave
is pure bit arithmetic, and the bucket is the Morton-key prefix — every
step has a verbatim SQL twin. Scale shape: two global min/max scalars
(broadcast), then one map pass; at write time the same key feeds
repartitionByRange + sortWithinPartitions and the parquet min/max stats
do the pruning for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

_Z_BITS = 16        # grid resolution per dimension
_Z_BUCKET_BITS = 6  # bucket = top 6 Morton bits -> <= 64 quadtree cells


def morton_interleave(xg: Column, yg: Column, bits: int = _Z_BITS) -> Column:
    """Interleave two `bits`-bit grid coordinates into one Morton key:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure JVM bit
    arithmetic (codegen-friendly sum of shift/mask terms)."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc + F.shiftleft(
            F.shiftright(xg, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("long")
        acc = acc + F.shiftleft(
            F.shiftright(yg, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("long")
    return acc


def _sql_morton(xg: str, yg: str, bits: int = _Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xg} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yg} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_GRID_MAX = (1 << _Z_BITS) - 1

_ZORDER_ORACLE = f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, user_id FROM events
),
b AS (
  SELECT MIN(us) AS min_us, MAX(us) AS max_us,
         MIN(user_id) AS min_u, MAX(user_id) AS max_u
  FROM e
),
g AS (
  SELECT e.us, e.user_id,
         ((e.us - b.min_us) * {_GRID_MAX}) // GREATEST(b.max_us - b.min_us, 1) AS xg,
         ((e.user_id - b.min_u) * {_GRID_MAX}) // GREATEST(b.max_u - b.min_u, 1) AS yg
  FROM e CROSS JOIN b
),
z AS (
  SELECT us, user_id,
         ({_sql_morton('xg', 'yg')}) >> {2 * _Z_BITS - _Z_BUCKET_BITS} AS bucket
  FROM g
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS min_us,
       CAST(MAX(us) AS BIGINT) AS max_us,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user
FROM z GROUP BY bucket
"""


def zorder_buckets(
    ev: DataFrame, us_col: Column, user_col: Column
) -> DataFrame:
    """(us, user_id, bucket): Morton-prefix bucket assignment for every
    row — the clustering key a write path would range-partition on."""
    b = ev.agg(
        F.min(us_col).alias("min_us"),
        F.max(us_col).alias("max_us"),
        F.min(user_col).alias("min_u"),
        F.max(user_col).alias("max_u"),
    )
    g = ev.select(us_col.alias("us"), user_col.alias("user_id")).crossJoin(
        F.broadcast(b)
    )
    xg = F.expr(f"((us - min_us) * {_GRID_MAX}) div greatest(max_us - min_us, 1)")
    yg = F.expr(f"((user_id - min_u) * {_GRID_MAX}) div greatest(max_u - min_u, 1)")
    z = morton_interleave(xg, yg)
    return g.select(
        "us",
        "user_id",
        F.shiftright(z, 2 * _Z_BITS - _Z_BUCKET_BITS).alias("bucket"),
    )


@register("z_io_zorder", _ZORDER_ORACLE, tags=("io", "layout"))
def z_io_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering stats over events: per Morton-prefix bucket, the
    row count and both dimensions' min/max — the data-skipping rectangles.
    Beyond-reference operator (lakehouse OPTIMIZE ZORDER shape)."""
    ev = load_table(spark, sf_dir, "events")
    z = zorder_buckets(ev, F.unix_micros(F.col("ts")), F.col("user_id"))
    return z.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
        F.min("user_id").cast("long").alias("min_user"),
        F.max("user_id").cast("long").alias("max_user"),
    )

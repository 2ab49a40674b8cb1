"""Approximate-aggregate error bounds.

At 100 TB, exact count-distinct and exact percentiles are shuffle-heavy
(distinct = full repartition on the value; exact percentile = sort); the
scale path is sketches: HyperLogLog++ (`approx_count_distinct`,
`hll_sketch_agg`) and KLL/GK quantiles (`percentile_approx`). These are
approximate BUT carry documented error bounds — these tests pin the bounds
so the engine can advertise them as contracts:

- approx_count_distinct(rsd): relative standard deviation <= rsd; we assert
  observed error < 4*rsd (deterministic for fixed data + implementation).
- percentile_approx(accuracy): rank error <= 1/accuracy; we assert the
  returned value lies between the exact quantiles at p +/- 1/accuracy.
- hll_sketch_agg sketches MERGE losslessly: the union of per-group sketches
  must estimate the global cardinality with the same error bound — the
  property that makes pre-aggregated sketch columns composable across
  partitions/days at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from d3d_etl_spark.io import load_table


def test_approx_count_distinct_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd).alias("approx"),
    ).collect()[0]
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 4 * rsd, (row["exact"], row["approx"], rel_err)


def test_percentile_approx_rank_bound(spark, sf_dir):
    """The GK-sketch guarantee is in RANK space: the returned element's rank
    is within eps*n of p*n (it IS a data element, so value-space comparisons
    against interpolated quantiles don't apply)."""
    li = load_table(spark, sf_dir, "lineitem")
    accuracy = 1000
    eps = 1.0 / accuracy
    ps = (0.25, 0.5, 0.9)
    approx = li.agg(
        *[F.percentile_approx("l_extendedprice", p, accuracy).alias(f"p{i}") for i, p in enumerate(ps)]
    ).collect()[0]
    n = li.count()
    for i, p in enumerate(ps):
        v = approx[f"p{i}"]
        ranks = li.agg(
            F.sum((F.col("l_extendedprice") < v).cast("long")).alias("below"),
            F.sum((F.col("l_extendedprice") <= v).cast("long")).alias("at_or_below"),
        ).collect()[0]
        # rank interval covered by v must intersect [p-eps, p+eps]
        assert ranks["below"] / n <= p + eps, (p, v, ranks["below"] / n)
        assert ranks["at_or_below"] / n >= p - eps, (p, v, ranks["at_or_below"] / n)


def test_hll_sketch_merge_composes(spark, sf_dir):
    """Per-group sketches unioned == global estimate (within HLL bounds):
    the pre-aggregation pattern for 100 TB rollups (store a sketch column
    per partition, merge at query time — never re-scan raw data)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = li.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    assert abs(merged - exact) / exact < 0.05, (merged, exact)

    # direct global sketch agrees with the merged one (same algorithm state)
    direct = li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey"))).collect()[0][0]
    assert abs(direct - merged) / exact < 0.02

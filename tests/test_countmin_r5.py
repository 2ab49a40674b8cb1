"""Count-min sketch contracts (z_corpus_countmin): the deterministic
overestimate guarantee over EVERY token (not just the published top-k),
the eN/W error envelope, and shard mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sketch_parts(spark, sf_dir):
    from d3d_etl_spark.functions.strings import md5_int
    from d3d_etl_spark.functions.text import tokens
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries.textops import _CM_D, _CM_W

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("true_c"))
        .localCheckpoint()
    )
    hashed = tc.select(
        "tok",
        "true_c",
        F.explode(F.array(*[F.lit(d) for d in range(_CM_D)])).alias("d"),
    ).withColumn(
        "w",
        F.pmod(
            md5_int(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("tok"))),
            F.lit(_CM_W),
        ),
    )
    counters = hashed.groupBy("d", "w").agg(F.sum("true_c").alias("cnt"))
    return tc, hashed, counters


def test_countmin_never_underestimates(spark, sf_dir):
    """est(tok) >= true(tok) for EVERY token in the vocabulary — the CM
    guarantee is deterministic, not probabilistic."""
    tc, hashed, counters = _sketch_parts(spark, sf_dir)
    est = (
        hashed.join(F.broadcast(counters), ["d", "w"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_c"), F.first("true_c").alias("true_c"))
    )
    under = est.where(F.col("est_c") < F.col("true_c")).count()
    assert under == 0


def test_countmin_error_envelope(spark, sf_dir):
    """Mean overestimate across the vocabulary stays within a few eN/W —
    the expected-collision-mass bound (per-row expected error N/W; the
    min over D rows only helps)."""
    import math

    from d3d_etl_spark.queries.textops import _CM_W

    tc, hashed, counters = _sketch_parts(spark, sf_dir)
    est = (
        hashed.join(F.broadcast(counters), ["d", "w"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_c"), F.first("true_c").alias("true_c"))
    )
    row = est.agg(
        F.avg(F.col("est_c") - F.col("true_c")).alias("mean_err"),
        F.sum("true_c").alias("n"),
    ).collect()[0]
    assert row.mean_err <= math.e * row.n / _CM_W, (row.mean_err, row.n)


def test_countmin_counters_merge_across_shards(spark, sf_dir):
    """Mergeability — the property that makes CM a SKETCH: counters built
    per shard and ADDED equal counters built over the whole corpus."""
    from d3d_etl_spark.functions.strings import md5_int
    from d3d_etl_spark.functions.text import tokens
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries.textops import _CM_D, _CM_W

    docs = load_table(spark, sf_dir, "documents")

    def counters_of(d):
        ex = d.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        h = ex.select(
            "tok", F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("d")
        ).withColumn(
            "w",
            F.pmod(
                md5_int(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("tok"))),
                F.lit(_CM_W),
            ),
        )
        return h.groupBy("d", "w").agg(F.count("*").alias("cnt"))

    full = {(r.d, r.w): r.cnt for r in counters_of(docs).collect()}
    s0 = counters_of(docs.where(F.col("doc_id") % 2 == 0)).collect()
    s1 = counters_of(docs.where(F.col("doc_id") % 2 == 1)).collect()
    merged: dict = {}
    for rows in (s0, s1):
        for r in rows:
            merged[(r.d, r.w)] = merged.get((r.d, r.w), 0) + r.cnt
    assert merged == full

"""Property-based tests (hypothesis) for algebraic invariants the engine's
determinism contract relies on. Spark jobs are slow per example, so
max_examples is kept small and each example batches many rows."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from d3d_etl_spark.functions.math import ip_to_thirds, thirds_to_ip

_SETTINGS = dict(max_examples=5, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=50))
def test_ip_codec_roundtrip_property(spark, thirds):
    df = spark.createDataFrame([(t,) for t in thirds], "t long")
    rows = df.select(
        "t", ip_to_thirds(thirds_to_ip(F.col("t"))).alias("rt")
    ).collect()
    assert all(r["t"] == r["rt"] for r in rows)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
                 min_size=1, max_size=30),
        min_size=1, max_size=8,
    )
)
def test_simhash_order_invariant(spark, docs):
    """SimHash depends on the token multiset, not token order."""
    from d3d_etl_spark.operators.dedup import simhash_signatures
    from d3d_etl_spark.functions.text import tokens

    fwd = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    rev = [(i, " ".join(reversed(toks))) for i, toks in enumerate(docs)]
    out = {}
    for tag, rows in (("fwd", fwd), ("rev", rev)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sig = simhash_signatures(df, "doc_id", tokens(F.col("text")), bits=16)
        out[tag] = {r["doc"]: r["simhash"] for r in sig.collect()}
    assert out["fwd"] == out["rev"]


@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=12),
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=1, max_size=12),
)
def test_minhash_union_property(spark, set_a, set_b):
    """Minhash of a union is the elementwise min of the parts' signatures —
    the exact algebraic property LSH banding relies on."""
    from d3d_etl_spark.operators.dedup import minhash_signatures

    rows = (
        [(0, s) for s in set(set_a)]
        + [(1, s) for s in set(set_b)]
        + [(2, s) for s in set(set_a) | set(set_b)]
    )
    df = spark.createDataFrame(rows, "doc long, shingle string")
    sigs = {
        r["doc"]: [r[f"sig{j}"] for j in range(4)]
        for r in minhash_signatures(df, n_hashes=4).collect()
    }
    assert sigs[2] == [min(a, b) for a, b in zip(sigs[0], sigs[1])]


@settings(**_SETTINGS)
@given(
    st.lists(  # left rows: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25
    ),
    st.lists(  # right rows: (key, ts, rid)
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
        min_size=0, max_size=25,
    ),
)
def test_asof_join_matches_naive(spark, lrows, rrows):
    """asof_join == per-row naive scan: latest right (ts <= left ts) on the
    key, ties by max rid."""
    from d3d_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(rrows, "k long, rt long, rid long") if rrows else (
        spark.createDataFrame([], "k long, rt long, rid long")
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_cols=["rid"], tie_col="rid",
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, rid) for (rk, rt, rid) in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"lid {i}: got {got[i]} want {want}"


@settings(**_SETTINGS)
@given(
    st.lists(  # intervals: (key, lo, span)
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 12)),
        min_size=1, max_size=15,
    ),
    st.lists(  # right values: (key, v)
        st.tuples(st.integers(0, 2), st.integers(0, 45)), min_size=0, max_size=25
    ),
    st.integers(1, 9),  # bin width — correctness must not depend on it
)
def test_binned_range_join_matches_naive(spark, intervals, values, width):
    from d3d_etl_spark.operators.joins import binned_range_join

    left = spark.createDataFrame(
        [(i, k, lo, lo + span) for i, (k, lo, span) in enumerate(intervals)],
        "iid long, k long, lo long, hi long",
    )
    right = spark.createDataFrame(values, "k long, v long") if values else (
        spark.createDataFrame([], "k long, v long")
    )
    got = sorted(
        (r["iid"], r["v"])
        for r in binned_range_join(
            left, right, on=["k"], left_lo="lo", left_hi="hi",
            right_val="v", bin_width=width,
        ).collect()
    )
    want = sorted(
        (i, v)
        for i, (k, lo, span) in enumerate(intervals)
        for (rk, v) in values
        if rk == k and lo <= v <= lo + span
    )
    assert got == want


# --- sampling threshold properties (pure python, no Spark) -----------------


@given(
    st.lists(
        st.tuples(st.text("ab", min_size=1, max_size=3), st.floats(0.001, 100.0)),
        min_size=1,
        max_size=8,
    )
)
def test_split_thresholds_cover_and_order(weights):
    from d3d_etl_spark.functions.sampling import _HASH_CARD, _thresholds

    th = _thresholds(weights)
    bounds = [b for _, b in th]
    assert bounds[-1] == _HASH_CARD  # total coverage: no key unassigned
    assert all(b1 <= b2 for b1, b2 in zip(bounds, bounds[1:]))  # cascade order
    # each slice is proportional to its normalized weight (within rounding)
    total = sum(w for _, w in weights)
    prev = 0
    for (_, w), b in zip(weights, bounds):
        want = w / total * _HASH_CARD
        assert abs((b - prev) - want) <= len(weights) + 1
        prev = b


@pytest.mark.slow
def test_connected_components_log_rounds_on_chain(spark):
    """Worst case for label propagation: a path graph, where min-label
    flooding needs DIAMETER rounds (a 10k-chain would exceed max_iter and
    silently truncate). The alternating large-star/small-star rounds must
    converge in ~log2(n) rounds with the correct min-id components —
    boilerplate/template near-dup chains in web corpora are exactly this
    shape."""
    import math

    import d3d_etl_spark.operators.dedup as dd

    n = 10_000
    edges = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    comp = dd.connected_components(edges, driver_threshold=0)
    # one component rooted at 0, every node present exactly once
    assert comp.count() == n
    assert comp.where("component != 0").count() == 0
    bound = 2 * math.ceil(math.log2(n)) + 2
    assert dd.last_cc_rounds <= bound, (
        f"star rounds {dd.last_cc_rounds} > O(log n) bound {bound}"
    )


def test_serpentine_rank_two_level_equals_naive(spark):
    """The range-bucketed two-level global rank behind z_corpus_shard_balance
    must equal a naive single-window rank for ANY token-count multiset —
    including heavy ties and skewed distributions. Randomized multisets with
    a fixed seed; failure would mean the cross-bucket strict-order argument
    (bucket = n div B) is broken."""
    import random

    from pyspark.sql import Window

    rng = random.Random(11)
    for trial in range(3):
        rows = [
            (i, rng.choice([0, 1, 7, 8, 9, 15, 16, 40, rng.randint(0, 100)]))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        naive = {
            r.doc_id: r.rk
            for r in df.withColumn(
                "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("doc_id")))
            ).collect()
        }
        b = df.withColumn("bucket", F.expr("n div 8"))
        w_in = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("doc_id"))
        within = b.withColumn("rn_in", F.row_number().over(w_in))
        counts = b.groupBy("bucket").agg(F.count("*").alias("bcount"))
        w_b = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn(
            "offset", F.coalesce(F.sum("bcount").over(w_b), F.lit(0))
        ).select("bucket", "offset")
        two_level = {
            r.doc_id: r.rk
            for r in within.join(offsets, "bucket")
            .withColumn("rk", F.col("offset") + F.col("rn_in"))
            .collect()
        }
        assert two_level == naive, trial


def test_queries_invariant_to_shuffle_partitioning(spark):
    """Whole-query repartition invariance: the determinism contract says
    results are identical under ANY partitioning (exact-integer sums,
    quantization-before-aggregation, total-order windows). Run the most
    partition-sensitive queries — distributed prefix sums, two-level global
    rank, MinHash banding, fold-order cosine sims, integer-quantized
    gradients — under 3 and 32 shuffle partitions and compare the full
    result sets value-for-value."""
    from d3d_etl_spark import queries as qmod
    from d3d_etl_spark.queries.registry import REGISTRY
    from tests.conftest import TEST_SF_DIR

    qmod.load_all()
    names = [
        "corpus_chunk_pack",
        "z_corpus_shard_balance",
        "z_sim_semdedup",
        "dedup_minhash_lsh",
        "z_corpus_lr_step",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_parts in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_parts)
            for name in names:
                pdf = REGISTRY[name].fn(spark, TEST_SF_DIR).toPandas()
                pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
                results.setdefault(name, []).append(pdf)
        for name, (a, b) in results.items():
            assert a.equals(b), f"{name} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

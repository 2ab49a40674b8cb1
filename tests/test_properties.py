"""Property-based tests (hypothesis) for algebraic invariants the engine's
determinism contract relies on. Spark jobs are slow per example, so
max_examples is kept small and each example batches many rows."""

from __future__ import annotations

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

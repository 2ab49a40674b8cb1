"""Volume smoke: the full analytics DAG over hundreds of generated games.

Proves the scale claims hold beyond the hand fixture: the FSM parallelizes
per game, windows stay correct at volume, and the global invariants
(FIXTURES.md §15) survive — on narration generated from the grammar's
templates with a seeded RNG.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.pbp.pipeline import run_analytics

from d3d_etl_spark.pbp.synth import RAW_SCHEMA, generate_games


@pytest.mark.slow
def test_dag_at_volume(spark):
    rows = generate_games(300, seed=42)
    raw = spark.createDataFrame(rows, RAW_SCHEMA)
    out = run_analytics(raw)
    plays = out.with_metrics

    n_plays = plays.count()
    assert n_plays == len(rows)

    # global invariants at volume (FIXTURES.md §15)
    bad = plays.where(
        (F.col("outs_before") < 0) | (F.col("outs_before") > 2)
        | (F.col("outs_after") > 3)
        | ~F.col("bases_before").rlike("^[YN]{3}$")
    ).count()
    assert bad == 0

    # per half-inning: runs_this_inn constant == sum(runs_on_play)
    mism = (
        plays.groupBy("contest_id", "inning", "half")
        .agg(
            F.sum("runs_on_play").alias("s"),
            F.min("runs_this_inn").alias("lo"),
            F.max("runs_this_inn").alias("hi"),
        )
        .where((F.col("s") != F.col("lo")) | (F.col("lo") != F.col("hi")))
        .count()
    )
    assert mism == 0

    # ER matrix covers the empty-bases state with plausible values
    er = {r["bases"]: r for r in out.er_matrix.collect()}
    assert "NNN" in er and 0.0 <= er["NNN"]["erv_0"] <= 5.0
    assert out.batting.count() > 0


@pytest.mark.slow
def test_lsh_gate_scales_past_exact(spark):
    """The flagship dedup compositions must take the LSH gate because the
    bare inverted-index self-join is Σ posting-list² — super-linear in
    corpus size. Prove it AT SCALE with a synthetic corpus built from a
    small shared vocabulary (common shingles everywhere, the worst case):
    the gated path's candidate-pair count stays orders of magnitude below
    the exact path's co-occurrence pair count, while producing the SAME
    verified pairs."""
    from pyspark.sql import functions as F

    from d3d_etl_spark.functions.text import tokens, word_shingles
    from d3d_etl_spark.operators.dedup import (
        jaccard_pairs,
        lsh_band_keys,
        lsh_candidates,
        shingle_rows,
    )
    from d3d_etl_spark.queries.dedup import lsh_gated_pairs

    # 2000 docs: a SHARED 6-word preamble (every doc co-occurs with every
    # other through those shingles — the inverted index's worst case) + a
    # unique 20-word body; every 10th doc is a near-dup of its predecessor
    # (same body, one word changed)
    n_docs = 2000
    prefix = "the quick brown fox jumps over"

    def _body(id_col, n_words):
        return [
            F.concat(
                F.lit("w"), ((id_col * 17 + i * 13) % 100000).cast("string")
            )
            for i in range(n_words)
        ]

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 == 0) & (F.col("id") > 0),
            F.concat_ws(" ", F.lit(prefix), *_body(F.col("id") - 1, 19), F.lit("zz")),
        )
        .otherwise(F.concat_ws(" ", F.lit(prefix), *_body(F.col("id"), 20)))
        .alias("text"),
    )
    sh = shingle_rows(docs, "doc_id", word_shingles(tokens(F.col("text")), 3)).localCheckpoint()

    # candidate volumes: exact = co-occurring pairs through the inverted
    # index; gated = band-bucket collisions
    exact_cand = (
        sh.selectExpr("doc as a", "shingle")
        .join(sh.selectExpr("doc as b", "shingle"), "shingle")
        .where("a < b")
        .select("a", "b")
        .distinct()
        .count()
    )
    bands = lsh_band_keys(shingle_df=sh)
    gated_cand = lsh_candidates(bands).count()
    assert gated_cand * 20 < exact_cand, (
        f"LSH gate must prune candidates: gated={gated_cand} exact={exact_cand}"
    )

    # gate precision is exact (every gated pair is verified by true
    # Jaccard); recall is the banding scheme's probabilistic contract —
    # >= 90%% at this similarity level with 4 bands x 4 rows. The flagship
    # ORACLES mirror the gate exactly, so recall is a quality knob, never
    # a correctness gap.
    exact_pairs = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(sh, 0.3).collect()
    }
    gated_pairs = {
        (r["doc_a"], r["doc_b"]) for r in lsh_gated_pairs(sh).collect()
    }
    assert gated_pairs <= exact_pairs
    assert len(gated_pairs) >= 0.9 * len(exact_pairs)
    assert len(gated_pairs) >= n_docs / 10 * 0.5  # the planted near-dups


@pytest.mark.slow
def test_ann_gate_scales_past_exact(spark):
    """Embedding twin of the LSH-gate proof above: ann_gated_near_pairs
    (hyperplane band buckets -> within-bucket GEMM) must prune candidate
    volume far below the all-pairs n^2/2 while recovering the planted
    near-dup clusters — the composition sim_near_dedup's canon arm runs.

    Precision is exact (every candidate is verified by true cosine inside
    the bucket GEMM, same 6dp rounding as the exact operator); recall is
    the banding contract — at sim >= 0.95 with 8 bands x 8 bits the collide
    probability per pair is ~1-(1-0.9^8)^8 ≈ 0.99 (isotropic noise needs the
    finer 8-bit buckets to spread — candidate volume is b*n^2/2^r — and
    enough DIMENSIONS that the 64 plane bits decorrelate; in 16-d the
    buckets skew and Σg² roughly doubles). The flagship ORACLE
    mirrors the gate, so recall is a quality knob, never a correctness gap.
    """
    import numpy as np

    from d3d_etl_spark.operators.similarity import (
        ann_gated_near_pairs,
        blocked_near_pairs,
        hyperplane_band_buckets,
        hyperplane_table,
    )

    rng = np.random.default_rng(7)
    dim, n_groups, per_group, n_noise = 32, 150, 3, 1500
    rows = []
    vid = 0
    for _ in range(n_groups):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(per_group):  # planted near-dups: sim >= ~0.97
            v = base + rng.normal(scale=0.04, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_noise):  # isotropic noise: pairwise sim ~ N(0, 1/4)
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = len(rows)

    t = 0.9
    exact = {(r.vec_a, r.vec_b): r.sim for r in blocked_near_pairs(emb, t).collect()}
    gated = {
        (r.vec_a, r.vec_b): r.sim
        for r in ann_gated_near_pairs(emb, t, dim, 64, 8).collect()
    }

    # precision: gated ⊆ exact with identical rounded sims
    assert set(gated) <= set(exact)
    assert all(gated[k] == exact[k] for k in gated)
    # recall: the planted clusters survive the gate
    assert len(exact) >= n_groups * per_group * (per_group - 1) / 2  # sanity
    assert len(gated) >= 0.9 * len(exact), f"recall {len(gated)}/{len(exact)}"

    # candidate volume: sum of within-bucket pairs across bands must sit far
    # below the all-pairs surface the exact operator scans
    bb = hyperplane_band_buckets(emb, hyperplane_table(spark, 64, dim), 8)
    cand = (
        bb.groupBy("band", "bucket")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"))
        .collect()[0]["c"]
    )
    all_pairs = n * (n - 1) / 2
    assert cand * 20 < all_pairs, (
        f"ANN gate must prune candidates: gated={cand} all-pairs={all_pairs}"
    )


def test_incremental_dedup_matches_batch_restriction(spark):
    """z_corpus_incremental's contract: processing only the new batch
    against the persisted batch-1 band state yields EXACTLY the full-batch
    LSH pairs restricted to pairs touching a new doc — and the persisted
    state contains no new-batch docs (the measured path never computed
    them)."""
    from tests.conftest import TEST_SF_DIR

    from d3d_etl_spark.functions.text import tokens, word_shingles
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.operators.dedup import shingle_rows
    from d3d_etl_spark.queries.dedup import (
        _NEW_MOD,
        _SHINGLE_N,
        batch1_band_state,
        lsh_gated_pairs,
        z_corpus_incremental,
    )

    inc = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in z_corpus_incremental(spark, TEST_SF_DIR).collect()
    }

    # state purity: no new-batch doc ever entered the persisted bands
    state = batch1_band_state(spark, TEST_SF_DIR)
    assert state.where((F.col("doc") % _NEW_MOD) == 0).count() == 0

    # full-batch pairs over the whole corpus, restricted to pairs with >=1 new doc
    docs = load_table(spark, TEST_SF_DIR, "documents")
    sh = shingle_rows(
        docs, "doc_id", word_shingles(tokens(F.col("text")), _SHINGLE_N)
    ).localCheckpoint()
    batch = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in lsh_gated_pairs(sh)
        .where(((F.col("doc_a") % _NEW_MOD) == 0) | ((F.col("doc_b") % _NEW_MOD) == 0))
        .collect()
    }
    assert set(inc) == set(batch)
    for k in inc:
        assert inc[k] == pytest.approx(batch[k])


def test_incremental_dedup_selective_fetch(spark, tmp_path):
    """Proof that the incremental path touches old TEXT only for candidate
    ids: corrupt the text of every NON-candidate old document (the band
    state, built from the originals, stays fixed) and the query's output
    must be unchanged — if the measured path re-shingled the old corpus,
    the corrupted text would shift signatures or Jaccard values."""
    import os

    from pyspark.sql import functions as F

    import d3d_etl_spark.queries.dedup as dq
    from d3d_etl_spark.io import load_table
    from tests.conftest import TEST_SF_DIR

    # baseline run (also materializes the band state from the ORIGINALS)
    base = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dq.z_corpus_incremental(spark, TEST_SF_DIR).collect()
    }
    assert base, "need at least one pair for the proof to bite"
    touched = {d for pair in base for d in pair}

    docs = load_table(spark, TEST_SF_DIR, "documents")
    is_new = (F.col("doc_id") % dq._NEW_MOD) == 0
    # candidate ids are a superset of result ids; to be safe, only corrupt
    # old docs that CANNOT be candidates: recompute the candidate set the
    # same way the query does (band join against the state)
    state = dq.batch1_band_state(spark, TEST_SF_DIR)
    new_bands = dq.base_band_keys(dq.shingle_base(docs.where(is_new)))
    cand_old = (
        new_bands.select("band_idx", "band_key")
        .distinct()
        .join(state, ["band_idx", "band_key"])
        .select(F.col("doc").alias("doc_id"))
        .distinct()
    )
    corrupted = (
        docs.join(cand_old, "doc_id", "left_anti")
        .where(~is_new)
        .withColumn("text", F.lit("corrupted corpus text placeholder"))
        .unionByName(docs.join(cand_old, "doc_id", "left_semi"))
        .unionByName(docs.where(is_new))
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    corrupted.coalesce(1).write.parquet(path)

    orig = dq.load_table

    def patched(s, d, name):
        if name == "documents":
            return s.read.parquet(path)
        return orig(s, d, name)

    try:
        dq.load_table = patched
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dq.z_corpus_incremental(spark, TEST_SF_DIR).collect()
        }
    finally:
        dq.load_table = orig
    assert set(got) == set(base)
    for k in base:
        assert got[k] == pytest.approx(base[k])
    assert touched  # the proof exercised real pairs


def test_semdedup_pair_volume_is_cluster_bounded(spark):
    """SemDeDup's candidate volume must be sum over clusters of c*(c-1)/2 —
    never the all-pairs n*(n-1)/2. With k reasonably balanced clusters
    that's ~n^2/(2k): assert the actual un-thresholded pair count equals the
    cluster-size formula exactly and sits well under half of all-pairs."""
    from d3d_etl_spark.operators.similarity import within_cluster_near_pairs
    from d3d_etl_spark.queries.simsearch import _semdedup_parts

    from tests.conftest import TEST_SF_DIR

    clustered, _ = _semdedup_parts(spark, TEST_SF_DIR)
    n = clustered.count()
    sizes = [r.c for r in clustered.groupBy("cluster").agg(F.count("*").alias("c")).collect()]
    expected = sum(c * (c - 1) // 2 for c in sizes)
    got = within_cluster_near_pairs(clustered, -1.0).count()
    assert got == expected
    assert got < n * (n - 1) // 2 / 2, "cluster gating bought less than 2x"

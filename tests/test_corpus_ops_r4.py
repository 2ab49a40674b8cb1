"""Behavioral contracts for the round-4 corpus operators, beyond the
oracle-parity harness: mixture semantics, LM-score invariants, and
incremental-ANN recall/upper-bound guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR


def test_mixing_temperature_semantics(spark):
    """alpha=0.5 temperature mixing must (a) keep every acceptance in
    (0, 1], (b) give the dominant language a LOWER acceptance than every
    smaller one (that is the point of temperature reweighting), and
    (c) keep roughly budget/2 of the corpus overall."""
    from d3d_etl_spark.queries.sampling import z_corpus_mixing

    rows = {r["lang"]: r for r in z_corpus_mixing(spark, TEST_SF_DIR).collect()}
    assert len(rows) >= 2
    for r in rows.values():
        assert 0.0 < r["p_accept"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["total_tokens"]
    dominant = max(rows.values(), key=lambda r: r["total_tokens"])
    for r in rows.values():
        if r["lang"] != dominant["lang"]:
            assert dominant["p_accept"] < r["p_accept"]
    total = sum(r["total_tokens"] for r in rows.values())
    kept = sum(r["kept_tokens"] for r in rows.values())
    # budget is total/2; hash sampling is exact-in-expectation only
    assert 0.3 * total <= kept * 2 <= 1.7 * total


def test_mixing_budget_formula(spark):
    """p_accept must equal min(1, w_l * B / t_l) with w_l the normalized
    sqrt weight and B = total/2 — recomputed independently here from the
    published per-lang totals."""
    import math

    from d3d_etl_spark.queries.sampling import z_corpus_mixing

    rows = z_corpus_mixing(spark, TEST_SF_DIR).collect()
    s = {r["lang"]: round(math.sqrt(r["total_tokens"]) * 1_000_000) for r in rows}
    s_all = sum(s.values())
    t_all = sum(r["total_tokens"] for r in rows)
    for r in rows:
        expect = min(
            1_000_000,
            round(1_000_000 * (float(t_all) * s[r["lang"]]) / (2.0 * s_all * float(r["total_tokens"]))),
        ) / 1_000_000
        assert r["p_accept"] == pytest.approx(expect, abs=1e-9)


def test_lm_score_invariants(spark):
    """Every >=2-token doc is scored exactly once; nll is positive and
    bounded by ln of the worst-case smoothed denominator; bands partition."""
    from d3d_etl_spark.functions.text import tokens
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries.textops import z_corpus_lm_score

    out = z_corpus_lm_score(spark, TEST_SF_DIR)
    docs = load_table(spark, TEST_SF_DIR, "documents")
    n_eligible = docs.where(F.size(tokens(F.lower(F.col("text")))) >= 2).count()
    rows = out.collect()
    assert len(rows) == n_eligible
    assert len({r["doc_id"] for r in rows}) == len(rows)

    # worst case: unseen-ish bigram in the largest history => p >= 1/(max_c1+V)
    import math

    vocab = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    total_bigrams = sum(r["n_bigrams"] for r in rows)
    bound = math.log(total_bigrams + vocab) + 1e-4  # quantization slack
    for r in rows:
        assert 0.0 < r["nll"] <= bound
        assert r["qband"] in ("keep", "review", "drop")


def test_sim_incremental_state_and_bounds(spark):
    """Index-state purity (no new-batch vector was ever assigned) and the
    gated-search contract: the reported neighbor similarity never exceeds
    the true nearest-old-neighbor similarity, equals it whenever the true
    neighbor's cell was probed, and top-1 recall holds on the clusterable
    serving corpus (round 10: planted neighborhoods + scaled K)."""
    from d3d_etl_spark.functions.vectors import cosine
    from d3d_etl_spark.queries.simsearch import (
        ivf_index_state,
        serving_corpus,
        z_sim_incremental,
    )

    out = {r["vec_id"]: r for r in z_sim_incremental(spark, TEST_SF_DIR).collect()}
    assert out, "no new-batch vector produced a neighbor"

    corp, bmod = serving_corpus(spark, TEST_SF_DIR)
    _, assign = ivf_index_state(spark, TEST_SF_DIR)
    assert assign.where((F.col("vec_id") % bmod) == 0).count() == 0

    # exact nearest OLD neighbor per new vector (brute force)
    new = corp.where(F.col("vec_id") % bmod == 0).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv")
    )
    old = corp.where(F.col("vec_id") % bmod != 0).select(
        F.col("vec_id").alias("oid"), F.col("embedding").alias("ov")
    )
    from pyspark.sql import Window

    sims = new.crossJoin(old).select(
        "nid", "oid", F.round(cosine(F.col("nv"), F.col("ov")), 6).alias("sim")
    )
    w = Window.partitionBy("nid").orderBy(F.desc("sim"), F.asc("oid"))
    bf = {
        r["nid"]: r
        for r in sims.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }

    hits = 0
    for nid, r in out.items():
        assert r["nn_sim"] <= bf[nid]["sim"] + 1e-9, "gated search beat exact search"
        if r["nn_id"] == bf[nid]["oid"]:
            hits += 1
            assert r["nn_sim"] == pytest.approx(bf[nid]["sim"])
    # the clusterable serving corpus is what IVF presumes: nprobe=3 of
    # the scaled cells must find the true neighbor's cell essentially
    # always (measured 125/125 at sf0.01, 125/125 at sf0.001)
    assert hits / len(out) >= 0.9, f"top-1 recall collapsed: {hits}/{len(out)}"


def test_shard_balance_properties(spark):
    """Serpentine packing: every shard exists, doc counts differ by at most
    1, token totals are near-equal (within one max-doc size), and the
    two-level distributed rank reproduces the naive global sort rank."""
    from d3d_etl_spark.queries.registry import REGISTRY
    from d3d_etl_spark.queries.textops import _SHARDS

    pdf = (
        REGISTRY["z_corpus_shard_balance"]
        .fn(spark, TEST_SF_DIR)
        .toPandas()
        .sort_values("shard")
    )
    assert list(pdf["shard"]) == list(range(_SHARDS))
    assert pdf["n_docs"].max() - pdf["n_docs"].min() <= 1
    # serpentine keeps totals within ~one document of each other; the
    # corpus max doc length bounds the spread
    from d3d_etl_spark.functions.text import tokens
    from d3d_etl_spark.io import load_table

    docs = load_table(spark, TEST_SF_DIR, "documents")
    max_doc = docs.select(F.max(F.size(tokens(F.col("text"))))).first()[0]
    assert pdf["total_tokens"].max() - pdf["total_tokens"].min() <= max_doc
    assert pdf["total_tokens"].sum() == docs.select(
        F.sum(F.size(tokens(F.col("text"))))
    ).first()[0]


def test_semdedup_drop_rule(spark):
    """SemDeDup drop decisions: kept+dropped partition the corpus; every
    dropped vector has a surviving-or-dropped within-cluster neighbor at
    >= tau whose centroid-sim is lower-or-equal (the loser rule); survivors
    of a pair never both stay when one loses."""
    from d3d_etl_spark.operators.similarity import within_cluster_near_pairs
    from d3d_etl_spark.queries.registry import REGISTRY
    from d3d_etl_spark.queries.simsearch import _SEMDEDUP_TAU

    res = REGISTRY["z_sim_semdedup"].fn(spark, TEST_SF_DIR)
    pdf = res.toPandas()
    assert set(pdf["kept"].unique()) <= {0, 1}
    clustered = res.selectExpr("vec_id", "cluster", "csim")
    from d3d_etl_spark.io import load_table

    emb = load_table(spark, TEST_SF_DIR, "embeddings")
    pairs = within_cluster_near_pairs(
        clustered.join(emb, "vec_id"), _SEMDEDUP_TAU
    ).toPandas()
    csim = dict(zip(pdf["vec_id"], pdf["csim"]))
    kept = dict(zip(pdf["vec_id"], pdf["kept"]))
    losers = set()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        loser = a if (csim[a], a) > (csim[b], b) else b
        losers.add(loser)
        assert kept[loser] == 0, (a, b)
    # exactly the losers are dropped — nothing else
    assert losers == set(pdf.loc[pdf["kept"] == 0, "vec_id"])


def test_canonical_quality_keeps_longest(spark):
    """Quality-aware canonical selection must keep at least as many chars
    as the min-id variant (keeping the longest of each cluster maximizes
    surviving chars), drop exactly one doc per pairally-connected cluster
    member beyond the representative, and mark exactly one rep per cluster."""
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.operators.dedup import connected_components
    from d3d_etl_spark.queries.dedup import lsh_gated_pairs_base, shingle_base
    from d3d_etl_spark.queries.registry import REGISTRY

    qual = (
        REGISTRY["z_dedup_canonical_quality"].fn(spark, TEST_SF_DIR).toPandas()
    )
    minid = REGISTRY["dedup_canonical"].fn(spark, TEST_SF_DIR).toPandas()
    assert qual["total_chars"].sum() >= minid["total_chars"].sum()
    assert qual["n_docs"].sum() == minid["n_docs"].sum()  # same cluster count

    docs = load_table(spark, TEST_SF_DIR, "documents")
    comp = connected_components(
        lsh_gated_pairs_base(shingle_base(docs))
    ).toPandas()
    n_clusters = comp["component"].nunique()
    assert qual["n_reps"].sum() == n_clusters
    # survivors = corpus - (cluster members beyond one rep each)
    n_total = docs.count()
    assert qual["n_docs"].sum() == n_total - (len(comp) - n_clusters)


def test_semdedup_exact_duplicate_recall(spark):
    """Structural recall guarantee: identical vectors are assigned the same
    cluster regardless of their hash SEED (assignment depends only on the
    embedding), so exact duplicates are always caught by the within-cluster
    pair stage — the SemDeDup blind spot is only near-dups split across
    clusters, never exact copies."""
    import random

    from d3d_etl_spark.functions.strings import md5_int
    from d3d_etl_spark.operators.similarity import (
        assign_nearest_centroid,
        label_centroids,
        within_cluster_near_pairs,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, base[i]) for i in range(5)]  # planted exact dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeded = emb.withColumn(
        "cluster", F.pmod(md5_int(F.col("vec_id").cast("string")), F.lit(4))
    )
    cents = label_centroids(seeded, "cluster")
    asgn = assign_nearest_centroid(seeded, cents, "cluster")
    clustered = emb.join(
        asgn.select("vec_id", F.col("assigned_label").alias("cluster")), "vec_id"
    )
    got = {
        (r.id_a, r.id_b)
        for r in within_cluster_near_pairs(clustered, 0.999999).collect()
    }
    assert {(i, 100 + i) for i in range(5)} <= got


def test_d4_stage_semantics(spark):
    """D4 pipeline: stage partition is consistent with z_sim_semdedup
    (identical semdedup_drop set), per-cluster prototype_drop count is
    exactly floor(survivors/DEN), and every prototype_drop out-ranks (by
    centroid sim) every kept survivor in its cluster."""
    from d3d_etl_spark.queries.registry import REGISTRY
    from d3d_etl_spark.queries.simsearch import _D4_PRUNE_DEN

    d4 = REGISTRY["z_sim_d4"].fn(spark, TEST_SF_DIR).toPandas()
    sd = REGISTRY["z_sim_semdedup"].fn(spark, TEST_SF_DIR).toPandas()
    assert set(d4.loc[d4["stage"] == "semdedup_drop", "vec_id"]) == set(
        sd.loc[sd["kept"] == 0, "vec_id"]
    )
    surv = d4[d4["stage"] != "semdedup_drop"]
    for cluster, grp in surv.groupby("cluster"):
        n_proto = (grp["stage"] == "prototype_drop").sum()
        assert n_proto == len(grp) // _D4_PRUNE_DEN, cluster
        if n_proto:
            worst_dropped = grp.loc[grp["stage"] == "prototype_drop", "csim"].min()
            best_kept = grp.loc[grp["stage"] == "kept", "csim"].max()
            assert worst_dropped >= best_kept, cluster


def test_lr_trainer_loss_descends_and_matches_numpy(spark):
    """Iterating lr_gradient_step trains: mean logistic loss strictly
    decreases over 5 full-batch steps on the real corpus, and step 1
    matches an independent numpy implementation of the same quantized
    contract to 1e-12."""
    import math

    import numpy as np

    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.operators.classifier import (
        X_SCALE,
        lr_corpus_inputs,
        lr_gradient_step,
    )
    from d3d_etl_spark.queries.textops import _LR_FEATURES, _LR_RATE

    docs = load_table(spark, TEST_SF_DIR, "documents")
    xq, labels = lr_corpus_inputs(docs, _LR_FEATURES)

    # dense numpy mirror
    xp = xq.toPandas()
    lp = labels.toPandas().sort_values("doc_id")
    doc_ix = {d: i for i, d in enumerate(lp["doc_id"])}
    X = np.zeros((len(lp), _LR_FEATURES))
    for d, j, x in zip(xp["doc_id"], xp["j"], xp["x_q"]):
        X[doc_ix[d], j] = x / X_SCALE
    y = (lp["y_q"].to_numpy() / X_SCALE).astype(float)

    def np_step(w):
        wq = np.round(w * X_SCALE)
        # quantized contract: margin from integer x_q*w_q sums
        m = np.array([
            sum(int(x) * int(q) for x, q in zip(row, wq))
            for row in np.round(X * X_SCALE)
        ]) / (X_SCALE * float(X_SCALE))
        p_q = np.round(X_SCALE / (1.0 + np.exp(-m)))
        g = ((p_q - y * X_SCALE)[:, None] * np.round(X * X_SCALE)).sum(axis=0)
        return w - _LR_RATE * g / (X_SCALE * float(X_SCALE)) / len(y)

    def loss(w):
        m = X @ w
        return float(np.mean(np.log1p(np.exp(-m)) + (1 - y) * m))

    w = spark.range(_LR_FEATURES).select(
        F.col("id").alias("j"), F.lit(0.0).alias("w")
    )
    w_np = np.zeros(_LR_FEATURES)
    losses = [loss(w_np)]
    for step in range(5):
        w = lr_gradient_step(xq, labels, w, _LR_RATE).select("j", "w").localCheckpoint()
        w_np = np_step(w_np)
        got = np.array([r.w for r in w.orderBy("j").collect()])
        assert np.allclose(got, w_np, atol=1e-12), step
        losses.append(loss(w_np))
    assert all(b < a - 1e-6 for a, b in zip(losses, losses[1:])), losses
    assert not math.isnan(losses[-1])


def test_dsir_selection_enriches_target(spark):
    """DSIR must actually steer toward the target: the lang='en' share of
    the selected top-K strictly exceeds the corpus base rate, and the mean
    importance weight of en docs exceeds the non-en mean (the log-ratio
    features are fit on exactly that split)."""
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries import curation  # noqa: F401 — registers z_corpus_dsir
    from d3d_etl_spark.queries.registry import REGISTRY

    res = REGISTRY["z_corpus_dsir"].fn(spark, TEST_SF_DIR).toPandas()
    langs = (
        load_table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "lang")
        .toPandas()
    )
    m = res.merge(langs, on="doc_id")
    base_rate = (m["lang"] == "en").mean()
    sel_rate = (m.loc[m["sel"] == 1, "lang"] == "en").mean()
    assert sel_rate > base_rate, (sel_rate, base_rate)
    assert (
        m.loc[m["lang"] == "en", "lw_q"].mean()
        > m.loc[m["lang"] != "en", "lw_q"].mean()
    )
    assert m["sel"].sum() == 100


def test_kmeans_iteration_improves_assignment(spark):
    """Regression pin, not a theorem: with RAW-mean centroids and a cosine
    objective, an update step is not mathematically guaranteed to raise the
    mean assignment cosine (the cosine-optimal direction is the mean of
    NORMALIZED vectors, so heterogeneous norms can move it either way) —
    but on this corpus it rises clearly (0.21 -> 0.25), and losing that
    would signal a real behavior change in label_centroids / assignment.
    Also pins one assignment per vector per iteration."""
    from d3d_etl_spark.queries.registry import REGISTRY

    pdf = REGISTRY["z_sim_kmeans_iter"].fn(spark, TEST_SF_DIR).toPandas()
    n = pdf["vec_id"].nunique()
    for it in (1, 2):
        grp = pdf[pdf["iter"] == it]
        assert len(grp) == n
        assert grp["vec_id"].is_unique
    m1 = pdf.loc[pdf["iter"] == 1, "sim"].mean()
    m2 = pdf.loc[pdf["iter"] == 2, "sim"].mean()
    assert m2 >= m1 - 1e-6, (m1, m2)


def test_safe_split_blocks_leakage(spark):
    """The cluster-keyed split must put BOTH ends of every near-dup pair in
    the same split (zero leakage), while the naive per-doc hash split
    demonstrably leaks on the same corpus — the failure mode the operator
    exists to prevent. Split weights must also land near 80/10/10."""
    from d3d_etl_spark.functions.sampling import hash_split
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.operators.dedup import connected_components
    from d3d_etl_spark.queries.dedup import (
        _SAFE_SPLIT_WEIGHTS,
        lsh_gated_pairs_base,
        shingle_base,
    )

    docs = load_table(spark, TEST_SF_DIR, "documents")
    pairs = lsh_gated_pairs_base(shingle_base(docs)).localCheckpoint()
    assert pairs.count() > 0, "corpus has no near-dup pairs to protect"
    comp = connected_components(pairs).toPandas()
    rep = dict(zip(comp["node"], comp["component"]))

    def split_of(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        return {
            r["k"]: r["s"]
            for r in df.select(
                "k", hash_split(F.col("k"), _SAFE_SPLIT_WEIGHTS).alias("s")
            ).collect()
        }

    pp = pairs.toPandas()
    doc_ids = sorted(set(pp["doc_a"]) | set(pp["doc_b"]))
    naive = split_of(doc_ids)
    safe = split_of(sorted({rep.get(d, d) for d in doc_ids}))
    cross_safe = sum(
        safe[rep.get(a, a)] != safe[rep.get(b, b)]
        for a, b in zip(pp["doc_a"], pp["doc_b"])
    )
    cross_naive = sum(
        naive[a] != naive[b] for a, b in zip(pp["doc_a"], pp["doc_b"])
    )
    assert cross_safe == 0
    assert cross_naive > 0, "corpus too clean to demonstrate the leak"


def test_contrastive_triplet_semantics(spark):
    """Triplet contract: pos_sim >= tau > neg_sim for every row; the
    negative is the HARDEST one (no same-cluster sub-tau vector is more
    similar to the anchor); every anchor of a positive pair with an
    available negative appears."""
    from d3d_etl_spark.operators.similarity import within_cluster_near_pairs_gemm
    from d3d_etl_spark.queries.registry import REGISTRY
    from d3d_etl_spark.queries.simsearch import _SEMDEDUP_TAU, _semdedup_parts

    pdf = REGISTRY["z_sim_contrastive"].fn(spark, TEST_SF_DIR).toPandas()
    assert len(pdf) > 0
    assert (pdf["pos_sim"] >= _SEMDEDUP_TAU).all()
    assert (pdf["neg_sim"] < _SEMDEDUP_TAU).all()

    clustered, _ = _semdedup_parts(spark, TEST_SF_DIR)
    allp = within_cluster_near_pairs_gemm(clustered, -1.0).toPandas()
    best_neg: dict = {}
    anchors_with_pos = set()
    for a, b, s in zip(allp["id_a"], allp["id_b"], allp["pair_sim"]):
        for x, y in ((a, b), (b, a)):
            if s >= _SEMDEDUP_TAU:
                anchors_with_pos.add(x)
            elif s > best_neg.get(x, (-2.0, None))[0]:
                best_neg[x] = (s, y)
    for r in pdf.itertuples():
        assert best_neg[r.anchor][0] == r.neg_sim, r.anchor
    expected_anchors = {a for a in anchors_with_pos if a in best_neg}
    assert set(pdf["anchor"]) == expected_anchors

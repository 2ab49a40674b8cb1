"""Round-5 contrastive-mining pins: the ANN-widened negative pool
(z_sim_contrastive_ann) against the cluster-local form — the composition
the round-4 scale note claimed, now measured (VERDICT r4 item #4)."""

from __future__ import annotations


def _triplets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.anchor, []).append((r.positive, r.pos_sim, r.negative, r.neg_sim))
    return out


def test_ann_pool_widens_negatives(spark, sf_dir):
    """On real data the ANN band-bucket pool must (a) preserve triplet
    semantics — every negative strictly below tau, every positive at or
    above it, negatives are the per-anchor max — and (b) demonstrate the
    under-coverage the widening exists for: at least one anchor's hardest
    ANN-gated negative is strictly HARDER (higher cosine) than its
    cluster-local negative, i.e. the true hard negative sat outside the
    anchor's k-means cluster."""
    from d3d_etl_spark.queries.simsearch import (
        _SEMDEDUP_TAU,
        z_sim_contrastive,
        z_sim_contrastive_ann,
    )

    cluster = _triplets(z_sim_contrastive(spark, sf_dir))
    ann = _triplets(z_sim_contrastive_ann(spark, sf_dir))
    assert ann, "ANN pool produced no triplets"

    for rows in ann.values():
        for _, pos_sim, _, neg_sim in rows:
            assert pos_sim >= _SEMDEDUP_TAU
            assert neg_sim < _SEMDEDUP_TAU

    common = set(cluster) & set(ann)
    assert common, "no common anchors between the two pools"
    harder = [
        a
        for a in common
        if ann[a][0][3] > cluster[a][0][3]  # neg_sim strictly higher
    ]
    # the widening must actually buy something on real data — if every
    # hardest negative already lived in the anchor's own cluster, the
    # composed path would be dead weight
    assert harder, {a: (cluster[a][0][3], ann[a][0][3]) for a in list(common)[:5]}


def test_ann_pool_beats_cluster_pool_vs_ground_truth(spark, sf_dir):
    """Quantified widening: against the BRUTE-FORCE hardest sub-tau
    negative per anchor (exact, all-pairs, computable at test scale), the
    ANN band-bucket pool must recover the true hardest negative for MORE
    anchors than the k-means cluster pool does. Neither pool dominates
    per-anchor (the gate trades tail recall for sum-bucket^2 work; the
    cluster keeps everything local but misses cross-boundary neighbours) —
    the composed path earns its place by winning on aggregate."""
    import numpy as np

    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.queries.simsearch import (
        _SEMDEDUP_TAU,
        z_sim_contrastive,
        z_sim_contrastive_ann,
    )

    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    M = np.array([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    norms = np.sqrt(np.einsum("ij,ij->i", M, M))
    raw = (M @ M.T) / np.outer(norms, norms)
    sims = (
        np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5), raw) / 1e6
    )  # round-6 half-away, same contract as the engines
    np.fill_diagonal(sims, -2.0)
    truth = {}
    for i in range(len(ids)):
        row = sims[i].copy()
        row[row >= _SEMDEDUP_TAU] = -2.0  # negatives only
        j = int(np.argmax(row))
        if row[j] > -2.0:
            truth[int(ids[i])] = round(float(row[j]), 6)

    def hit_rate(df):
        rows = {r.anchor: r.neg_sim for r in df.collect()}
        hits = [a for a, s in rows.items() if a in truth and s == truth[a]]
        return len(hits), len(rows)

    ann_hits, ann_n = hit_rate(z_sim_contrastive_ann(spark, sf_dir))
    cl_hits, cl_n = hit_rate(z_sim_contrastive(spark, sf_dir))
    assert ann_n and cl_n
    assert ann_hits / ann_n > cl_hits / cl_n, (
        f"ann {ann_hits}/{ann_n} vs cluster {cl_hits}/{cl_n}"
    )

"""Round-5 DSIR selection pins: the corpus-fraction threshold variant
(z_corpus_dsir_threshold) against its own contract — superset-of-top-K at
the matching quantile, exact fraction arithmetic, and the no-driver-funnel
plan shape (VERDICT r4 next-round item #2)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dsir_threshold_superset_of_topk(spark, sf_dir):
    """The threshold selection is the smallest selectable SUPERSET of the
    exact top-K at K = ceil(frac * n): every top-K row is selected, the
    selected count reaches K, and strictly-above-threshold rows alone
    do not (the threshold is tight)."""
    from d3d_etl_spark.queries.curation import (
        _DSIR_FRAC_DEN,
        _DSIR_FRAC_NUM,
        z_corpus_dsir_threshold,
    )

    out = z_corpus_dsir_threshold(spark, sf_dir).toPandas()
    n = len(out)
    k = -(-n * _DSIR_FRAC_NUM // _DSIR_FRAC_DEN)
    out["score"] = out.lw_q + out.g_q
    selected = set(out.loc[out.sel == 1, "doc_id"])
    assert len(selected) >= k

    topk = set(
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)["doc_id"]
    )
    assert topk <= selected, topk - selected

    thr = out.loc[out.sel == 1, "score"].min()
    assert (out.score > thr).sum() < k  # tight: one step up loses K
    # selection is exactly the >= threshold predicate
    assert set(out.loc[out.score >= thr, "doc_id"]) == selected


def test_dsir_threshold_never_funnels_driver(spark, sf_dir):
    """The corpus-fraction path must not contain a top-K driver funnel:
    no TakeOrdered / global limit anywhere in the physical plan, and no
    corpus-cardinality global sort (the only Sort nodes are inside
    bucket-partitioned windows or bucket-grain frames)."""
    from d3d_etl_spark.queries.curation import z_corpus_dsir_threshold

    plan = (
        z_corpus_dsir_threshold(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrdered" not in plan, plan
    assert "CollectLimit" not in plan, plan
    assert "GlobalLimit" not in plan, plan


def test_dsir_threshold_ties_all_kept(spark):
    """Tie contract at the threshold: all score-ties are kept (the
    deterministic superset), never a driver-side tiebreak. Exercised
    directly against the selection arithmetic on a planted tie group."""
    import pandas as pd

    # 10 docs: scores [5,5,5,4,3,2,1,1,0,0], frac 1/5 -> k=2 -> the three
    # score-5 ties must ALL be selected (threshold 5, |sel|=3 > k)
    scores = [5, 5, 5, 4, 3, 2, 1, 1, 0, 0]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, score long"
    )
    k = 2
    cnt = df.groupBy("score").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    cum = cnt.select("score", F.sum("c").over(w).alias("cge"))
    thr = cum.where(F.col("cge") >= k).agg(F.max("score").alias("t"))
    sel = (
        df.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("t"))
        .toPandas()
    )
    assert sorted(sel.doc_id) == [0, 1, 2]
    assert int(sel.score.min()) == 5


def test_stratified_exact_allocation(spark, sf_dir):
    """Hamilton apportionment contract: quotas sum to exactly K, each
    stratum's quota is within 1 of its exact proportional share, and the
    selected count per stratum equals its quota (no md5 ties on these
    corpora)."""
    from d3d_etl_spark.queries.sampling import _STRATX_K, z_sample_stratified_exact

    out = z_sample_stratified_exact(spark, sf_dir).toPandas()
    quotas = out.groupby("lang").quota.first()
    assert int(quotas.sum()) == _STRATX_K
    n = len(out)
    for lang, q in quotas.items():
        share = _STRATX_K * (out.lang == lang).sum() / n
        assert abs(q - share) < 1, (lang, q, share)
    sel_counts = out.loc[out.sel == 1].groupby("lang").size()
    for lang, q in quotas.items():
        assert sel_counts.get(lang, 0) == q, (lang, sel_counts.get(lang, 0), q)
    assert int(out.sel.sum()) == _STRATX_K


def test_stratified_exact_never_funnels_driver(spark, sf_dir):
    """Same no-driver-funnel discipline as the DSIR threshold path: no
    TakeOrdered / CollectLimit / GlobalLimit anywhere (the only windows
    run per-stratum over bucket-grain or stratum-grain rows)."""
    from d3d_etl_spark.queries.sampling import z_sample_stratified_exact

    plan = (
        z_sample_stratified_exact(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("TakeOrdered", "CollectLimit", "GlobalLimit"):
        assert bad not in plan, bad


def test_stratified_exact_k_exceeds_corpus(spark, tmp_path):
    """ADVICE r5: when K (100) exceeds the corpus size, every stratum's
    Hamilton quota is capped at n_l and ALL rows are selected — without
    the cap an oversized quota's threshold never triggers and the stratum
    silently selects zero rows. Engine and oracle agree on the capped
    semantics."""
    import os

    import duckdb

    from d3d_etl_spark.oracle import compare_frames
    from d3d_etl_spark.queries.registry import REGISTRY
    from d3d_etl_spark.queries.sampling import _STRATX_K, z_sample_stratified_exact

    rows = [(i, f"doc {i}", "en" if i % 3 else "fr", "web", 5) for i in range(7)]
    tiny = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert tiny.count() < _STRATX_K
    tiny.coalesce(1).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    out = z_sample_stratified_exact(spark, str(tmp_path)).toPandas()
    assert len(out) == 7 and int(out.sel.sum()) == 7, "cap must select the whole corpus"
    assert dict(out.groupby("lang").quota.first()) == {"en": 4, "fr": 3}

    con = duckdb.connect()
    path = os.path.join(str(tmp_path), "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    oracle_pdf = con.execute(REGISTRY["z_sample_stratified_exact"].oracle).fetchdf()
    con.close()
    assert not compare_frames(out, oracle_pdf)

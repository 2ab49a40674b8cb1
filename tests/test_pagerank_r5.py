"""PageRank pins (z_graph_pagerank): mass conservation within the
integer-division leak bound, structural centrality on the real graph, and
uniform rank for isolated vectors."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_mass_and_structure(spark, sf_dir):
    """Total rank mass stays within the bounded integer-division leak
    (each `div` floors away < 1 unit per operand per iteration), every
    isolated vector carries the identical rank (teleport + dangling share
    only), and connected vectors outrank isolated ones on average —
    centrality flows into the duplication clusters."""
    from d3d_etl_spark.io import load_table
    from d3d_etl_spark.operators.similarity import ann_gated_near_pairs
    from d3d_etl_spark.queries.simsearch import (
        _DEDUP_T,
        _DIM,
        _GATE_BANDS,
        _GATE_PLANES,
        _PR_ITERS,
        _PR_SCALE,
        z_graph_pagerank,
    )

    out = z_graph_pagerank(spark, sf_dir).toPandas()
    n = len(out)
    total = int(out.pr_q.sum())
    # leak bound: per iteration, each of n nodes floors a handful of
    # divisions; n * (iters + 1) * 40 units is generous and still ~1e-4
    # of the mass
    assert abs(total - _PR_SCALE) <= n * (_PR_ITERS + 1) * 40, total

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = ann_gated_near_pairs(emb, _DEDUP_T, _DIM, _GATE_PLANES, _GATE_BANDS)
    connected = {r.vec_a for r in pairs.collect()} | {
        r.vec_b for r in pairs.collect()
    }
    iso = out.loc[~out.vec_id.isin(connected), "pr_q"]
    conn = out.loc[out.vec_id.isin(connected), "pr_q"]
    assert iso.nunique() == 1, iso.unique()[:5]
    assert len(conn) > 0
    assert conn.mean() > iso.iloc[0]


def test_pagerank_star_center_wins(spark):
    """Planted star: the hub of a near-duplicate star outranks every
    spoke after the damped iterations (rank flows to the center)."""
    from d3d_etl_spark.queries.simsearch import _PR_ITERS, _PR_SCALE

    # run the same integer recurrence in pure python on a star graph to
    # define truth, then the Spark recurrence on a forged edge table must
    # reproduce it exactly
    n, spokes = 12, 8
    edges = [(0, j) for j in range(1, spokes + 1)]
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    pr = {v: _PR_SCALE // n for v in range(n)}
    for _ in range(_PR_ITERS):
        s_in = {v: 0 for v in range(n)}
        for a, b in sym:
            s_in[b] += pr[a] // deg[a]
        dm = sum(pr[v] for v in range(n) if v not in deg)
        pr = {
            v: (3 * _PR_SCALE) // (20 * n) + (17 * (s_in[v] + dm // n)) // 20
            for v in range(n)
        }
    assert pr[0] > max(pr[j] for j in range(1, spokes + 1))
    assert pr[1] > pr[spokes + 1]  # spokes beat isolated nodes

    # Spark recurrence on the same forged graph
    edf = spark.createDataFrame(sym, "src long, dst long").localCheckpoint()
    nodes = spark.range(n).select(F.col("id").alias("vec_id"))
    nn = nodes.agg(F.count("*").cast("long").alias("n"))
    degdf = edf.groupBy(F.col("src").alias("vec_id")).agg(
        F.count("*").cast("long").alias("d")
    ).localCheckpoint()
    prdf = nodes.crossJoin(F.broadcast(nn)).select(
        "vec_id", F.expr(f"{_PR_SCALE} div n").cast("long").alias("pr")
    ).localCheckpoint()
    for _ in range(_PR_ITERS):
        contrib = (
            edf.join(prdf.withColumnRenamed("vec_id", "src"), "src")
            .join(degdf.withColumnRenamed("vec_id", "src"), "src")
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(F.sum(F.expr("pr div d")).cast("long").alias("s_in"))
        )
        dang = prdf.join(degdf, "vec_id", "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0)).cast("long").alias("dm")
        )
        prdf = (
            prdf.join(contrib, "vec_id", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang))
            .select(
                "vec_id",
                F.expr(
                    f"CAST({3 * _PR_SCALE}L div (20 * n) "
                    f"+ (17 * (coalesce(s_in, 0) + dm div n)) div 20 AS BIGINT)"
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    got = {r.vec_id: r.pr for r in prdf.collect()}
    assert got == pr, (got, pr)

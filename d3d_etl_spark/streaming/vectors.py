"""Streaming embedding ingest: near-neighbor alerts for vectors ARRIVING
as a stream, probed against the persisted IVF index state — the Structured
Streaming twin of the batch z_sim_incremental query, and the embedding
sibling of streaming/corpus.py.

Stateless by the same design: centroid scoring is per-row column math
against DRIVER-COLLECTED centroid literals (the centroid table is k*dim
rows — dimension-sized at any corpus scale, the canonical broadcast-as-
literal case), probing and candidate fetch are stream-static joins, and
the exact cosine verify is a per-row zip_with against the candidate's
vector. No watermark, no state store. Ranking/top-1 happens at the
idempotent sink (alerts above `min_sim` stream through once per matching
candidate), mirroring the corpus twin's dedup-at-sink contract.

Static-side sizing: the assignment state and the indexed-vector table are
corpus-proportional, so no broadcast is forced — Spark broadcasts them
while they fit and shuffles the per-batch join when they don't; at real
scale both live bucketed/partitioned by cell label so the probe join
prunes to the probed cells, or the verify moves into foreachBatch for the
batch twin's candidate-gated selective fetch.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_with_lit(vec_col: Column, values: list[float]) -> Column:
    arr = F.array(*[F.lit(float(v)) for v in values])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def streaming_ann_probe(
    vec_stream: DataFrame,
    centroid_rows: DataFrame,
    assignments: DataFrame,
    old_vectors: DataFrame,
    nprobe: int,
    min_sim: float,
) -> DataFrame:
    """(vec_id, old_id, sim) alerts for every arriving vector whose probed
    cells contain an indexed vector with cosine >= min_sim.

    `vec_stream` needs (vec_id, embedding); `centroid_rows` is the
    persisted (label, pos, c) table (queries.simsearch.ivf_index_state);
    `assignments` the persisted (vec_id, assigned_label, sim); and
    `old_vectors` the static slice of the corpus the state indexes, used
    only for candidate verification.
    """
    # dimension-sized state -> driver-side literals (collected ONCE at
    # query construction, not per batch)
    cents: dict[int, dict[int, float]] = {}
    for r in centroid_rows.collect():
        cents.setdefault(r["label"], {})[r["pos"]] = r["c"]
    labels = sorted(cents)
    vectors = {
        lab: [cents[lab][p] for p in sorted(cents[lab])] for lab in labels
    }
    norms = {lab: math.sqrt(sum(x * x for x in vectors[lab])) for lab in labels}

    vnorm = _norm(F.col("embedding"))
    cell_scores = F.array(
        *[
            F.struct(
                F.round(
                    _dot_with_lit(F.col("embedding"), vectors[lab])
                    / (vnorm * F.lit(norms[lab])),
                    6,
                ).alias("sim"),
                F.lit(lab).alias("label"),
            )
            for lab in labels
        ]
    )
    # descending sim, ascending label — the same probe order as the batch
    # ivf ranking (array_sort is ascending, so flip the sim sign)
    ranked = F.array_sort(
        F.transform(
            cell_scores, lambda s: F.struct((-s["sim"]).alias("k"), s["label"].alias("label"))
        )
    )
    probes = vec_stream.select(
        "vec_id",
        F.col("embedding").alias("v_new"),
        F.explode(F.slice(ranked, 1, nprobe)).alias("p"),
    ).select("vec_id", "v_new", F.col("p.label").alias("label"))

    state = assignments.select(
        F.col("vec_id").alias("old_id"), F.col("assigned_label").alias("label")
    )
    cand = probes.join(state, "label")

    old = old_vectors.select(
        F.col("vec_id").alias("old_id"), F.col("embedding").alias("v_old")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("v_new").cast("array<double>"),
            F.col("v_old").cast("array<double>"),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = F.round(dot / (_norm(F.col("v_new")) * _norm(F.col("v_old"))), 6)
    return (
        cand.join(old, "old_id")
        .where(F.col("vec_id") != F.col("old_id"))
        .select("vec_id", "old_id", sim.alias("sim"))
        .where(F.col("sim") >= min_sim)
    )

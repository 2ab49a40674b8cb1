"""Product quantization (PQ) for embedding compression + ADC search
(Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search"; the FAISS IVF-PQ shape).

Why this exists at 100 TB: a float32 corpus at dim 768 is 3 KB/vector;
PQ with M sub-quantizers stores M small codes (M bytes at ks<=256) — a
~400x shrink — and queries score candidates from a per-query
(M x ks) distance TABLE with M integer adds per vector (ADC: asymmetric
distance computation), never touching the raw floats. The index scan
becomes bandwidth-bound over codes instead of floats, which is the whole
economics of billion-scale ANN.

Engine determinism contract (matches the IVF/k-means arms):
- components are fixed-point integers (round(x * 1e6), SIM_SCALE);
- sub-centroids are hash-seeded (md5(vec_id || ':' || sub) % ks — each
  subspace seeds independently) and quantized back to integers
  (round of an exact-integer-sum / count division: both engines divide
  identical integers and round half-away on identical doubles);
- encoding distance and ADC distance are EXACT integer sums of squared
  integer differences — no float exposure anywhere past the centroid
  quantization, so ranking needs no rounding contract at all;
- every argmin/top-k tie-breaks on (distance asc, code/id asc).

Scale shape: codebooks are M * ks * dsub rows (tiny, broadcast); encoding
is one broadcast join + per-(vector, sub) argmin over ks candidates
(map-side after the broadcast); the ADC distance table is M * ks integers
per query (broadcast); scoring is a map over the code table + one
partial top-k. Composes with the IVF coarse stage (probe cells, then ADC
only within them) exactly like FAISS IVF-PQ — z_sim_ivfpq in
queries/simsearch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.operators.similarity import SIM_SCALE


def pq_subspace_comps(
    emb: DataFrame, dim: int, m: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, sub, pos, xs): fixed-point components tagged with their
    subspace (contiguous blocks of dim/m positions)."""
    if dim % m:
        raise ValueError(f"dim {dim} must split evenly into {m} subspaces")
    dsub = dim // m
    return emb.select(
        id_col, F.posexplode(vec_col).alias("pos", "x")
    ).select(
        id_col,
        (F.col("pos") / dsub).cast("int").alias("sub"),
        "pos",
        F.round(F.col("x").cast("double") * SIM_SCALE).cast("long").alias("xs"),
    )


def pq_codebooks_from_comps(
    comps: DataFrame, ks: int, id_col: str = "vec_id"
) -> DataFrame:
    """(sub, code, pos, c_q) from an (id, sub, pos, xs) component table —
    one hash-seeded Lloyd assignment + integer-quantized means. Taking
    comps (not vectors) lets the residual IVF-PQ path train codebooks on
    (vector - coarse centroid) residuals with the same machinery."""
    from d3d_etl_spark.functions.strings import md5_int

    seeded = comps.withColumn(
        "code",
        F.pmod(
            md5_int(
                F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("sub").cast("string"))
            ),
            F.lit(ks),
        ).cast("int"),
    )
    return seeded.groupBy("sub", "code", "pos").agg(
        F.round(F.sum("xs") / F.count("*")).cast("long").alias("c_q")
    )


def pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int,
    ks: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code, pos, c_q): per-subspace codebooks from one hash-seeded
    Lloyd assignment — the deterministic k-means-step contract of
    label_centroids applied per subspace, centroids quantized back to
    fixed-point integers so downstream distances stay exact."""
    return pq_codebooks_from_comps(
        pq_subspace_comps(emb, dim, m, id_col, vec_col), ks, id_col
    )


def pq_encode_comps(
    comps: DataFrame, codebooks: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, sub, code, dist) from an (id, sub, pos, xs) component table:
    nearest sub-centroid per subspace by exact integer squared-L2,
    tie-break code asc. The codebook is broadcast; per-vector work is ks
    candidate sums per subspace."""
    from pyspark.sql import Window

    d = (
        comps.join(F.broadcast(codebooks), ["sub", "pos"])
        .groupBy(id_col, "sub", "code")
        .agg(
            F.sum(
                (F.col("xs") - F.col("c_q")) * (F.col("xs") - F.col("c_q"))
            ).alias("dist")
        )
    )
    w = Window.partitionBy(id_col, "sub").orderBy(F.asc("dist"), F.asc("code"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, "sub", "code", "dist")
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode_comps over vectors — see there."""
    return pq_encode_comps(
        pq_subspace_comps(emb, dim, m, id_col, vec_col), codebooks, id_col
    )


def pq_refine_step(
    comps: DataFrame, codebooks: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """One Lloyd iteration of the PQ codebooks: re-assign every vector to
    its nearest sub-centroid (pq_encode_comps), then re-mean each
    (sub, code) cluster's components with the same integer-quantized
    division the seeding used. Deterministic end-to-end (exact integer
    distances, (dist, code) tie-break, round-half-away on an exact
    integer-sum / count). Codes whose cluster empties simply drop out —
    the encode path argmins over present codes only. One shuffle per
    iteration (the (id, sub, code) re-assignment agg); the re-mean output
    stays M*ks*dsub-row dimension-sized."""
    assigned = pq_encode_comps(comps, codebooks, id_col).select(id_col, "sub", "code")
    return (
        comps.join(assigned, [id_col, "sub"])
        .groupBy("sub", "code", "pos")
        .agg(F.round(F.sum("xs") / F.count("*")).cast("long").alias("c_q"))
    )


def pq_adc_table(codebooks: DataFrame, query_comps: DataFrame) -> DataFrame:
    """(sub, code, d): the per-query ADC distance table — exact integer
    squared-L2 from the query's sub-vectors to every sub-centroid.
    M * ks rows; broadcast-sized for any corpus."""
    return (
        codebooks.join(F.broadcast(query_comps), ["sub", "pos"])
        .groupBy("sub", "code")
        .agg(
            F.sum((F.col("qs") - F.col("c_q")) * (F.col("qs") - F.col("c_q"))).alias("d")
        )
    )


def pq_adc_scores(
    codes: DataFrame, adc: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, adist): asymmetric distance = sum over subspaces of the
    table entry for the vector's code — M integer adds per vector over
    the CODE table (the raw floats are never read)."""
    return (
        codes.join(F.broadcast(adc), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("d").alias("adist"))
    )

"""Streaming corpus ingest: near-dup detection for documents ARRIVING as a
stream, probed against the persisted batch index state — the Structured
Streaming twin of the batch z_corpus_incremental query (queries/dedup.py).

Shape: everything is map-side or stream-static, so the stream carries ZERO
aggregation state — no watermark bookkeeping, no state store growth:

1. band keys are computed INLINE per document with array higher-order
   functions (array_min over transformed shingles) instead of the batch
   side's grouped signature pass — bit-identical keys (same md5 family,
   same "j:shingle" seeding, proven by the parity test);
2. candidates come from a stream-static broadcast join against the
   persisted (doc, band_idx, band_key) state;
3. exact-Jaccard verification is a per-row array_intersect against the
   candidate old doc's shingle set (stream-static join on the old id) —
   no inverted index, no shuffle, because each arriving doc only ever
   compares against its own candidate list.

A pair that shares several bands is emitted once per shared band; the lake
sink dedups on (doc_a, doc_b) exactly as the batch upsert sink does
(stream_upsert_sink dedup_keys) — keeping the stream stateless is the
100 TB trade: dedup at the idempotent sink, not in the state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.functions.text import tokens, word_shingles


def inline_band_keys(
    text_col: Column, n_hashes: int, rows_per_band: int, shingle_n: int
) -> Column:
    """array<struct<band_idx:int, band_key:string>> computed per row —
    the streaming-safe (map-only) twin of operators.dedup.lsh_band_keys.
    Returns an empty array for shingle-less docs (they can never match),
    matching the batch operator's no-rows behavior."""
    from d3d_etl_spark.operators.dedup import band_keys_from_shingle_array

    sh = F.array_distinct(word_shingles(tokens(text_col), shingle_n))
    return band_keys_from_shingle_array(sh, n_hashes, rows_per_band)


def streaming_incremental_dedup(
    doc_stream: DataFrame,
    band_state: DataFrame,
    old_docs: DataFrame,
    min_jaccard: float,
    n_hashes: int = 16,
    rows_per_band: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, old_id, band_idx, jaccard) rows for every arriving document
    that near-dups an indexed one. `doc_stream` needs (doc_id, text);
    `band_state` is the persisted (doc, band_idx, band_key) table
    (queries.dedup.batch1_band_state); `old_docs` is the static corpus
    slice the state was built from, used only for candidate verification.
    """
    sh_expr = F.array_distinct(word_shingles(tokens(F.col("text")), shingle_n))

    probes = doc_stream.select(
        "doc_id",
        sh_expr.alias("sh_new"),
        F.explode(
            inline_band_keys(F.col("text"), n_hashes, rows_per_band, shingle_n)
        ).alias("b"),
    ).select("doc_id", "sh_new", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))

    state = band_state.select(
        F.col("doc").alias("old_id"), "band_idx", "band_key"
    )
    cand = probes.join(F.broadcast(state), ["band_idx", "band_key"]).where(
        F.col("doc_id") != F.col("old_id")
    )

    old_sh = old_docs.select(
        F.col("doc_id").alias("old_id"), sh_expr.alias("sh_old")
    )
    inter = F.size(F.array_intersect("sh_new", "sh_old"))
    union = F.size("sh_new") + F.size("sh_old") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(F.broadcast(old_sh), "old_id")
        .select("doc_id", "old_id", "band_idx", jac.alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
    )

"""Streaming quality-classifier INFERENCE: score documents ARRIVING as a
stream with a trained hashed-BoW logistic model — the Structured Streaming
twin of the batch training/scoring surface in operators/classifier.py, and
the deployment half of the z_corpus_lr_step story (train in batch, gate the
ingest stream with the frozen model).

Stateless by construction: the trained weight vector is feature-dim (64
doubles here, ~1M for a production fastText-style model — always
dimension-sized, never corpus-sized), collected to COLUMN LITERALS exactly
like streaming/vectors.py's centroid literals. Scoring is then pure
per-row column math — tokenize, hash each token, index the weight array,
one fold, one sigmoid. No state store, no watermark, no shuffle; the
stream scales with source parallelism alone.

Margin algebra: the batch trainer's margin is sum_j (x_qj/1e6) * (w_qj/1e6)
over quantized per-doc feature values AND quantized weights; per-row here
it is (1/nd) * sum_tokens w[h(token)] with full-precision w — the same
number without materializing the count table, off by two quantization
terms: the feature one (|delta| <= n_features * 5e-7 * max|w|) and the
weight one (sum_j x_j * |w_j - w_qj/1e6| <= 5e-7, since the x_j sum to 1).
The parity test asserts against the combined bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.functions.strings import md5_int
from d3d_etl_spark.functions.text import tokens


def _weight_literals(weights: DataFrame, n_features: int) -> Column:
    """Collect a (j, w) weight table into an array literal indexed by j.
    Feature-dim rows only — the canonical broadcast-as-literal case.
    Fails fast on a short or gappy table: a silent gap would make
    element_at return NULL for the missing index and NULL out every
    affected document's margin fold."""
    collected = weights.collect()
    rows = {r["j"]: float(r["w"]) for r in collected}
    # compare against the ROW count, not just the key set: duplicate-j rows
    # would otherwise pass coverage with a collect-order-dependent winner
    if len(collected) != n_features or sorted(rows) != list(range(n_features)):
        raise ValueError(
            f"weight table must cover features 0..{n_features - 1} exactly "
            f"once; got {len(collected)} rows over {len(rows)} distinct j"
        )
    return F.array(*[F.lit(rows[j]) for j in range(n_features)])


def streaming_quality_scores(
    doc_stream: DataFrame, weights: DataFrame, n_features: int
) -> DataFrame:
    """Score a stream of (doc_id, text) rows with a trained logistic model:
    (doc_id, n_tokens, score, accept). Zero-token docs score NULL and are
    not accepted (same eligibility rule as the batch trainer)."""
    w_arr = _weight_literals(weights, n_features)
    tok = tokens(F.col("text"))
    per_tok = F.transform(
        tok, lambda t: F.element_at(w_arr, (md5_int(t) % n_features + 1).cast("int"))
    )
    margin = F.when(
        F.size(tok) > 0,
        F.aggregate(per_tok, F.lit(0.0), lambda a, x: a + x) / F.size(tok),
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return doc_stream.select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tokens"),
        score.alias("score"),
        F.coalesce(score >= 0.5, F.lit(False)).alias("accept"),
    )


def streaming_dsir_weights(
    doc_stream: DataFrame, log_ratio: DataFrame, n_buckets: int
) -> DataFrame:
    """Streaming twin of z_corpus_dsir's scoring half: importance-weight
    documents ARRIVING as a stream against a log-ratio table FIT in batch
    (the (target || raw) bucket statistics are corpus state; the per-doc
    weight is pure per-row math). `log_ratio` is (j, t_q) — B integer rows,
    collected to an array literal like the classifier weights. Per row:
    bigram-shingle the text, hash each shingle, sum the indexed t_q —
    the batch side's EXACT integer weight (counts enter multiplicatively
    through repetition of the same j), so parity with z_corpus_dsir's lw_q
    is exact, not approximate. Stateless; zero shuffle."""
    from d3d_etl_spark.functions.text import tokens, word_shingles

    collected = log_ratio.collect()
    rows = {r["j"]: int(r["t_q"]) for r in collected}
    # row-count check too: duplicate-j rows must raise, not last-write-win
    if len(collected) != n_buckets or sorted(rows) != list(range(n_buckets)):
        raise ValueError(
            f"log-ratio table must cover buckets 0..{n_buckets - 1} exactly "
            f"once; got {len(collected)} rows over {len(rows)} distinct j"
        )
    t_arr = F.array(*[F.lit(rows[j]).cast("long") for j in range(n_buckets)])
    sh = word_shingles(tokens(F.col("text")), 2)
    per_sh = F.transform(
        sh, lambda s: F.element_at(t_arr, (md5_int(s) % n_buckets + 1).cast("int"))
    )
    lw = F.when(
        F.size(sh) > 0,
        F.aggregate(per_sh, F.lit(0).cast("long"), lambda a, x: a + x),
    )
    return doc_stream.select(
        "doc_id",
        F.size(sh).cast("long").alias("n_shingles"),
        lw.alias("lw_q"),
    )

"""Streaming BM25 scoring: rank documents ARRIVING as a stream against
FROZEN corpus statistics — the Structured Streaming twin of the batch
z_text_bm25 query (queries/textops.py), i.e. the serving half of the
retrieval story (fit idf/length stats on the batch corpus, score the
ingest stream with them).

Stateless by construction, like streaming/classifier.py: the frozen state
is TERM-dimensional (one idf per query term) plus two scalars (N docs,
T total tokens) — collected to column literals, never a state store. Per
arriving row everything is JVM column math: tokenize, per-term
size(filter(...)) term frequency, and the exact-integer per-term score

    (idf_q * 44 * T * tf) div (20 * T * tf + 6 * T + 18 * dl * N)

— the identical bigint expression the batch query aggregates, with T and N
as literals. Because the whole contract is integer, streaming/batch parity
is BIT-EXACT (no quantization-gap tolerance like the LR twin needs).

Missing terms: the batch pipeline derives idf from corpus df, so a query
term absent from the corpus has NO idf row and contributes nothing
batch-side; the streaming scorer mirrors that by skipping terms without a
frozen idf (they also don't count toward n_terms_hit). Zero-token docs
score NULL (the batch dl table drops them), matching the classifier
twin's eligibility convention.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d3d_etl_spark.functions.text import tokens

# terms are interpolated into column names and an F.expr SQL string below:
# only identifier-safe terms are accepted (anything the tokenizer emits
# that matches this is fine; whitespace/quotes/dots/hyphens are not)
_SAFE_TERM = re.compile(r"^[a-z0-9_]+$")


def streaming_bm25_scores(
    doc_stream: DataFrame,
    idf: DataFrame,
    stats: DataFrame,
    terms: tuple[str, ...],
) -> DataFrame:
    """Score a stream of (doc_id, text) rows with frozen BM25 state:
    (doc_id, n_tokens, score_q, n_terms_hit). `idf` is the batch (tok,
    idf_q[, fit_n_docs, fit_t_tokens]) table, `stats` the 1-row (n_docs,
    t_tokens) frame — both dimension-sized, collected to literals. Fails
    fast on a frozen-state mixup: an idf table that doesn't belong to
    `terms`, an unsafe term (terms are interpolated into SQL), or an
    idf/stats pair fit on different corpora (the fit fingerprint
    bm25_corpus_state stamps on the idf frame must echo stats)."""
    bad = [t for t in terms if not _SAFE_TERM.match(t)]
    if bad:
        raise ValueError(f"terms must match {_SAFE_TERM.pattern}: {bad}")
    idf_pdf = idf.collect()
    idf_rows = {r["tok"]: int(r["idf_q"]) for r in idf_pdf}
    unknown = set(idf_rows) - set(terms)
    if unknown:
        raise ValueError(f"idf table carries non-query terms: {sorted(unknown)}")
    srow = stats.collect()
    if len(srow) != 1:
        raise ValueError(f"stats must be exactly one row, got {len(srow)}")
    n_docs, t_tokens = int(srow[0]["n_docs"]), int(srow[0]["t_tokens"])
    if idf_pdf and "fit_n_docs" in idf.columns:
        fps = {(int(r["fit_n_docs"]), int(r["fit_t_tokens"])) for r in idf_pdf}
        if fps != {(n_docs, t_tokens)}:
            raise ValueError(
                f"idf fit fingerprint {sorted(fps)} does not match stats "
                f"({n_docs}, {t_tokens}): idf and stats come from different fits"
            )

    out = doc_stream.select(
        "doc_id",
        F.size(tokens(F.lower(F.col("text")))).cast("long").alias("n_tokens"),
        tokens(F.lower(F.col("text"))).alias("__w"),
    )
    score = F.lit(0).cast("long")
    n_hit = F.lit(0).cast("long")
    for t in terms:
        if t not in idf_rows:  # absent from the corpus: no idf row batch-side
            continue
        out = out.withColumn(
            f"__tf_{t}",
            F.size(F.filter(F.col("__w"), lambda x: x == F.lit(t))).cast(  # noqa: B023
                "long"
            ),
        )
        # the batch query's bigint expression verbatim, T/N as literals
        out = out.withColumn(
            f"__s_{t}",
            F.expr(
                f"CASE WHEN __tf_{t} > 0 THEN "
                f"(CAST({idf_rows[t]} AS BIGINT) * 44 * CAST({t_tokens} AS BIGINT)"
                f" * __tf_{t}) div "
                f"(20 * CAST({t_tokens} AS BIGINT) * __tf_{t}"
                f" + 6 * CAST({t_tokens} AS BIGINT)"
                f" + 18 * n_tokens * CAST({n_docs} AS BIGINT)) "
                f"ELSE CAST(0 AS BIGINT) END"
            ),
        )
        score = score + F.col(f"__s_{t}")
        n_hit = n_hit + (F.col(f"__tf_{t}") > 0).cast("long")

    return out.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, score).alias("score_q"),
        F.when(F.col("n_tokens") > 0, n_hit).otherwise(F.lit(0)).alias(
            "n_terms_hit"
        ),
    )

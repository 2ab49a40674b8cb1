"""Text-analysis operators for the training-data pipeline (north-star ops
beyond the reference: token counting, quality scoring, language-ID heuristic,
document fingerprinting).

Design: every per-document metric is computed with array higher-order
functions on the `text` column — a single narrow map stage, zero shuffles,
fully whole-stage-codegen. At 100 TB this scans and emits without any
exchange; only the optional downstream aggregation shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    marker_hits,
    sql_marker_hits,
    sql_tokens,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register

# ---------------------------------------------------------------------------
# text_tokens — token counting (whitespace tokenizer)
# ---------------------------------------------------------------------------

_TOK = sql_tokens("text")

_TOKENS_ORACLE = f"""
SELECT
  doc_id,
  len({_TOK}) AS n_tokens,
  len(list_distinct({_TOK})) AS n_unique,
  CAST(list_aggregate(list_transform({_TOK}, t -> CAST(len(t) AS BIGINT)), 'sum') AS DOUBLE)
    / len({_TOK}) AS avg_token_len,
  CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}) AS ttr
FROM documents
"""


@register("text_tokens", _TOKENS_ORACLE, tags=("text",), bench=True)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tokens = F.size(tok).cast("long")
    n_unique = F.size(F.array_distinct(tok)).cast("long")
    total_len = F.aggregate(
        F.transform(tok, lambda t: F.length(t).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        (total_len.cast("double") / n_tokens).alias("avg_token_len"),
        (n_unique.cast("double") / n_tokens).alias("ttr"),
    )


# ---------------------------------------------------------------------------
# text_quality — heuristic quality scoring (length, stopword ratio,
# punctuation/digit density) — the LLM-corpus filtering shape
# ---------------------------------------------------------------------------

_STOP = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

_QUALITY_ORACLE = f"""
SELECT
  doc_id,
  n_chars,
  len({_TOK}) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / n_chars AS digit_ratio,
  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / n_chars AS punct_ratio,
  CAST(len(list_filter({_TOK}, t -> list_contains({_STOP}, t))) AS DOUBLE) / len({_TOK}) AS stopword_ratio,
  CASE WHEN len({_TOK}) >= 20
        AND CAST(len(list_filter({_TOK}, t -> list_contains({_STOP}, t))) AS DOUBLE) / len({_TOK}) >= 0.01
        AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / n_chars <= 0.2
       THEN 1 ELSE 0 END AS passes_filter
FROM documents
"""


@register("text_quality", _QUALITY_ORACLE, tags=("text",), bench=True)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    tok = tokens(t)
    n_tokens = F.size(tok).cast("long")
    digit_ratio = F.regexp_count(t, F.lit("[0-9]")).cast("double") / F.col("n_chars")
    punct_ratio = F.regexp_count(t, F.lit("[^a-zA-Z0-9 ]")).cast("double") / F.col("n_chars")
    stop_ratio = marker_hits(tok, EN_STOPWORDS).cast("double") / n_tokens
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.when(
            (n_tokens >= 20) & (stop_ratio >= 0.01) & (punct_ratio <= 0.2), 1
        )
        .otherwise(0)
        .alias("passes_filter"),
    )


# ---------------------------------------------------------------------------
# text_langid — n-gram/stopword language-ID heuristic: score each language's
# marker set, argmax with fixed priority tiebreak
# ---------------------------------------------------------------------------

def _lang_sql() -> str:
    hits = {lang: sql_marker_hits(_TOK, m) for lang, m in LANG_MARKERS.items()}
    best = f"GREATEST({hits['en']}, {hits['es']}, {hits['fr']}, {hits['de']})"
    return f"""
SELECT
  doc_id,
  lang AS labeled_lang,
  {hits['en']} AS hits_en,
  {hits['es']} AS hits_es,
  {hits['fr']} AS hits_fr,
  {hits['de']} AS hits_de,
  CASE
    WHEN {best} = 0 THEN 'und'
    WHEN {hits['en']} = {best} THEN 'en'
    WHEN {hits['es']} = {best} THEN 'es'
    WHEN {hits['fr']} = {best} THEN 'fr'
    ELSE 'de'
  END AS pred_lang
FROM documents
"""


@register("text_langid", _lang_sql(), tags=("text",))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    hits = {lang: marker_hits(tok, m).cast("long") for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, "und")
        .when(hits["en"] == best, "en")
        .when(hits["es"] == best, "es")
        .when(hits["fr"] == best, "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits["en"].alias("hits_en"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
        hits["de"].alias("hits_de"),
        pred.alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# text_fingerprint — document fingerprint: min-hash-of-shingles digest +
# content hash (the dedup-key shape; rolling-hash analog done portably)
# ---------------------------------------------------------------------------

_SH = sql_word_shingles(_TOK, 3)

_FP_ORACLE = f"""
SELECT
  doc_id,
  md5(text) AS content_hash,
  COALESCE(list_aggregate(list_transform({_SH}, s -> md5(s)), 'min'), 'EMPTY') AS shingle_fp,
  len({_SH}) AS n_shingles
FROM documents
"""


@register("text_fingerprint", _FP_ORACLE, tags=("text", "dedup"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    sh = word_shingles(tok, 3)
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.coalesce(F.array_min(F.transform(sh, F.md5)), F.lit("EMPTY")).alias("shingle_fp"),
        F.size(sh).cast("long").alias("n_shingles"),
    )


# ---------------------------------------------------------------------------
# text_word_histogram — corpus-level token histogram (the inverted-index /
# vocabulary-build shape): explode tokens -> count -> deterministic top-k
# ---------------------------------------------------------------------------

_TOPN_WORDS = 20

_WORDHIST_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS word FROM documents)
SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
FROM toks
GROUP BY word
ORDER BY n DESC, word
LIMIT {_TOPN_WORDS}
"""


@register("text_word_histogram", _WORDHIST_ORACLE, tags=("text", "agg"), bench=True)
def text_word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    return (
        toks.groupBy("word")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(_TOPN_WORDS)
    )


# ---------------------------------------------------------------------------
# text_tfidf — TF-IDF feature scores (corpus-feature shape): explode tokens,
# per-doc term counts, log-idf from document frequency, top term per doc
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS word FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word AS top_word, tfidf AS top_score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
  FROM scored
) WHERE rn = 1
"""


@register("text_tfidf", _TFIDF_ORACLE, tags=("text", "agg"))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_counts = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id", F.col("word").alias("top_word"), F.col("tfidf").alias("top_score"))
    )


# ---------------------------------------------------------------------------
# text_chunk — fixed-size token windows with overlap (the LLM-training
# chunking op): every doc emits ceil(n/stride) chunks of up to CHUNK tokens,
# consecutive chunks sharing CHUNK-STRIDE tokens. Pure array expressions:
# sequence() for starts, slice() per start — one narrow pass, fan-out via
# explode, no shuffle (the output is chunk metadata + portable content
# hash, so the oracle is exact).
# ---------------------------------------------------------------------------

_CHUNK = 60
_STRIDE = 45  # overlap = 15 tokens

_CHUNK_ORACLE = f"""
WITH t AS (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents),
s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), {_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       start // {_STRIDE} AS chunk_idx,
       len(list_slice(toks, start + 1, start + {_CHUNK})) AS n_tokens,
       ('0x' || substr(md5(array_to_string(
         list_slice(toks, start + 1, start + {_CHUNK}), ' ')), 1, 8))::BIGINT
         AS chunk_hash
FROM s
"""


@register("text_chunk", _CHUNK_ORACLE, tags=("text",))
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from d3d_etl_spark.functions.strings import md5_int

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    starts = F.sequence(F.lit(0), F.size(tok) - 1, F.lit(_STRIDE))
    base = docs.select(
        "doc_id", tok.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.expr(f"slice(toks, start + 1, {_CHUNK})")
    return base.select(
        "doc_id",
        F.expr(f"start div {_STRIDE}").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        md5_int(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# text_pack_sequences — sequence packing: stream docs in doc_id order,
# cut the token stream every BUDGET tokens; a doc belongs to the sequence
# where it starts. Needs a GLOBAL prefix sum — the naive global-order
# window collapses to one partition at scale, so this uses the two-level
# pattern: per-bucket within-window cumsum + tiny running bucket offsets
# broadcast back. The oracle states the same semantics with the plain
# global window (fine for DuckDB).
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512
# doc_ids per prefix-sum bucket. SIZING RULE at scale: the offsets table is
# one row per bucket and must stay broadcastable, so pick bucket size ≈
# n_docs / (a few × cluster parallelism) — e.g. 1B docs on 1000 executors
# -> ~100k docs/bucket -> 10k offset rows. 100 here matches the testdata.
_PACK_BUCKET = 100

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len({sql_tokens("text")}) AS n FROM documents
),
c AS (
  SELECT doc_id, n,
         COALESCE(SUM(n) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM t
)
SELECT CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM c
GROUP BY 1
"""


@register("text_pack_sequences", _PACK_ORACLE, tags=("text",))
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # integer div (not double-cast division): exact for ids/counts past 2^53
    t = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n"),
        F.expr(f"doc_id div {_PACK_BUCKET}").alias("bucket"),
    )
    # level 1: per-bucket running sum (parallel across buckets)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = t.withColumn("cum_in", F.coalesce(F.sum("n").over(w_in), F.lit(0)))
    # level 2: running offset across buckets (bucket list is tiny: one row
    # per _PACK_BUCKET docs -> single-partition window is fine, broadcast back)
    totals = t.groupBy("bucket").agg(F.sum("n").alias("btotal"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("btotal").over(w_b), F.lit(0))
    ).select("bucket", "offset")
    c = within.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_before", F.col("offset") + F.col("cum_in")
    )
    return (
        c.withColumn("seq_id", F.expr(f"cum_before div {_PACK_BUDGET}"))
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("seq_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )

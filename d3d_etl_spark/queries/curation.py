"""z_corpus_curation — the end-to-end corpus CURATION pipeline as one
oracled query, composing the round-4 quality operators the way a real
training-data run chains them:

1. statistical quality gate: drop documents whose bigram-LM mean surprisal
   exceeds the review band (z_corpus_lm_score's nll; docs with <2 tokens
   are ineligible);
2. exact duplicated-span gate: drop documents whose duplicated-span
   fraction crosses the trim threshold (z_corpus_span_dedup);
3. temperature-weighted mixing OVER THE SURVIVORS: the alpha=0.5 language
   rebalance and token budget are recomputed on the post-filter corpus —
   filtering shifts the language distribution, so mixing must see the
   survivors, not the raw corpus.

This is the curation sibling of corpus_pipeline (dedup -> split -> pack):
together they cover both halves of the data-prep story. The whole chain is
exact — every stage reuses the quantization discipline of its standalone
query, so the composition hash-matches end-to-end.

Scale shape: the LM stats stay vocab-sized, the span counts stay
span-cardinality-sized, the survivor filter is two doc-grain joins, and
the mixing decision never shuffles the corpus. Each stage's standalone
scale notes apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d3d_etl_spark.functions.sampling import sql_hash_bucket
from d3d_etl_spark.io import load_table
from d3d_etl_spark.queries.registry import register
from d3d_etl_spark.queries.sampling import (
    _MIX_U_MOD,
    mixing_doc_grain,
    mixing_profile,
)
from d3d_etl_spark.queries.textops import (
    _LM_CTES,
    _LM_Q,
    _LM_REVIEW_T,
    _SPAN_CTES,
    _SPAN_TRIM_T,
    z_corpus_lm_score,
    z_corpus_span_dedup,
)

_CURATION_ORACLE = f"""
WITH {_LM_CTES},
{_SPAN_CTES},
spanfrac AS (
  SELECT sp.doc_id,
         CAST(SUM(CASE WHEN spc.c >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS frac
  FROM sp JOIN spc ON sp.sh = spc.sh
  GROUP BY 1
),
d AS (
  SELECT doc_id, lang, len(t.w) AS n_tok,
         {sql_hash_bucket("doc_id", "mix")} % {_MIX_U_MOD} AS u
  FROM documents JOIN toks t USING (doc_id)
),
surv AS (
  SELECT d.* FROM d
  JOIN scored sc ON d.doc_id = sc.doc_id
  LEFT JOIN spanfrac sf ON d.doc_id = sf.doc_id
  WHERE CAST(sc.s_sum AS DOUBLE) / sc.n_bigrams / {_LM_Q} <= {_LM_REVIEW_T}
    AND COALESCE(sf.frac >= {_SPAN_TRIM_T}, FALSE) = FALSE
),
ls AS (
  SELECT lang, COUNT(*) AS n_surv,
         CAST(SUM(n_tok) AS BIGINT) AS t_l,
         CAST(ROUND(SQRT(CAST(SUM(n_tok) AS DOUBLE)) * 1000000) AS BIGINT) AS s_l
  FROM surv GROUP BY lang
),
tot AS (SELECT CAST(SUM(t_l) AS BIGINT) AS t_all, CAST(SUM(s_l) AS BIGINT) AS s_all FROM ls),
p AS (
  SELECT lang, n_surv, t_l,
         LEAST({_MIX_U_MOD},
               CAST(ROUND({_MIX_U_MOD} * (CAST(t_all AS DOUBLE) * s_l)
                          / (2.0 * s_all * CAST(t_l AS DOUBLE))) AS BIGINT)) AS p_int
  FROM ls CROSS JOIN tot
),
corp AS (SELECT lang, COUNT(*) AS n_corpus FROM documents GROUP BY 1)
SELECT s.lang,
       MAX(corp.n_corpus) AS n_corpus,
       MAX(p.n_surv) AS n_survivors,
       MAX(p.t_l) AS surviving_tokens,
       CAST(MAX(p.p_int) AS DOUBLE) / {_MIX_U_MOD} AS p_accept,
       CAST(SUM(CASE WHEN s.u < p.p_int THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       CAST(SUM(CASE WHEN s.u < p.p_int THEN s.n_tok ELSE 0 END) AS BIGINT) AS final_tokens
FROM surv s
JOIN p ON s.lang = p.lang
JOIN corp ON s.lang = corp.lang
GROUP BY s.lang
"""


@register("z_corpus_curation", _CURATION_ORACLE, tags=("corpus", "pipeline"), bench=True)
def z_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lm = z_corpus_lm_score(spark, sf_dir).select("doc_id", "nll")
    span = z_corpus_span_dedup(spark, sf_dir).select("doc_id", "would_trim")

    d = mixing_doc_grain(docs, materialize=False)  # surv below carries the barrier
    surv = (
        d.join(lm, "doc_id")
        .join(span, "doc_id", "left")
        .where(
            (F.col("nll") <= _LM_REVIEW_T)
            & ~F.coalesce(F.col("would_trim"), F.lit(False))
        )
        .select("doc_id", "lang", "n_tok", "u")
        # mixing_profile consumes the survivor frame twice (lang stats +
        # accept groupBy): barrier so the lm/span joins run once
        .localCheckpoint()
    )
    prof = mixing_profile(surv)
    corp = docs.groupBy("lang").agg(F.count("*").alias("n_corpus"))
    return prof.join(F.broadcast(corp), "lang").select(
        "lang",
        "n_corpus",
        F.col("n_docs").alias("n_survivors"),
        F.col("total_tokens").alias("surviving_tokens"),
        "p_accept",
        F.col("n_kept").alias("n_final"),
        F.col("kept_tokens").alias("final_tokens"),
    )

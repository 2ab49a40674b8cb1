"""Cross-engine fuzz: every Spark scalar that has a DuckDB SQL twin is run
over RANDOM inputs on BOTH engines and compared bit-for-bit.

The oracle harness proves twins agree on the fixed testdata corpora; this
fuzz proves the agreement is a property of the functions, not of the
corpus — whitespace runs, unicode, empty strings, punctuation-only rows,
and hash-edge inputs all go through the same pipe.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

# seeded generator: reproducible corpus of nasty strings
_R = random.Random(0xD3D)
_ALPHABETS = [
    "abc XYZ 012",
    " \t\n",
    "é漢字ß øñ",
    ".,;:!?'\"-_/\\()[]",
    "aaaa bbbb",
]


def _rand_string() -> str:
    alpha = _R.choice(_ALPHABETS) + "abcdefgh "
    return "".join(_R.choice(alpha) for _ in range(_R.randint(0, 40)))


_STRINGS = [""] + [" "] + ["   leading  and   trailing   "] + [
    _rand_string() for _ in range(120)
]


def _both(spark, spark_col_fn, sql_expr_fn):
    """Evaluate a Spark Column fn and its SQL twin over _STRINGS, return
    (spark_values, duck_values) aligned by row id."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_STRINGS)], "id long, s string"
    )
    got = {
        r["id"]: r["v"]
        for r in df.select("id", spark_col_fn(F.col("s")).alias("v")).collect()
    }
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (id BIGINT, s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(_STRINGS)))
        want = {
            row[0]: row[1]
            for row in con.execute(
                f"SELECT id, {sql_expr_fn('s')} FROM t"
            ).fetchall()
        }
    finally:
        con.close()
    return got, want


def _assert_equal(got, want):
    assert set(got) == set(want)
    for k in got:
        g, w = got[k], want[k]
        if isinstance(g, list) or isinstance(w, list):
            assert list(g or []) == list(w or []), (k, _STRINGS[k], g, w)
        else:
            assert g == w, (k, _STRINGS[k], g, w)


def test_tokens_twin(spark):
    from d3d_etl_spark.functions.text import sql_tokens, tokens

    _assert_equal(*_both(spark, tokens, sql_tokens))


def test_word_shingles_twin(spark):
    from d3d_etl_spark.functions.text import (
        sql_tokens,
        sql_word_shingles,
        tokens,
        word_shingles,
    )

    for n in (2, 3, 5):
        _assert_equal(
            *_both(
                spark,
                lambda c, n=n: word_shingles(tokens(c), n),
                lambda e, n=n: sql_word_shingles(sql_tokens(e), n),
            )
        )


def test_md5_int_twin(spark):
    from d3d_etl_spark.functions.strings import md5_int, sql_md5_int

    for hex_chars in (4, 8, 15):
        _assert_equal(
            *_both(
                spark,
                lambda c, h=hex_chars: md5_int(c, h),
                lambda e, h=hex_chars: sql_md5_int(e, h),
            )
        )


def test_hash_bucket_twin(spark):
    from d3d_etl_spark.functions.sampling import hash_bucket, sql_hash_bucket

    for salt in ("", "mix", "strat"):
        _assert_equal(
            *_both(
                spark,
                lambda c, s=salt: hash_bucket(c, s),
                lambda e, s=salt: sql_hash_bucket(e, s),
            )
        )


def test_marker_hits_twin(spark):
    from d3d_etl_spark.functions.text import (
        marker_hits,
        sql_marker_hits,
        sql_tokens,
        tokens,
    )

    markers = ("the", "aaaa", "é漢字ß")
    _assert_equal(
        *_both(
            spark,
            lambda c: marker_hits(tokens(c), markers),
            lambda e: sql_marker_hits(sql_tokens(e), markers),
        )
    )


def test_clean_positions_twin(spark):
    from d3d_etl_spark.functions.strings import clean_positions, sql_clean_positions

    global _STRINGS
    # positions-shaped fuzz on top of the generic strings
    pos = ["1B/2B", "P (5)", "OF OF", "C/1B (12)", "", "UTL"] + _STRINGS[:40]
    saved = _STRINGS
    try:
        _STRINGS = pos
        _assert_equal(*_both(spark, clean_positions, sql_clean_positions))
    finally:
        _STRINGS = saved


def test_normalize_division_twin(spark):
    from d3d_etl_spark.functions.strings import (
        normalize_division,
        sql_normalize_division,
    )

    global _STRINGS
    divs = ["1", "2", "3", "ncaa_1", "ncaa_3", "d1", "", "xyz"] + _STRINGS[:20]
    saved = _STRINGS
    try:
        _STRINGS = divs
        _assert_equal(*_both(spark, normalize_division, sql_normalize_division))
    finally:
        _STRINGS = saved


# --- integer-keyed twins (the round-4 selection formulas) -------------------

_INTS = (
    [0, 1, 2, 15, 16, 17, 31, 32, 499, 500, 10**6, 2**31 - 1, 2**40 + 7]
    + [_R.randint(0, 2**50) for _ in range(80)]
)


def _both_ints(spark, spark_col_fn, sql_expr_fn):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(_INTS)], "id long, k long")
    got = {
        r["id"]: r["v"]
        for r in df.select("id", spark_col_fn(F.col("k")).alias("v")).collect()
    }
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (id BIGINT, k BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(_INTS)))
        want = {
            row[0]: row[1]
            for row in con.execute(f"SELECT id, {sql_expr_fn('k')} FROM t").fetchall()
        }
    finally:
        con.close()
    return got, want


def test_hash_split_twin(spark):
    """hash_split vs sql_hash_split on random bigint keys with the
    safe-split weights — the threshold arithmetic and arm order must agree
    exactly (a one-off would silently reroute documents between splits)."""
    from d3d_etl_spark.functions.sampling import hash_split, sql_hash_split
    from d3d_etl_spark.queries.dedup import _SAFE_SPLIT_WEIGHTS

    got, want = _both_ints(
        spark,
        lambda c: hash_split(c, _SAFE_SPLIT_WEIGHTS),
        lambda e: sql_hash_split(e, _SAFE_SPLIT_WEIGHTS),
    )
    _assert_equal(got, want)
    assert set(got.values()) == {"train", "val", "test"}


def test_serpentine_shard_twin(spark):
    """The serpentine dealing expression (z_corpus_shard_balance) on random
    ranks: Spark integer-div CASE vs the DuckDB // CASE, bit-for-bit."""
    from d3d_etl_spark.queries.textops import _SHARDS

    got, want = _both_ints(
        spark,
        lambda c: F.expr(
            f"CASE WHEN (k div {_SHARDS}) % 2 = 0 THEN k % {_SHARDS} "
            f"ELSE {_SHARDS} - 1 - (k % {_SHARDS}) END"
        ).cast("long"),
        lambda e: (
            f"CASE WHEN ({e} // {_SHARDS}) % 2 = 0 THEN {e} % {_SHARDS} "
            f"ELSE {_SHARDS} - 1 - ({e} % {_SHARDS}) END"
        ),
    )
    _assert_equal(got, want)
    assert set(got.values()) <= set(range(_SHARDS))


def test_dsir_gumbel_twin(spark):
    """The quantized Gumbel perturbation (z_corpus_dsir) on random doc ids:
    two nested LN on identical doubles inside a ROUND — both engines must
    produce the identical integer for every key."""
    from d3d_etl_spark.functions.strings import md5_int, sql_md5_int
    from d3d_etl_spark.queries.curation import _DSIR_Q, _DSIR_U_MOD

    def spark_g(c):
        u = (
            md5_int(F.concat(F.lit("dsir:"), c.cast("string"))) % _DSIR_U_MOD + 0.5
        ) / float(_DSIR_U_MOD)
        return F.round(_DSIR_Q * (-F.log(-F.log(u)))).cast("long")

    def sql_g(e):
        h = sql_md5_int(f"'dsir:' || CAST({e} AS VARCHAR)")
        return (
            f"CAST(ROUND({_DSIR_Q} * (-LN(-LN(({h} % {_DSIR_U_MOD} + 0.5)"
            f" / {_DSIR_U_MOD}.0)))) AS BIGINT)"
        )

    got, want = _both_ints(spark, spark_g, sql_g)
    _assert_equal(got, want)


def test_lr_sigmoid_quantization_twin(spark):
    """The LR probability quantization round(1e6 * sigmoid(m)) over a sweep
    of exact margins m = k/1e6 - 25 (covering saturated tails and the
    steep center): exp() of identical doubles inside a ROUND must quantize
    identically on both engines."""
    got, want = _both_ints(
        spark,
        lambda c: F.round(
            1_000_000
            / (F.lit(1.0) + F.exp(-((c % 50_000_000).cast("double") / 1e6 - 25.0)))
        ).cast("long"),
        lambda e: (
            f"CAST(ROUND(1000000 / (1.0 + EXP(-(CAST({e} % 50000000 AS DOUBLE)"
            f" / 1000000.0 - 25.0)))) AS BIGINT)"
        ),
    )
    _assert_equal(got, want)


def test_quantile_threshold_selection_twin(spark):
    """The round-5 corpus-fraction selection rule (z_corpus_dsir_threshold /
    z_sample_stratified_exact): on RANDOM integer scores with planted ties,
    the Spark two-level prefix-count threshold and DuckDB's cumulative
    quantile select the IDENTICAL doc set — including the all-ties-kept
    contract at the boundary."""
    from pyspark.sql import Window

    rng = random.Random(0xBEEF)
    rows = [
        (i, rng.choice([rng.randint(-(10**9), 10**9), rng.randint(-5, 5)]))
        for i in range(400)
    ]  # the second branch plants heavy ties
    k = 80
    df = spark.createDataFrame(rows, "doc_id long, score long")
    cnt = (
        df.groupBy("score")
        .agg(F.count("*").alias("c"))
        .withColumn("b", F.floor(F.col("score") / 4096.0).cast("long"))
    )
    per_b = cnt.groupBy("b").agg(F.sum("c").alias("bc"))
    w_above = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_b.select("b", F.coalesce(F.sum("bc").over(w_above), F.lit(0)).alias("off"))
    w_in = (
        Window.partitionBy("b").orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnt.join(F.broadcast(offsets), "b").select(
        "score", (F.col("off") + F.sum("c").over(w_in)).alias("cge")
    )
    thr = cum.where(F.col("cge") >= k).agg(F.max("score").alias("t"))
    got = {
        r.doc_id
        for r in df.crossJoin(F.broadcast(thr)).where(F.col("score") >= F.col("t")).collect()
    }

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (doc_id BIGINT, score BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = {
            r[0]
            for r in con.execute(f"""
                WITH cnt AS (SELECT score, COUNT(*) AS c FROM t GROUP BY 1),
                cum AS (SELECT score, SUM(c) OVER (ORDER BY score DESC) AS cge FROM cnt),
                thr AS (SELECT MAX(score) AS x FROM cum WHERE cge >= {k})
                SELECT doc_id FROM t CROSS JOIN thr WHERE score >= thr.x
            """).fetchall()
        }
    finally:
        con.close()
    assert got == want
    assert len(got) >= k  # ties-kept superset contract


def test_hamilton_apportionment_twin(spark):
    """Largest-remainder apportionment (z_sample_stratified_exact): random
    stratum sizes -> identical quotas on both engines, summing exactly to
    K, each within 1 of the exact proportional share."""
    from pyspark.sql import Window

    rng = random.Random(0xFEED)
    for trial in range(5):
        sizes = [(f"s{i}", rng.randint(1, 1000)) for i in range(rng.randint(2, 12))]
        k = rng.randint(1, sum(n for _, n in sizes))
        df = spark.createDataFrame(sizes, "lang string, n_l long")
        tot = df.agg(F.sum("n_l").alias("n"))
        base = df.crossJoin(F.broadcast(tot)).select(
            "lang", "n_l",
            F.expr(f"({k} * n_l) div n").alias("b"),
            F.expr(f"({k} * n_l) % n").alias("rem"),
        )
        lo = base.agg((F.lit(k) - F.sum("b")).alias("leftover"))
        w = Window.orderBy(F.desc("rem"), F.asc("lang"))
        got = {
            r.lang: r.q
            for r in base.withColumn("r", F.row_number().over(w))
            .crossJoin(F.broadcast(lo))
            .select(
                "lang",
                (F.col("b") + F.when(F.col("r") <= F.col("leftover"), 1).otherwise(0))
                .cast("long").alias("q"),
            )
            .collect()
        }
        con = duckdb.connect()
        try:
            con.execute("CREATE TABLE c (lang VARCHAR, n_l BIGINT)")
            con.executemany("INSERT INTO c VALUES (?, ?)", sizes)
            want = dict(
                con.execute(f"""
                    WITH tot AS (SELECT SUM(n_l) AS n FROM c),
                    base AS (SELECT lang, n_l, ({k} * n_l) // n AS b, ({k} * n_l) % n AS rem
                             FROM c CROSS JOIN tot),
                    lo AS (SELECT {k} - SUM(b) AS leftover FROM base),
                    rr AS (SELECT lang, b, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS r FROM base)
                    SELECT lang, b + CASE WHEN r <= lo.leftover THEN 1 ELSE 0 END
                    FROM rr CROSS JOIN lo
                """).fetchall()
            )
        finally:
            con.close()
        assert got == want, (trial, got, want)
        assert sum(got.values()) == k
        n = sum(x for _, x in sizes)
        for lang, sz in sizes:
            assert abs(got[lang] - k * sz / n) < 1, (lang, got[lang], k * sz / n)

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

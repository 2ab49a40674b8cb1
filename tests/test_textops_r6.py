"""Round-6 textops contracts: Gopher repetition signals (z_corpus_repetition)
and exact-integer BM25 retrieval (z_text_bm25).

Pins: hand-computed quantized fractions on a planted corpus (the integer
arithmetic is checkable on paper), struct-max tie-break determinism,
engine/oracle parity on degenerate documents, and a pure-python BM25
recurrence at exact integer parity (the same external-oracle discipline as
the PageRank planted-star test)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_documents(path, texts, start_id=1):
    rows = [
        {
            "doc_id": start_id + i,
            "text": t,
            "lang": "en",
            "source": "planted",
            "n_chars": len(t),
        }
        for i, t in enumerate(texts)
    ]
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    pq.write_table(tbl, str(path / "documents.parquet"))


def _oracle_documents(sql, path):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/documents.parquet')"
        )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# z_corpus_repetition
# ---------------------------------------------------------------------------


def test_repetition_hand_computed(spark, tmp_path):
    """Planted 'a b a b a b': every quantized signal is checkable on paper.

    den = len('a b a b a b') = 11
    2-grams: 'a b'x3, 'b a'x2 -> top = 3*3 = 9;  dup = 2*3 + 1*3 = 9
    3-grams: 'a b a'x2, 'b a b'x2 -> struct-max ties on cnt, takes the
             lexicographically greater gram 'b a b' -> top = 2*5 = 10;
             dup = 5 + 5 = 10
    4-grams: 'a b a b'x2, 'b a b a'x1 -> top = 2*7 = 14; (dup4 unused)
    """
    from d3d_etl_spark.queries import textops

    _write_documents(tmp_path, ["a b a b a b", "x"])
    out = textops.z_corpus_repetition(spark, str(tmp_path)).toPandas()
    # the single-token doc has < 2 tokens and is dropped
    assert sorted(out["doc_id"]) == [1]
    r = out.set_index("doc_id").loc[1]
    assert r.top2_q == 9 * 1_000_000 // 11
    assert r.top3_q == 10 * 1_000_000 // 11  # tie broken to 'b a b'
    assert r.top4_q == 14 * 1_000_000 // 11
    assert r.dup2_q == 9 * 1_000_000 // 11
    assert r.dup3_q == 10 * 1_000_000 // 11
    assert not r.rep_pass


def test_repetition_unique_doc_passes(spark, tmp_path):
    """A 30-token all-unique doc sits under every cap: top-gram fractions
    are just gram_len/den and duplicates are zero."""
    from d3d_etl_spark.queries import textops

    toks = [chr(ord("a") + i) for i in range(26)] + ["0", "1", "2", "3"]
    _write_documents(tmp_path, [" ".join(toks)])
    r = textops.z_corpus_repetition(spark, str(tmp_path)).toPandas().iloc[0]
    den = 2 * 30 - 1
    assert r.top2_q == 3 * 1_000_000 // den
    assert r.top3_q == 5 * 1_000_000 // den
    assert r.top4_q == 7 * 1_000_000 // den
    assert r.dup2_q == 0 and r.dup3_q == 0
    assert r.rep_pass


def test_repetition_engine_oracle_parity_degenerate(spark, tmp_path):
    """Engine == DuckDB oracle on hostile documents: empty text, whitespace
    only, single token (dropped), exactly 2 tokens (no 3/4-grams -> NULL
    branch of the pivot), unicode grams, and a long repetitive doc."""
    from d3d_etl_spark.oracle import canonicalize
    from d3d_etl_spark.queries import textops

    _write_documents(
        tmp_path,
        [
            "",
            "   \t  ",
            "solo",
            "two tokens",
            "über café über café über",
            "spam " * 40 + "spam",
        ],
    )
    eng = canonicalize(textops.z_corpus_repetition(spark, str(tmp_path)).toPandas())
    ora = canonicalize(_oracle_documents(textops._REP_ORACLE, tmp_path))
    pd.testing.assert_frame_equal(eng, ora)
    # the two whitespace-degenerate docs and the single-token doc are gone
    assert sorted(eng["doc_id"]) == [4, 5, 6]


# ---------------------------------------------------------------------------
# z_text_bm25
# ---------------------------------------------------------------------------


def _bm25_py(texts, terms, q, k):
    """Pure-python mirror of the exact-integer BM25 contract (half-away
    rounding on the quantized LN; everything after is integer)."""
    toks = {i + 1: t.lower().split() for i, t in enumerate(texts)}
    toks = {d: w for d, w in toks.items() if w}
    dl = {d: len(w) for d, w in toks.items()}
    n, tt = len(dl), sum(dl.values())
    tf: dict = {}
    for d, w in toks.items():
        for t in w:
            if t in terms:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df: dict = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    idf = {
        t: math.floor(q * math.log((2 * n + 2) / (2 * df[t] + 1)) + 0.5) for t in df
    }
    scores: dict = {}
    hits: dict = {}
    for (d, t), f_ in tf.items():
        s = (idf[t] * 44 * tt * f_) // (20 * tt * f_ + 6 * tt + 18 * dl[d] * n)
        scores[d] = scores.get(d, 0) + s
        hits[d] = hits.get(d, 0) + 1
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s, hits[d]) for i, (d, s) in enumerate(top)]


def test_bm25_pure_python_parity(spark, tmp_path):
    """Engine output == a pure-python integer BM25 over a planted corpus
    that exercises repeats, multi-term hits, rare-vs-common idf, and docs
    with zero query terms."""
    from d3d_etl_spark.queries import textops

    texts = [
        "hash join hash join hash",
        "the quick brown fox jumps over the lazy dog",
        "vector scan vector scan vector scan vector",
        "dup dup dup dup filler filler filler filler filler filler",
        "hash alone in a much longer document " + "pad " * 30,
        "join vector dup scan hash all five terms once each",
        "nothing relevant here at all",
    ]
    _write_documents(tmp_path, texts)
    eng = (
        textops.z_text_bm25(spark, str(tmp_path))
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    exp = _bm25_py(texts, set(textops._BM_TERMS), textops._BM_Q, textops._BM_K)
    got = list(
        eng[["rank", "doc_id", "score_q", "n_terms_hit"]].itertuples(
            index=False, name=None
        )
    )
    assert got == exp


def test_bm25_tie_breaks_on_doc_id(spark, tmp_path):
    """Identical documents score identically; rank order falls back to
    doc_id ascending (the determinism contract)."""
    from d3d_etl_spark.queries import textops

    _write_documents(tmp_path, ["hash join scan"] * 4 + ["no terms here"])
    eng = (
        textops.z_text_bm25(spark, str(tmp_path))
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(eng["doc_id"]) == [1, 2, 3, 4]
    assert eng["score_q"].nunique() == 1
    assert list(eng["rank"]) == [1, 2, 3, 4]


def test_bm25_rare_term_outranks_common(spark, tmp_path):
    """Same tf and dl: the doc holding the rarer term scores higher (idf
    monotonicity survives the integer quantization)."""
    from d3d_etl_spark.queries import textops

    texts = (
        ["vector pad0 pad1 pad2"]  # doc 1: rare term (df=1)
        + [f"hash padA{i} padB{i} padC{i}" for i in range(5)]  # common (df=6)
        + ["hash padX padY padZ"]
    )
    _write_documents(tmp_path, texts)
    eng = textops.z_text_bm25(spark, str(tmp_path)).toPandas()
    by_doc = eng.set_index("doc_id")["score_q"]
    assert by_doc.loc[1] > by_doc.drop(1).max()


# ---------------------------------------------------------------------------
# z_corpus_span_scrub
# ---------------------------------------------------------------------------


def _chained_hash(chunk_texts):
    """The published clean_hash contract: md5 of each chunk's space-joined
    kept text, hex digests concatenated in chunk order, md5'd again."""
    import hashlib

    hexes = "".join(
        hashlib.md5(t.encode()).hexdigest() for t in chunk_texts
    )
    return hashlib.md5(hexes.encode()).hexdigest()


def test_span_scrub_hand_computed(spark, tmp_path):
    """Planted corpus: doc 2 repeats doc 1's 10-token prefix (every 8-token
    span inside it is owned by doc 1 -> positions 0..9 scrubbed, unique tail
    kept); doc 1 as owner keeps everything; doc 3's WITHIN-doc repetition is
    untouched (cross-doc rule only); a short doc has no spans at all."""
    import hashlib

    from d3d_etl_spark.queries import textops

    shared = " ".join(f"t{i}" for i in range(10))
    texts = [
        shared + " ownertail1 ownertail2",          # doc 1: owner
        shared + " unique2a unique2b unique2c",     # doc 2: prefix scrubbed
        "r0 r1 r2 r3 r4 r5 r6 r7 r0 r1 r2 r3 r4 r5 r6 r7",  # doc 3: self-repeat
        "tiny doc",                                  # doc 4: < span width
    ]
    _write_documents(tmp_path, texts)
    out = (
        textops.z_corpus_span_scrub(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1].n_scrubbed == 0
    assert out.loc[3].n_scrubbed == 0  # owner-rule: within-doc repeats stay
    assert out.loc[4].n_scrubbed == 0
    r2 = out.loc[2]
    assert r2.n_tokens == 13 and r2.n_scrubbed == 10
    assert r2.scrub_q == 10 * 1_000_000 // 13
    expect = "unique2a unique2b unique2c"
    # chained (chunked) hash contract: md5 of the ordered chunk hashes —
    # a sub-chunk doc has exactly one chunk, so md5(hex(md5(text)))
    assert r2.clean_hash == _chained_hash([expect])
    # full-content check for an untouched doc too
    assert out.loc[1].clean_hash == _chained_hash([texts[0]])


def test_span_scrub_engine_oracle_parity_planted(spark, tmp_path):
    """Engine == DuckDB oracle on a hostile planted corpus: empty doc,
    whitespace doc, sub-span-width doc, a fully-scrubbed doc (every token
    covered -> md5('') branch), and chained ownership (3 docs sharing one
    span: the MIN doc_id owns, both others scrub)."""
    import pandas as pd

    from d3d_etl_spark.oracle import canonicalize
    from d3d_etl_spark.queries import textops

    shared = " ".join(f"s{i}" for i in range(8))  # exactly one span wide
    _write_documents(
        tmp_path,
        [
            "",
            "   ",
            "under span width",
            shared,            # doc 4: owner
            shared,            # doc 5: fully scrubbed -> clean_hash md5('')
            shared + " tail",  # doc 6: scrubs the shared 8, keeps tail
        ],
    )
    eng = canonicalize(
        textops.z_corpus_span_scrub(spark, str(tmp_path)).toPandas()
    )
    ora = canonicalize(_oracle_documents(textops._SCRUB_ORACLE, tmp_path))
    pd.testing.assert_frame_equal(eng, ora)
    byid = (
        textops.z_corpus_span_scrub(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
    )
    assert byid.loc[4].n_scrubbed == 0
    assert byid.loc[5].n_scrubbed == 8
    assert byid.loc[5].clean_hash == "d41d8cd98f00b204e9800998ecf8427e"
    assert byid.loc[6].n_scrubbed == 8 and byid.loc[6].n_tokens == 9


def test_span_scrub_mega_doc_bounded_chunks(spark, tmp_path, monkeypatch):
    """Mega-document bounded-buffer pin (the tests/test_skew.py pattern):
    with _SCRUB_CHUNK patched to 16, a 210-token document reconstructs
    through 14 per-chunk buffers (each <= 16 tokens) chained in chunk
    order — never one whole-document aggregation buffer. The pin is the
    hash itself: a regression back to single-buffer whole-doc hashing
    yields md5(text), which differs from the chained contract, and the
    physical plan must carry the chunk-keyed aggregate below doc grain."""
    from d3d_etl_spark.queries import textops

    monkeypatch.setattr(textops, "_SCRUB_CHUNK", 16)
    mega = [f"u{i}" for i in range(210)]  # all-unique: nothing scrubbed
    shared = " ".join(f"t{i}" for i in range(8))  # exactly one span wide
    _write_documents(
        tmp_path, [" ".join(mega), shared, shared + " tail"]
    )
    df = textops.z_corpus_span_scrub(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "div 16" in plan, "chunk-keyed aggregate missing from the plan"
    out = df.toPandas().set_index("doc_id")
    r1 = out.loc[1]
    assert r1.n_tokens == 210 and r1.n_scrubbed == 0
    chunks = [" ".join(mega[i : i + 16]) for i in range(0, 210, 16)]
    assert len(chunks) == 14  # genuinely multi-chunk (13 full + tail)
    assert r1.clean_hash == _chained_hash(chunks)
    # single-buffer regression sentinel: whole-doc md5 is NOT the contract
    assert r1.clean_hash != hashlib.md5(" ".join(mega).encode()).hexdigest()
    # the cross-doc scrub rule is still live in the same run
    assert out.loc[2].n_scrubbed == 0 and out.loc[3].n_scrubbed == 8


# ---------------------------------------------------------------------------
# z_text_tfidf_topk
# ---------------------------------------------------------------------------


def test_tfidf_topk_hand_computed(spark, tmp_path):
    """Planted 4-doc corpus, weights checkable on paper: docs 1/2 are
    identical (cosine exactly 1.0 over any term space); doc 3 shares one
    gated term with them; doc 4 shares nothing gated (df=1 terms cannot
    pair). N=4 -> df gate keeps 2 <= df <= 8 (everything shared)."""
    from d3d_etl_spark.queries import textops

    _write_documents(
        tmp_path,
        [
            "alpha beta gamma",
            "alpha beta gamma",
            "alpha solo3a solo3b",
            "lonely terms only",
        ],
    )
    out = textops.z_text_tfidf_topk(spark, str(tmp_path)).toPandas()
    assert 4 not in set(out["doc_id"])  # no gated terms -> no pairs
    byq = {
        d: g.sort_values("rank") for d, g in out.groupby("doc_id")
    }
    # identical docs: top neighbor is each other at sim 1.0
    assert byq[1].iloc[0].neighbor_id == 2 and byq[1].iloc[0].sim == 1.0
    assert byq[2].iloc[0].neighbor_id == 1 and byq[2].iloc[0].sim == 1.0
    assert byq[1].iloc[0].shared_terms == 3
    # doc 3 reaches both twins through the single shared term 'alpha',
    # tie on sim -> neighbor_id ascending
    assert list(byq[3].neighbor_id) == [1, 2]
    assert byq[3].iloc[0].sim == byq[3].iloc[1].sim
    assert byq[3].iloc[0].shared_terms == 1
    # symmetric sims: sim(1,3) == sim(3,1)
    s13 = byq[1][byq[1].neighbor_id == 3].sim.iloc[0]
    s31 = byq[3][byq[3].neighbor_id == 1].sim.iloc[0]
    assert s13 == s31


def test_tfidf_topk_df_gate_and_parity(spark, tmp_path):
    """Engine == DuckDB oracle on a corpus built to straddle the df gate
    (N=40 -> cap = max(8, 2) = 8): one token in every doc (df=40, gated
    OUT — without the gate it would pair all 780 doc pairs), plus planted
    mid-df clusters that must survive."""
    import pandas as pd

    from d3d_etl_spark.oracle import canonicalize
    from d3d_etl_spark.queries import textops

    texts = []
    for i in range(40):
        toks = ["common"]  # df=40 > 8 -> gated out
        toks += [f"cluster{i % 5} shared{i % 5}"]  # df=8 clusters, kept
        toks += [f"solo{i}"]  # df=1, lossless prune
        texts.append(" ".join(toks))
    _write_documents(tmp_path, texts)
    eng_df = textops.z_text_tfidf_topk(spark, str(tmp_path)).toPandas()
    eng = canonicalize(eng_df)
    ora = canonicalize(_oracle_documents(textops._TI_ORACLE, tmp_path))
    pd.testing.assert_frame_equal(eng, ora)
    # pairs exist ONLY within the planted clusters (8 docs each, k=5 caps
    # the neighbor list): the df gate removed the all-pairs 'common' term
    assert len(eng_df) == 40 * 5
    m = eng_df["neighbor_id"] % 5 == eng_df["doc_id"] % 5
    assert m.all()

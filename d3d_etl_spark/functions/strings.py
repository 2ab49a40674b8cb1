"""String/identity column helpers (SURVEY.md §2.9 T4/T5/T8).

Reference provenance:
- normalize_name: reference names/helpers.py:15-19, reconcile_players.py:52-57
  (lower, strip punctuation, collapse whitespace)
- "Last, First" flip: names/helpers.py:6-12
- salted 16-hex id: scripts/hash_player_ids.py:11-17
- md5->int bucket hashing is this engine's portable hash for dedup/LSH
  (same value computable in any SQL engine for oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_name(col: Column) -> Column:
    """lower, strip non-alnum (keep spaces), collapse runs of whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def flip_last_first(col: Column) -> Column:
    """"Last, First" -> "First Last" (passthrough when no comma)."""
    last = F.trim(F.regexp_extract(col, r"^([^,]+),", 1))
    first = F.trim(F.regexp_extract(col, r",(.*)$", 1))
    return F.when(col.contains(","), F.concat_ws(" ", first, last)).otherwise(col)


def hash_id(col: Column, salt: str = "d3d") -> Column:
    """Deterministic 16-hex id: sha256("{salt}:{value}")[:16]
    (reference hash_player_ids.py:11-17)."""
    return F.substring(F.sha2(F.concat_ws(":", F.lit(salt), col.cast("string")), 256), 1, 16)


def md5_int(col: Column, hex_chars: int = 8) -> Column:
    """First `hex_chars*4` bits of md5 as a non-negative long (<= 15 hex
    chars = 60 bits so the value fits a signed 64-bit int in any engine).

    Portable across engines (DuckDB: ``('0x' || substr(md5(x),1,n))::BIGINT``),
    used as the hash family for minhash/simhash/LSH so every sketch has an
    exact SQL oracle.
    """
    if hex_chars > 15:
        raise ValueError("max 15 hex chars (60 bits) for signed-64 portability")
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def sql_md5_int(expr: str, hex_chars: int = 8) -> str:
    return f"('0x' || substr(md5({expr}), 1, {hex_chars}))::BIGINT"


def md5_int_seeded(col: Column, seed: int) -> Column:
    """Seeded variant: hash of "{seed}:{value}" — an independent hash per seed."""
    return md5_int(F.concat_ws(":", F.lit(str(seed)), col))


def sql_md5_int_seeded(expr: str, seed: int) -> str:
    return sql_md5_int(f"'{seed}:' || {expr}")


def nfkc_titlecase(col: Column) -> Column:
    """T5's genuinely-Python scalar (SURVEY §2.10 item 3): NFKC unicode
    normalization + word title-case (reference reconcile_players.py:27-33,
    :67-80). No Catalyst builtin does NFKC, so this is a vectorized pandas
    UDF — Arrow-batched, applied AFTER blocking/filtering so the Python
    boundary sees the minimum rows. Idempotent; None-safe."""
    from pyspark.sql.functions import pandas_udf

    def _batch(s):
        import unicodedata

        def one(x):
            if x is None:
                return None
            norm = unicodedata.normalize("NFKC", x)
            return " ".join(w.capitalize() for w in norm.split())

        return s.map(one)

    # hint-free form: postponed annotations (module-level __future__ import)
    # turn signature hints into strings pyspark's inspector can't resolve
    return pandas_udf(_batch, "string")(col)


VALID_POSITIONS = (
    "P", "C", "1B", "2B", "3B", "SS", "OF", "IF", "UT", "DH", "LF", "CF", "RF",
)


def clean_positions(col: Column) -> Column:
    """Position-string cleaner (reference scripts/clean_cube_positions.py:
    21-33): strip "(29)"-style count suffixes, split on dashes/dots/space,
    uppercase, keep only the valid-position allowlist, dedup preserving
    FIRST occurrence order, re-join ", " — NULL when nothing survives.

    Order-preserving dedup is filter-by-first-index (array_distinct would
    do here, but the SQL twin can't: DuckDB's list_distinct reorders)."""
    stripped = F.regexp_replace(col, r"\(\d+\)", "")
    toks = F.transform(
        F.split(stripped, r"[-.\s]+"), lambda t: F.upper(F.trim(t))
    )
    valid = F.filter(toks, lambda t: t.isin(*VALID_POSITIONS))
    deduped = F.filter(valid, lambda t, i: F.array_position(valid, t) == i + 1)
    joined = F.array_join(deduped, ", ")
    return F.when(F.size(deduped) > 0, joined)


def sql_clean_positions(expr: str) -> str:
    """DuckDB twin of clean_positions (same tree, same NULL contract)."""
    allow = "[" + ", ".join(f"'{p}'" for p in VALID_POSITIONS) + "]"
    toks = f"list_transform(string_split_regex(regexp_replace({expr}, '\\(\\d+\\)', '', 'g'), '[-.\\s]+'), t -> upper(trim(t)))"
    valid = f"list_filter({toks}, t -> list_contains({allow}, t))"
    dedup = f"list_filter({valid}, (t, i) -> list_position({valid}, t) = i)"
    return f"CASE WHEN len({dedup}) > 0 THEN array_to_string({dedup}, ', ') END"


def normalize_division(col: Column) -> Column:
    """Division-format migration (reference scripts/update_division_format.py):
    numeric 1/2/3 (as any of int, float-string '2.0', plain '2') becomes
    'ncaa_{n}'; already-migrated 'ncaa_*' values and unknowns pass through
    unchanged — idempotent by construction."""
    as_num = col.cast("string")
    n = F.regexp_extract(as_num, r"^([123])(?:\.0+)?$", 1)
    return F.when(as_num.startswith("ncaa_"), as_num).when(
        n != "", F.concat(F.lit("ncaa_"), n)
    ).otherwise(as_num)


def sql_normalize_division(expr: str) -> str:
    e = f"CAST({expr} AS VARCHAR)"
    n = f"regexp_extract({e}, '^([123])(\\.0+)?$', 1)"
    return (
        f"CASE WHEN {e} LIKE 'ncaa_%' THEN {e} "
        f"WHEN {n} != '' THEN 'ncaa_' || {n} ELSE {e} END"
    )

"""token_sort_ratio parity (reference names/helpers.py:186-200): the
pure-python scorer against hand-computed values, against rapidfuzz when
installed, and the pandas-UDF tier wired through the roster cascade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d3d_etl_spark.functions.fuzzscore import (
    HAVE_RAPIDFUZZ,
    token_sort_ratio_py,
)

# (a, b, expected) — hand-computed: process (lower, non-alnum -> space,
# sort tokens, single-space join), indel = la + lb - 2*LCS,
# score = 100 * (1 - indel / (la + lb))
_CASES = [
    ("john smith", "smith john", 100.0),          # token sort: identical
    ("John  SMITH", "smith, john", 100.0),        # case/punct/space immune
    ("jon smith", "john smith", 100.0 * (1 - 1 / 19)),  # one insertion
    ("new york mets", "new york meats", 100.0 * (1 - 1 / 27)),
    ("abc", "xyz", 0.0),
    ("", "", 100.0),
    ("a", "", 0.0),
]


@pytest.mark.parametrize("a,b,want", _CASES)
def test_pure_python_hand_computed(a, b, want):
    assert token_sort_ratio_py(a, b) == pytest.approx(want)


@pytest.mark.skipif(not HAVE_RAPIDFUZZ, reason="rapidfuzz not installed")
@pytest.mark.parametrize("a,b,want", _CASES)
def test_rapidfuzz_parity(a, b, want):
    from rapidfuzz.fuzz import token_sort_ratio

    assert token_sort_ratio_py(a, b) == pytest.approx(token_sort_ratio(a, b))


def test_udf_tier_in_cascade(spark):
    """use_rapidfuzz=True routes tier 5 through the pandas UDF; the
    corrupted probe resolves to the right candidate at the reference's
    0.7 cutoff."""
    from d3d_etl_spark.operators.fuzzy_join import roster_cascade

    cands = spark.createDataFrame(
        [(1, "b1", "John Smith"), (2, "b1", "Alice Jones"), (3, "b1", "Bob Brown")],
        "cand_id int, blk string, cname string",
    )
    probes = spark.createDataFrame(
        [(10, "b1", "Smith Jon"),     # token reorder + 1 char short -> fuzzy
         (11, "b1", "Alice Jones")],  # exact
        "probe_id int, blk string, pname string",
    )
    out = {
        r["probe_id"]: r
        for r in roster_cascade(
            probes, cands,
            block_keys=["blk"],
            probe_id="probe_id", probe_name="pname",
            cand_id="cand_id", cand_name="cname",
            cutoff=0.7, use_rapidfuzz=True,
        ).collect()
    }
    assert out[11]["tier"] == "exact" and out[11]["matched_id"] == 2
    assert out[10]["tier"] == "fuzzy" and out[10]["matched_id"] == 1


def test_cascade_tier_order(spark):
    """Jersey beats exact beats unique-last beats initial+last beats fuzzy
    (the reference's _resolve precedence, map_ncaa_to_cube.py:125-175)."""
    from d3d_etl_spark.operators.fuzzy_join import roster_cascade

    cands = spark.createDataFrame(
        [(1, "b", "John Smith", "12"), (2, "b", "Jane Smith", "7"),
         (3, "b", "Alice Wong", "9")],
        "cand_id int, blk string, cname string, cnum string",
    )
    probes = spark.createDataFrame(
        [
            # jersey 7 wins even though the name exactly matches cand 1
            (10, "b", "John Smith", "7"),
            # unique last: wong is unique; smith is NOT -> probe 12 falls
            # through last to initlast (j smith ambiguous too) then fuzzy
            (11, "b", "wong", None),
            (12, "b", "smith", None),
        ],
        "probe_id int, blk string, pname string, pnum string",
    )
    out = {
        r["probe_id"]: r
        for r in roster_cascade(
            probes, cands,
            block_keys=["blk"],
            probe_id="probe_id", probe_name="pname",
            cand_id="cand_id", cand_name="cname",
            probe_number="pnum", cand_number="cnum",
            cutoff=0.7,
        ).collect()
    }
    assert out[10]["tier"] == "jersey" and out[10]["matched_id"] == 2
    assert out[11]["tier"] == "last" and out[11]["matched_id"] == 3
    # "smith" vs token-sorted full names is far below 0.7 -> unmatched
    assert 12 not in out


def test_headshot_cascade_block_relaxation(spark):
    """reconcile_players precedence: (team,year) direct beats (team,year)
    fuzzy beats the team-only fallback block (reconcile_players.py:413-469)."""
    from d3d_etl_spark.operators.fuzzy_join import headshot_cascade

    cands = spark.createDataFrame(
        [(1, "tA", 2023, "John Smith"), (2, "tA", 2024, "John Smith"),
         (3, "tA", 2024, "Alice Wong")],
        "cand_id int, team string, year int, cname string",
    )
    probes = spark.createDataFrame(
        [
            (10, "tA", 2024, "john smith"),    # direct (normalized) in-year
            (11, "tA", 2024, "Alice Wongg"),   # fuzzy in-year
            (12, "tA", 2025, "John Smith"),    # wrong year -> team fallback
        ],
        "probe_id int, team string, year int, pname string",
    )
    out = {
        r["probe_id"]: r
        for r in headshot_cascade(
            probes, cands,
            team_key="team", year_key="year",
            probe_id="probe_id", probe_name="pname",
            cand_id="cand_id", cand_name="cname",
            cutoff=0.9,
        ).collect()
    }
    assert out[10]["tier"] == "direct" and out[10]["matched_id"] == 2
    assert out[11]["tier"] == "fuzzy" and out[11]["matched_id"] == 3
    assert out[12]["tier"] == "fuzzy_fallback" and out[12]["matched_id"] == 1

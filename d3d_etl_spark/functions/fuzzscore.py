"""token_sort_ratio scoring — the reference's rapidfuzz tier
(names/helpers.py:186-200, map_ncaa_to_cube.py:169-173) as an
Arrow-batched pandas UDF.

rapidfuzz is used when installed; otherwise `token_sort_ratio_py`
implements the same definition in pure python:

    process:  lowercase, non-alphanumeric -> space, split, SORT tokens,
              join with single spaces
    score:    100 * (1 - indel(a, b) / (len(a) + len(b)))

where indel is edit distance with insert/delete only (a substitution
costs 2) — equivalently ``la + lb - 2 * LCS(a, b)``. The parity test
(tests/test_fuzzscore.py) pins the pure-python scorer against
hand-computed values and, when rapidfuzz is importable, against
rapidfuzz itself.

This is the SLOW path by design (SURVEY.md §2.10: UDFs only after
blocking); the default cascade tier scores JVM-side with token-sorted
Levenshtein, which oracles can mirror. The UDF exists for exact numeric
parity with the reference's cutoffs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_NON_ALNUM = re.compile(r"[^a-z0-9]+")

try:  # pragma: no cover - environment-dependent
    from rapidfuzz.fuzz import token_sort_ratio as _rapidfuzz_tsr

    HAVE_RAPIDFUZZ = True
except ImportError:  # pragma: no cover
    _rapidfuzz_tsr = None
    HAVE_RAPIDFUZZ = False


def _process(s: str) -> str:
    """rapidfuzz default_process + token sort."""
    tokens = _NON_ALNUM.sub(" ", str(s).lower()).split()
    return " ".join(sorted(tokens))


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(len(a)*len(b)) rolling rows."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, start=1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def token_sort_ratio_py(a: str, b: str) -> float:
    """Pure-python token_sort_ratio: identical definition to rapidfuzz."""
    pa, pb = _process(a), _process(b)
    la, lb = len(pa), len(pb)
    if la + lb == 0:
        return 100.0
    indel = la + lb - 2 * _lcs_len(pa, pb)
    return 100.0 * (1.0 - indel / (la + lb))


def token_sort_ratio_fn(a: str, b: str) -> float:
    """rapidfuzz when available, else the pure-python twin."""
    if HAVE_RAPIDFUZZ:
        return float(_rapidfuzz_tsr(a, b))
    return token_sort_ratio_py(a, b)


# DataType instance, not a DDL string: DDL parsing at import time would
# require an already-created SparkSession
@pandas_udf(DoubleType())
def token_sort_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [token_sort_ratio_fn(x, y) for x, y in zip(a, b)], dtype="float64"
    )

"""Skew-resilient join helpers.

AQE's skew-join splitting (on in session.py) handles moderate post-shuffle
skew automatically; manual salting is the tool for EXTREME single-key skew
where one key's partition would still exceed executor memory after AQE's
splits, or when the engine must guarantee bounded partition sizes up front
(SLA'd pipelines at 100 TB).

`salted_join` replicates the small side `salt` times and scatters the large
side across the replicas: every large-side row joins exactly one replica of
its key, so results are identical to the plain join while the hot key's rows
spread over `salt` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join with the small side replicated `salt` times to defuse key skew.

    The large side's salt must be deterministic under retries (a task rerun
    must re-derive the same salt or rows could match zero/two replicas —
    F.rand is NOT safe here): hash the join key plus a per-row fingerprint of
    the remaining columns. Identical rows get identical salts, which is
    harmless — distribution, not uniqueness, is what salting needs.

    Cost: small side shuffles/broadcasts `salt` x its size — keep
    `salt * |small|` within broadcast/shuffle budget. Result is column- and
    row-identical to `large.join(small, on, how)` for how in
    {inner, left, left_outer}.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    fingerprint = [c for c in large.columns if c not in on] or on
    l_salted = large.withColumn(
        _SALT_COL, F.pmod(F.hash(*on, *[F.col(c) for c in fingerprint]), F.lit(salt))
    )
    s_salted = small.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(s_salted, [*on, _SALT_COL], how).drop(_SALT_COL)

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts on the same key (None-padded when no prior right row
    exists). Ties on right_ts are broken by `tie_col` descending, so the
    result is deterministic.

    Spark has no native as-of join; the scalable formulation is NOT a
    per-key loop or a range theta-join but union + ordered window: tag both
    sides, union on (key, ts), and carry the last right-side payload forward
    with last(ignorenulls) — ONE shuffle on the key, linear in rows, no
    quadratic candidate set. Right rows sort before left rows at equal ts so
    "<=" matches take effect immediately.
    """
    payload = F.struct(
        F.col(right_ts).alias("__ts"), F.col(tie_col).alias("__tie"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right first at equal ts
        payload.alias("__payload"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}"
                                 for c in left.columns) + ">"
        ).alias("__left"),
    )
    l = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    from pyspark.sql import Window

    # equal-ts right rows sort by tie ascending, so last() keeps the
    # tie-winner; left rows carry their full row through the union (no
    # row-id join-back — a second evaluation of the left branch could
    # renumber nondeterministic ids)
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side", F.col("__payload.__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    return (
        r.unionByName(l)
        .withColumn("__carried", carried)
        .where(F.col("__side") == 1)
        .select(
            *[F.col(f"__left.{c}").alias(c) for c in left.columns],
            *[F.col(f"__carried.{c}").alias(c) for c in right_cols],
        )
    )


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_lo: str,
    left_hi: str,
    right_val: str,
    bin_width: int,
) -> DataFrame:
    """Inner range join (right_val in [left_lo, left_hi], plus optional equi
    keys `on`) via coarse-bin equality + exact refine.

    A naive range predicate forces BroadcastNestedLoopJoin — O(|L|·|R|) with
    no partition pruning. Binning restores a hash-partitionable equi-key:
    each left interval explodes to its covered bins (ceil(span/width)+1
    rows), each right value has exactly ONE bin, so every qualifying pair
    meets in exactly one bin — no dedup needed — and the refine predicate
    drops the false positives from partial bins. Pick bin_width ~ the
    typical interval span: replication stays ~2x while the join is a plain
    shuffled/broadcast hash join.
    """
    bins = F.sequence(
        F.floor(F.col(left_lo) / bin_width).cast("long"),
        F.floor(F.col(left_hi) / bin_width).cast("long"),
    )
    l = left.withColumn("__bin", F.explode(bins))
    r = right.withColumn("__bin", F.floor(F.col(right_val) / bin_width).cast("long"))
    return (
        l.join(r, [*on, "__bin"])
        .where((F.col(right_val) >= F.col(left_lo)) & (F.col(right_val) <= F.col(left_hi)))
        .drop("__bin")
    )

"""Numeric column helpers (SURVEY.md §2.9 M1-M5).

Reference provenance (all re-expressed as Catalyst expressions, no UDFs):
- safe_div: war_calculation/common.py:5-7, leaderboards/baserunning.py:16-17,
  get_guts.py:11-13 (three divergent variants in the reference — unified here)
- clip: sos_utils.py:89, get_linear_weights.py:56
- innings-pitched base-3 codec: war_calculation/common.py:10-36,
  get_guts.py:16-26 ("6.2" means 6 innings + 2/3)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column, fill: float = 0.0) -> Column:
    """n/d with 0-denominator -> fill (M1)."""
    return F.when(den != 0, num / den).otherwise(F.lit(fill))


def clip(col: Column, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi] (M2)."""
    return F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), col))


def zclip(col: Column, z: float = 3.0) -> Column:
    return clip(col, -z, z)


def ip_to_thirds(ip_str: Column) -> Column:
    """Decode a base-3 innings string "6.2" -> 20 thirds (6*3+2) as long.

    Reference codec at war_calculation/common.py:10-36.
    """
    parts = F.split(ip_str, r"\.")
    whole = F.get(parts, 0).cast("long")
    frac = F.coalesce(F.get(parts, 1).cast("long"), F.lit(0))
    return whole * 3 + frac


def thirds_to_ip(thirds: Column) -> Column:
    """Inverse codec: 20 -> "6.2"."""
    return F.concat_ws(".", (thirds / 3).cast("long").cast("string"), (thirds % 3).cast("string"))


def ip_to_innings(ip_str: Column) -> Column:
    """Decode to fractional innings as double: "6.2" -> 6.666..."""
    return ip_to_thirds(ip_str).cast("double") / 3.0

"""Sabermetric formula library (SURVEY.md §2.9 M6) — pure Column arithmetic.

Each builder mirrors a scalar formula from the reference's WAR/leaderboard
code (citations per function, paths under /root/reference/). They are plain
expression builders: composable into any groupBy/agg or select, fully
codegen'd, no UDFs. Rate stats guard zero denominators with safe_div
(reference has three divergent safe-divide variants; unified here).

Column-name convention follows the reference's cube-stats tables
(FIXTURES.md §3/§4): ab, h, double_ (2b), triple_ (3b), hr, bb, ibb, hbp,
k, sf, sh, sb, cs, pa, tb, er, ip_thirds...
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from d3d_etl_spark.functions.math import safe_div


def pa(ab: Column, bb: Column, hbp: Column, sf: Column, sh: Column) -> Column:
    """Plate appearances (reference war_calculation/batting.py:31-38)."""
    return ab + bb + hbp + sf + sh


def singles(h: Column, double_: Column, triple_: Column, hr: Column) -> Column:
    """1B = H - 2B - 3B - HR (reference batting.py:41-44)."""
    return h - double_ - triple_ - hr


def batting_avg(h: Column, ab: Column) -> Column:
    """AVG = H/AB (reference batting.py:11-14)."""
    return safe_div(h.cast("double"), ab)


def obp(h: Column, bb: Column, hbp: Column, ab: Column, sf: Column) -> Column:
    """OBP = (H+BB+HBP)/(AB+BB+HBP+SF) (reference batting.py:17-22)."""
    num = (h + bb + hbp).cast("double")
    return safe_div(num, ab + bb + hbp + sf)


def tb(h: Column, double_: Column, triple_: Column, hr: Column) -> Column:
    """Total bases = 1B + 2*2B + 3*3B + 4*HR (reference batting.py:47-50)."""
    return singles(h, double_, triple_, hr) + 2 * double_ + 3 * triple_ + 4 * hr


def slg(h: Column, double_: Column, triple_: Column, hr: Column, ab: Column) -> Column:
    """SLG = TB/AB (reference batting.py:53-56)."""
    return safe_div(tb(h, double_, triple_, hr).cast("double"), ab)


def ops(obp_col: Column, slg_col: Column) -> Column:
    """OPS = OBP + SLG (reference batting.py:59-61)."""
    return obp_col + slg_col


def iso(slg_col: Column, avg_col: Column) -> Column:
    """ISO = SLG - AVG (reference batting.py:64-66)."""
    return slg_col - avg_col


def babip(h: Column, hr: Column, ab: Column, k: Column, sf: Column) -> Column:
    """BABIP = (H-HR)/(AB-K-HR+SF) (reference batting.py:69-74)."""
    return safe_div((h - hr).cast("double"), ab - k - hr + sf)


def woba(
    bb: Column, hbp: Column, h1b: Column, h2b: Column, h3b: Column, hr: Column,
    ab: Column, ibb: Column, sf: Column,
    wbb: Column, whbp: Column, w1b: Column, w2b: Column, w3b: Column, whr: Column,
) -> Column:
    """wOBA with per-(division,year) guts weights
    (reference batting.py:77-95; weights from get_guts.py:120-137)."""
    num = wbb * (bb - ibb) + whbp * hbp + w1b * h1b + w2b * h2b + w3b * h3b + whr * hr
    den = ab + bb - ibb + sf + hbp
    return safe_div(num, den)


def wraa(woba_col: Column, lg_woba: Column, woba_scale: Column, pa_col: Column) -> Column:
    """wRAA = (wOBA - lgwOBA)/scale * PA (reference batting.py:98-104)."""
    return safe_div(woba_col - lg_woba, woba_scale, 0.0) * pa_col


def wrc(wraa_col: Column, lg_rpa: Column, pa_col: Column) -> Column:
    """wRC = wRAA + lg_R/PA * PA (reference batting.py:107-112)."""
    return wraa_col + lg_rpa * pa_col


def wrc_plus(wrc_col: Column, pa_col: Column, lg_rpa: Column, pf: Column) -> Column:
    """wRC+ = 100 * (wRC/PA) / (pf-adjusted lg_R/PA)
    (reference batting.py:115-125; park factor ~100-centered)."""
    pf_rpa = lg_rpa * pf / 100.0
    return 100.0 * safe_div(safe_div(wrc_col, pa_col.cast("double"), 0.0), pf_rpa, 0.0)


# --- pitching (reference war_calculation/pitching.py) -----------------------


def era(er: Column, ip_thirds: Column) -> Column:
    """ERA = 9*ER/IP (IP as exact thirds; reference pitching.py:10-15)."""
    return safe_div(27.0 * er.cast("double"), ip_thirds.cast("double"))


def whip(bb: Column, h: Column, ip_thirds: Column) -> Column:
    """WHIP = (BB+H)/IP (reference pitching.py:18-23)."""
    return safe_div(3.0 * (bb + h).cast("double"), ip_thirds.cast("double"))


def k9(so: Column, ip_thirds: Column) -> Column:
    """K/9 (reference pitching.py:26-31)."""
    return safe_div(27.0 * so.cast("double"), ip_thirds.cast("double"))


def bb9(bb: Column, ip_thirds: Column) -> Column:
    """BB/9 (reference pitching.py:34-39)."""
    return safe_div(27.0 * bb.cast("double"), ip_thirds.cast("double"))


def fip(hr_a: Column, bb: Column, hbp: Column, so: Column, ip_thirds: Column, cfip: Column) -> Column:
    """FIP = (13*HR + 3*(BB+HBP) - 2*K)/IP + cFIP constant
    (reference pitching.py:42-52; cfip from get_guts.py:100-117)."""
    num = (13 * hr_a + 3 * (bb + hbp) - 2 * so).cast("double")
    return safe_div(3.0 * num, ip_thirds.cast("double")) + cfip


def ra9(r: Column, ip_thirds: Column) -> Column:
    """RA/9 (reference pitching.py:55-60)."""
    return safe_div(27.0 * r.cast("double"), ip_thirds.cast("double"))


def era_plus(lg_era: Column, era_col: Column, pf: Column) -> Column:
    """ERA+ = 100 * pf-adjusted lgERA / ERA (reference pitching.py:63-72)."""
    return safe_div(100.0 * lg_era * pf / 100.0, era_col, 0.0)

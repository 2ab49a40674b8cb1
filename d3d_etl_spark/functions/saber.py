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


# --- reference-parity batting additions (war_calculation/batting.py) --------


def pa_ref(ab: Column, bb: Column, ibb: Column, hbp: Column, sf: Column) -> Column:
    """Reference plate_appearances (batting.py:15-16): AB+BB+IBB+HBP+SF —
    the cube-stats PA form (bb excludes intentional walks there; no SH)."""
    return ab + bb + ibb + hbp + sf


def obp_ref(h: Column, bb: Column, hbp: Column, ibb: Column, ab: Column, sf: Column) -> Column:
    """Reference on_base_pct (batting.py:31-32): numerator includes IBB."""
    return safe_div((h + bb + hbp + ibb).cast("double"), ab + bb + ibb + hbp + sf)


def walks_per_k(bb: Column, k: Column) -> Column:
    """BB/K (batting.py:19-20)."""
    return safe_div(bb.cast("double"), k)


def walk_pct(bb: Column, pa_col: Column) -> Column:
    """BB%% x100 (batting.py:51-52)."""
    return safe_div(bb.cast("double"), pa_col) * 100.0


def strikeout_pct(k: Column, pa_col: Column) -> Column:
    """K%% x100 (batting.py:55-56)."""
    return safe_div(k.cast("double"), pa_col) * 100.0


def stolen_base_pct(sb: Column, cs: Column) -> Column:
    """SB%% x100 (batting.py:59-60)."""
    return safe_div(sb.cast("double"), sb + cs) * 100.0


def runs_created(tb_col: Column, h: Column, bb: Column, ab: Column) -> Column:
    """RC = TB*(H+BB)/(AB+BB) (batting.py:63-64)."""
    return safe_div((tb_col * (h + bb)).cast("double"), ab + bb)


def rc_per_pa(rc: Column, pa_col: Column) -> Column:
    """RC/PA (batting.py:67-68)."""
    return safe_div(rc, pa_col.cast("double"))


def ops_plus(obp_col: Column, slg_col: Column, lg_obp: Column, lg_slg: Column) -> Column:
    """OPS+ = 100*(OBP/lgOBP + SLG/lgSLG - 1) (batting.py:71-72)."""
    return 100.0 * (safe_div(obp_col, lg_obp, 0.0) + safe_div(slg_col, lg_slg, 0.0) - 1.0)


def wrc_plus_parity(
    wraa_col: Column, pa_col: Column, lg_rpa: Column, lg_wrcpa: Column, pf: Column
) -> Column:
    """Reference wrc_plus (batting.py:96-99): park-adjusted wRC+ against
    the league wRC/PA baseline — kept alongside the simpler wrc_plus."""
    wraa_pa = safe_div(wraa_col, pa_col.cast("double"), 0.0)
    pf_adj = pf / 100.0
    return safe_div(
        (wraa_pa + lg_rpa) + (lg_rpa - pf_adj * lg_rpa), lg_wrcpa, 0.0
    ) * 100.0


def run_cs(runs_out: Column) -> Column:
    """CS run value = -(2*runs_out + 0.075) (batting.py:102-104,
    get_guts.py:71-72)."""
    return -(2.0 * runs_out + 0.075)


def wsb_opps(b1: Column, bb: Column, hbp: Column, ibb: Column) -> Column:
    """Steal opportunities = 1B+BB+HBP-IBB, clipped at 0 (batting.py:113)."""
    return F.greatest((b1 + bb + hbp - ibb).cast("double"), F.lit(0.0))


def lg_wsb_rate(
    lg_sb: Column, lg_cs: Column, lg_opps: Column, runs_out: Column
) -> Column:
    """League wSB/opportunity (batting.py:107-111)."""
    return safe_div(lg_sb * 0.2 + lg_cs * run_cs(runs_out), lg_opps)


def wsb(
    sb: Column, cs: Column, opps: Column, lg_rate: Column, runs_out: Column
) -> Column:
    """wSB = SB*runSB + CS*runCS - lgwSB*opps (batting.py:102-115)."""
    return sb * 0.2 + cs * run_cs(runs_out) - lg_rate * opps


def batting_runs(
    wraa_col: Column, pa_col: Column, pf: Column, lg_rpa: Column, conf_rpa: Column
) -> Column:
    """Park- and conference-adjusted batting runs (batting.py:117-119)."""
    pf_adj = pf / 100.0
    return wraa_col + (lg_rpa - pf_adj * lg_rpa) * pa_col + (lg_rpa - conf_rpa) * pa_col


def replacement_runs(
    pa_col: Column, total_pa: Column, team_count: Column, total_gs: Column, rpw: Column
) -> Column:
    """Replacement runs allocated by PA share (batting.py:122-129)."""
    games_played = (total_gs * 2.0) / team_count
    rep_constant = (team_count / 2.0) * games_played - team_count * games_played * 0.294
    return (rep_constant * rpw) * safe_div(pa_col.cast("double"), total_pa)


# --- reference-parity pitching additions (war_calculation/pitching.py) ------


def h9(h: Column, ip_thirds: Column) -> Column:
    """H/9 (pitching.py:22-23)."""
    return safe_div(27.0 * h.cast("double"), ip_thirds.cast("double"))


def hr9(hr: Column, ip_thirds: Column) -> Column:
    """HR/9 (pitching.py:26-27)."""
    return safe_div(27.0 * hr.cast("double"), ip_thirds.cast("double"))


def k_pct(so: Column, bf: Column) -> Column:
    """K%% of batters faced x100 (pitching.py:38-39)."""
    return safe_div(so.cast("double"), bf) * 100.0


def bb_pct(bb: Column, bf: Column) -> Column:
    """BB%% of batters faced x100 (pitching.py:42-43)."""
    return safe_div(bb.cast("double"), bf) * 100.0


def k_minus_bb_pct(k_pct_col: Column, bb_pct_col: Column) -> Column:
    """K%%-BB%% (pitching.py:46-47)."""
    return k_pct_col - bb_pct_col


def inherited_runners_scored_pct(scored: Column, inherited: Column) -> Column:
    """IR-scored%% x100 (pitching.py:50-51)."""
    return safe_div(scored.cast("double"), inherited) * 100.0


def era_plus_parity(player_era: Column, lg_era: Column, pf: Column) -> Column:
    """Reference era_plus (pitching.py:54-55):
    100*(2 - (ERA/lgERA)*(100/pf))."""
    return 100.0 * (2.0 - (player_era / lg_era) * (100.0 / pf))


def dynamic_rpw(ip_per_game: Column, conf_ra9: Column, pra9: Column) -> Column:
    """dRPW: dynamic runs-per-win blending the pitcher's own RA9 with the
    conference run environment by innings share (pitching.py:70-71)."""
    return (((18.0 - ip_per_game) * conf_ra9 + ip_per_game * pra9) / 18.0 + 2.0) * 1.5


def replacement_level(gs: Column, app: Column) -> Column:
    """Replacement level by starter share (pitching.py:74-76)."""
    gs_rate = safe_div(gs.cast("double"), app)
    return 0.03 * (1.0 - gs_rate) + 0.12 * gs_rate


def pitching_war_wins(
    raap9: Column, drpw: Column, replacement: Column, ip_f: Column
) -> Column:
    """WAR from runs-above-average-per-9 (pitching.py:79-82)."""
    wpgaa = safe_div(raap9, drpw, 0.0)
    return (wpgaa + replacement) * (ip_f / 9.0)


def leverage_adjustment(war_col: Column, gmli: Column, app: Column, gs: Column) -> Column:
    """Reliever leverage multiplier (pitching.py:84-87): relief share
    scaled by (1+gmLI)/2."""
    relief_pct = F.when(app > 0, (app - gs).cast("double") / app).otherwise(F.lit(0.0))
    multiplier = relief_pct * (1.0 + gmli) / 2.0 + (1.0 - relief_pct)
    return war_col * multiplier


# --- guts-constant builders (get_guts.py:29-117) ----------------------------


def cfip(
    lg_er: Column, lg_hr: Column, lg_bb: Column, lg_hbp: Column,
    lg_so: Column, lg_ip_thirds: Column,
) -> Column:
    """FIP constant = lgERA - lg FIP components per IP
    (get_guts.py:103-117); IP carried as exact thirds."""
    lg_era = era(lg_er, lg_ip_thirds)
    components = safe_div(
        3.0 * (13.0 * lg_hr + 3.0 * (lg_bb + lg_hbp) - 2.0 * lg_so).cast("double"),
        lg_ip_thirds.cast("double"),
    )
    return lg_era - components


def runs_win_per_game(mean_runs_per_game: Column) -> Column:
    """Reference run_constants runs_win (get_guts.py:95): half the average
    total runs per game, x1.5, +3."""
    return (mean_runs_per_game / 2.0) * 1.5 + 3.0

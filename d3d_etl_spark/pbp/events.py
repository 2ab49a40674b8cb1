"""Priority-ordered play-text classifier (SURVEY.md §2.9 T1).

The reference classifies narration with ~50 compiled regexes applied in a
priority order where ORDER IS SEMANTICS (reference pbp_parser/regexes.py:
57-188 and the cascade at columns.py:532-619 — e.g. K_WP must be checked
before K, intentional walk before walk, caught-stealing before steal).
Here the whole cascade compiles to ONE `when().when()...otherwise()` Column
— constant-folded, codegen'd, applied in a single pass over the text column.

Patterns are written fresh against the narration grammar documented in
FIXTURES.md §1 (not copied); rule order preserves the reference's precedence
contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (event_code, regex) in PRIORITY ORDER — first match wins.
EVENT_RULES: list[tuple[str, str]] = [
    ("HR", r"\bhomered\b|\bhome run\b"),
    ("3B", r"\btripled\b"),
    ("2B", r"\bdoubled\b"),
    ("1B", r"\bsingled\b"),
    ("ROE", r"\breached .*\berror\b"),
    ("FC", r"fielder'?s choice"),
    ("HBP", r"\bhit by pitch\b"),
    ("IBB", r"\bintentionally walked\b"),
    ("BB", r"\bwalked\b"),                      # after IBB
    ("SO_WP", r"\bstruck out\b.*(wild pitch|passed ball)"),  # before SO
    ("GDP", r"\bgrounded into (a )?double play\b"),
    ("SO", r"\bstruck out\b"),
    ("SF", r"\bflied out\b.*\bsac(rifice)?\b|\bsacrifice fly\b"),
    ("SH", r"\b(sacrificed|sacrifice bunt)\b"),
    ("GO", r"\bgrounded out\b"),
    ("FO", r"\bflied out\b"),
    ("LO", r"\blined out\b"),
    ("PO", r"\bpopped (out|up)\b"),
    ("CS", r"\bcaught stealing\b"),             # before SB
    ("SB", r"\bstole\b"),
    ("PK", r"\bpicked off\b"),
    ("WP", r"\bwild pitch\b"),
    ("PB", r"\bpassed ball\b"),
    ("BK", r"\bbalk(ed)?\b"),
    ("CI", r"\binterference\b"),
    ("SUB", r"\bto [a-z0-9]+ for\b|\bpinch (hit|ran)\b"),
]

NO_PLAY = "NP"

# events where the batter completes a plate appearance
PA_EVENTS = {
    "HR", "3B", "2B", "1B", "ROE", "FC", "HBP", "IBB", "BB",
    "SO_WP", "GDP", "SO", "SF", "SH", "GO", "FO", "LO", "PO", "CI",
}

# outs charged directly by the batter's event
EVENT_OUTS = {
    "SO": 1, "GDP": 2, "GO": 1, "FO": 1, "LO": 1, "PO": 1, "SF": 1, "SH": 1,
    "CS": 1, "PK": 1,
}


def classify_event(text: Column) -> Column:
    """Compile the ordered rule list into one when-cascade Column."""
    expr = None
    low = F.lower(text)
    for code, pattern in EVENT_RULES:
        cond = low.rlike(pattern)
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    return expr.otherwise(NO_PLAY)


def outs_on_play(text: Column, event: Column) -> Column:
    """Outs recorded on the play: the batter-event charge plus runner outs
    narrated in later segments ("X out at third", "X caught stealing" in a
    non-CS-classified play), matching the reference's counting approach
    (columns.py:56-118: event charge + 'out at' scans)."""
    low = F.lower(text)
    base = None
    for code, n in EVENT_OUTS.items():
        base = F.when(event == code, n) if base is None else base.when(event == code, n)
    base = base.otherwise(0)
    runner_outs = F.regexp_count(low, F.lit(r"\bout at (first|second|third|home)\b"))
    # a GDP narration also says "X out at second" for the lead runner — the
    # second out is already in the event charge, don't double count
    gdp_overlap = F.when(event == "GDP", F.least(runner_outs, F.lit(1))).otherwise(0)
    cs_overlap = F.when(
        (event == "CS") | (event == "PK"), F.least(runner_outs, F.lit(1))
    ).otherwise(0)
    return (base + runner_outs - gdp_overlap - cs_overlap).cast("int")


def runs_on_play(text: Column) -> Column:
    """Runs scored on the play = narrated 'scored' segments plus a home run's
    batter (reference columns.py:179-203 counts 'scored' matches; the HR
    batter's own run is narrated as 'homered')."""
    low = F.lower(text)
    scored = F.regexp_count(low, F.lit(r"\bscored\b"))
    hr_batter = F.when(low.rlike(r"\bhomered\b|\bhome run\b"), 1).otherwise(0)
    return (scored + hr_batter).cast("int")

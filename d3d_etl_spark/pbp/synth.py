"""Deterministic synthetic game generator (narration grammar per
FIXTURES.md §1). Used by the volume smoke test and the benched
`pbp_dag` query — the testdata star schema has no baseball tables, so the
domain pipeline exercises generated games with a fixed seed.
"""

from __future__ import annotations

import random

_NAMES = ["JONES", "SMITH", "DAVIS", "MILLER", "WILSON", "TAYLOR", "BROWN", "CLARK", "LEWIS"]


def generate_game(rng: random.Random, contest_id: int, year: int = 2024,
                  division: str = "ncaa_3") -> list[tuple]:
    """One game's raw pbp rows:
    (year, division, contest_id, inning, away_text, home_text, source_seq)."""
    rows = []
    seq = 0
    for inning in range(1, rng.randint(3, 6)):
        for half in ("T", "B"):
            outs = 0
            runners: list[str] = []
            plays = 0
            while outs < 3 and plays < 15:
                batter = f"{rng.choice(_NAMES)}, {chr(65 + rng.randrange(26))}."
                roll = rng.random()
                if roll < 0.22:
                    segs = [f"{batter} singled to left field"]
                    if runners and rng.random() < 0.5:
                        segs.append(f"{runners[-1]} scored")
                        runners.pop()
                    runners.append(batter)
                elif roll < 0.30:
                    segs = [f"{batter} doubled down the line"]
                    for r in list(runners):
                        segs.append(f"{r} scored")
                    runners = [batter]
                elif roll < 0.34:
                    segs = [f"{batter} homered, RBI"]
                    for r in runners:
                        segs.append(f"{r} scored")
                    runners = []
                elif roll < 0.44:
                    segs = [f"{batter} walked"]
                    runners.append(batter)
                elif roll < 0.50 and runners and outs < 2:
                    segs = [f"{batter} grounded into double play; {runners[-1]} out at second"]
                    runners.pop()
                    outs += 2
                elif roll < 0.70:
                    segs = [f"{batter} struck out swinging"]
                    outs += 1
                else:
                    segs = [f"{batter} flied out to cf"]
                    outs += 1
                text = "; ".join(segs)
                rows.append(
                    (year, division, contest_id, inning,
                     text if half == "T" else None,
                     text if half == "B" else None,
                     seq)
                )
                seq += 1
                plays += 1
    return rows


def generate_games(n_games: int, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    return [row for g in range(n_games) for row in generate_game(rng, g)]


RAW_SCHEMA = (
    "year int, division string, contest_id long, inning int, "
    "away_text string, home_text string, source_seq long"
)

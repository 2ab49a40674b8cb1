"""Nested-JSON source flattening (S10/S11) tests."""

from __future__ import annotations

import json


def test_flatten_game_json(spark):
    from d3d_etl_spark.sources.json_api import flatten_game_json

    doc = {
        "contest_id": 7,
        "periods": [
            {
                "inning": 1,
                "playbyplayStats": [
                    {
                        "plays": [
                            {"text": "A singled", "side": "away", "score": None},
                            {"text": "B doubled; A scored", "side": "away", "score": "1-0"},
                        ]
                    },
                    {"plays": [{"text": "C struck out", "side": "home", "score": None}]},
                ],
            },
            {
                "inning": 2,
                "playbyplayStats": [
                    {"plays": [{"text": "D homered", "side": "home", "score": "1-1"}]}
                ],
            },
        ],
    }
    raw = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    rows = flatten_game_json(raw).orderBy("source_seq").collect()
    assert [r["play_text"] for r in rows] == [
        "A singled", "B doubled; A scored", "C struck out", "D homered",
    ]
    assert [r["inning"] for r in rows] == [1, 1, 1, 2]
    # score forward-fill: null -> prior known score ("0-0" before any)
    assert [(r["away_score"], r["home_score"]) for r in rows] == [
        (0, 0), (1, 0), (1, 0), (1, 1),
    ]
    # total order is strictly increasing within the game
    seqs = [r["source_seq"] for r in rows]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_flatten_boxscore_json(spark):
    import json

    from d3d_etl_spark.sources.json_api import flatten_boxscore_json

    doc = {
        "contest_id": 7,
        "teamBoxscore": [
            {
                "team_id": 1,
                "side": "away",
                "playerStats": [
                    {"player_name": "JONES, A.", "position": "ss", "number": "2",
                     "bat_order": 1, "ip": None},
                    {"player_name": "ACE, P.", "position": "P", "number": "21",
                     "bat_order": None, "ip": "6.2"},
                    {"player_name": "RELIEF, Q.", "position": "p", "number": "33",
                     "bat_order": None, "ip": "2.1"},
                ],
            },
            {
                "team_id": 2,
                "side": "home",
                "playerStats": [
                    {"player_name": "SMITH, B.", "position": "c", "number": "9",
                     "bat_order": 1, "ip": None},
                ],
            },
        ],
    }
    raw = spark.createDataFrame([(json.dumps(doc),)], "payload string")
    rows = flatten_boxscore_json(raw).orderBy("team_id", "lineup_idx").collect()
    assert len(rows) == 4
    assert [r["player_name"] for r in rows[:3]] == ["JONES, A.", "ACE, P.", "RELIEF, Q."]
    # lineup order preserved for the pitcher queue; position case-folded
    assert [r["is_pitcher"] for r in rows[:3]] == [False, True, True]
    assert rows[1]["ip"] == "6.2"
    assert rows[3]["team_id"] == 2 and rows[3]["side"] == "home"

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

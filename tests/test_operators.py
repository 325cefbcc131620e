"""Operator tests: enrich-don't-clobber precedence, name
normalization, JSON flatten determinism, multimodal plumbing
(SURVEY.md §5.2 items 2-3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.operators import (
    enrich_dont_clobber,
    flatten_odds_json,
    normalize_names,
)
from ucl_data_pipeline_spark.schemas import ODDS_API_GAMES


def test_enrich_dont_clobber_precedence(spark):
    # reference scripts/enrich_features.py:26-34,59-61: existing
    # non-null fact values win; joined dim fills nulls; default last.
    fact = spark.createDataFrame(
        [("A", 0.9), ("B", None), ("C", None)], "team: string, gk: double"
    )
    dim = spark.createDataFrame([("A", 0.1), ("B", 0.2)], "team: string, gk: double")
    out = {
        r.team: r.gk
        for r in enrich_dont_clobber(
            fact, dim, on=["team"], values={"gk": 0.6}
        ).collect()
    }
    assert out == {"A": 0.9, "B": 0.2, "C": 0.6}


def test_enrich_dont_clobber_adds_missing_column(spark):
    fact = spark.createDataFrame([("A",), ("Z",)], "team: string")
    dim = spark.createDataFrame([("A", 0.33)], "team: string, inj: double")
    out = {
        r.team: r.inj
        for r in enrich_dont_clobber(
            fact, dim, on=["team"], values={"inj": 0.3}
        ).collect()
    }
    assert out == {"A": 0.33, "Z": 0.3}


def test_normalize_names_identity_fallback(spark):
    # reference data/team_name_map.csv:2-4 + identity fallback
    # (scripts/enrich_features.py:42-43); unicode canonical targets.
    df = spark.createDataFrame(
        [("Man City",), ("Atletico Madrid",), ("Unmapped FC",), (" Liverpool ",)],
        "home_team: string",
    )
    name_map = spark.createDataFrame(
        [("Man City", "Manchester City"), ("Atletico Madrid", "Atlético Madrid")],
        "raw: string, canonical: string",
    )
    got = [r.home_team for r in normalize_names(df, name_map, ("home_team",)).collect()]
    assert sorted(got) == sorted(
        ["Manchester City", "Atlético Madrid", "Unmapped FC", "Liverpool"]
    )


def _games_fixture(spark):
    # A12 shape (reference fetch_the_odds_api.py:118-143): two
    # bookmakers; the FIRST with an h2h market must win; draw under
    # "Tie" for one game.
    games = [
        {
            "id": "g1",
            "commence_time": "2025-09-17T19:00:00Z",
            "home_team": "PSG",
            "away_team": "Real Madrid",
            "bookmakers": [
                {"key": "bk1", "title": "B1",
                 "markets": [{"key": "totals", "outcomes": []}]},
                {"key": "bk2", "title": "B2",
                 "markets": [{"key": "h2h", "outcomes": [
                     {"name": "PSG", "price": 2.1},
                     {"name": "Real Madrid", "price": 3.2},
                     {"name": "Draw", "price": 3.4}]}]},
                {"key": "bk3", "title": "B3",
                 "markets": [{"key": "h2h", "outcomes": [
                     {"name": "PSG", "price": 9.9},
                     {"name": "Real Madrid", "price": 9.9},
                     {"name": "Draw", "price": 9.9}]}]},
            ],
        },
        {
            "id": "g2",
            "commence_time": "2025-09-18T19:00:00Z",
            "home_team": "Inter",
            "away_team": "Ajax",
            "bookmakers": [
                {"key": "bk1", "title": "B1",
                 "markets": [{"key": "h2h", "outcomes": [
                     {"name": "Inter", "price": 1.8},
                     {"name": "Ajax", "price": 4.0},
                     {"name": "Tie", "price": 3.6}]}]},
            ],
        },
    ]
    import json

    from ucl_data_pipeline_spark.sources.io import read_json_records

    return read_json_records(spark, json.dumps(games), ODDS_API_GAMES)


def test_flatten_odds_first_h2h_wins(spark):
    out = {r.home_team: r for r in flatten_odds_json(_games_fixture(spark)).collect()}
    psg = out["PSG"]
    # bk2 is the first bookmaker with an h2h market — bk3's 9.9s must lose
    assert (psg.home_odds_dec, psg.draw_odds_dec, psg.away_odds_dec) == (2.1, 3.4, 3.2)
    inter = out["Inter"]
    # draw price picked up from "Tie" fallback
    assert (inter.home_odds_dec, inter.draw_odds_dec, inter.away_odds_dec) == (
        1.8, 3.6, 4.0)
    assert psg.date.isoformat() == "2025-09-17T19:00:00"


def test_multimodal_stub_features(spark):
    from ucl_data_pipeline_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(0, "abc abc abc"), (1, "zzzz"), (2, "x" * 1200)],
        "doc_id: long, text: string",
    )
    media = attach_fake_media(docs)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[0].media_type == "image" and feats[1].media_type == "audio"
    assert feats[1].n_bytes == 4
    assert feats[1].byte_mean == pytest.approx(ord("z"))
    assert feats[1].byte_entropy_proxy == pytest.approx(1 / 256)
    # video payload (doc 2, 1200 bytes) → chunks of 256, stride 4 → idx 0,4
    frames = sample_frames(media, frame_size=256, stride=4).collect()
    assert [(r.media_id, r.frame_idx) for r in frames] == [(2, 0), (2, 4)]
    assert len(frames[0].frame_bytes) == 256


def test_multimodal_real_decoder_raises(spark):
    from ucl_data_pipeline_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    docs = spark.createDataFrame([(0, "abc")], "doc_id: long, text: string")
    with pytest.raises((NotImplementedError, Exception)):
        extract_features(attach_fake_media(docs), decoder="ffmpeg")

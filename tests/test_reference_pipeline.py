"""Pipeline-parity fixtures (SURVEY.md §5.2 item 2): tiny tables
mirroring the reference's real side tables through the full enrich
chain, asserting known outputs.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ucl_data_pipeline_spark.operators.pipeline import (
    bootstrap_team_priors,
    build_hist,
    build_xg_hybrid,
    enrich_matches,
)
from ucl_data_pipeline_spark.schemas import (
    HIST_MATCHES,
    INJURIES,
    LINEUPS,
    REF_BASELINES,
    STADIUMS,
    TEAM_NAME_MAP,
    TEAMS_MASTER,
    XG_METRICS,
)

D = datetime.date(2025, 9, 18)


@pytest.fixture(scope="module")
def dims(spark):
    name_map = spark.createDataFrame(
        [("Man City", "Manchester City"), ("Bayern", "Bayern Munich")],
        TEAM_NAME_MAP,
    )
    teams = spark.createDataFrame(
        [("Liverpool", 0.7, 0.6, 0.8), ("Bayern Munich", 0.75, 0.65, 0.9)],
        TEAMS_MASTER,
    )
    stadiums = spark.createDataFrame(
        [
            ("Liverpool", "Anfield", 53.4308, -2.9608),
            ("Bayern Munich", "Allianz Arena", 48.2188, 11.6247),
        ],
        STADIUMS,
    )
    refs = spark.createDataFrame([("Michael Oliver", 0.28)], REF_BASELINES)
    injuries = spark.createDataFrame([(D, "Liverpool", 0.6)], INJURIES)
    lineups = spark.createDataFrame([(D, "Bayern Munich", 1, 0, 1)], LINEUPS)
    xg = spark.createDataFrame(
        [
            (9, 2025, "2025", "Liverpool", 2.1, 0.9, 1.2, 0.6),
            (9, 2024, "2024", "Liverpool", 1.9, 1.1, 0.8, 0.4),
            (9, 2025, "2025", "Bayern Munich", 2.5, 0.8, 1.7, 0.9),
        ],
        XG_METRICS,
    )
    return name_map, teams, stadiums, refs, injuries, lineups, xg


def test_full_enrich_chain(spark, dims):
    name_map, teams, stadiums, refs, injuries, lineups, xg = dims
    fact = spark.createDataFrame(
        [(D, "Liverpool", "Bayern", 2, 1)],
        "date: date, home_team: string, away_team: string, "
        "home_goals: int, away_goals: int",
    )
    hybrid = build_xg_hybrid(
        xg.filter(F.col("season_id") == 2025), xg.filter(F.col("season_id") == 2024)
    )
    enriched = enrich_matches(
        fact, name_map, teams, stadiums, refs, injuries, lineups, hybrid
    )
    row = enriched.collect()[0]
    # name map applied to the fact side: "Bayern" → "Bayern Munich"
    assert row.away_team == "Bayern Munich"
    # priors joined (home=Liverpool), clobber-free defaults elsewhere
    assert row.home_gk_rating == 0.7
    assert row.away_gk_rating == 0.75
    assert row.crowd_index == 0.8  # home side's crowd prior
    # injuries: home listed (0.6), away defaulted (0.3)
    assert row.home_injury_index == 0.6
    assert row.away_injury_index == pytest.approx(0.3)
    # lineups: away flagged, home defaulted to 0 ints
    assert (row.away_key_att_out, row.away_key_def_out, row.away_keeper_changed) == (
        1, 0, 1)
    assert (row.home_key_att_out, row.home_key_def_out) == (0, 0)
    # referee default (no ref_name column in fact)
    assert row.ref_pen_rate == pytest.approx(0.30)
    # travel: home 0, away = haversine(Anfield, Allianz) ≈ 1174 km
    # (reference data/stadiums.csv:2-3)
    assert row.home_travel_km == 0.0
    assert row.away_travel_km == pytest.approx(1173.9, abs=5.0)
    # hybrid xG: Liverpool 0.6·2.1+0.4·1.9; Bayern degrades to current-only
    assert row.home_xg == pytest.approx(0.6 * 2.1 + 0.4 * 1.9)
    assert row.away_xg == pytest.approx(2.5)
    # rest days default stamped
    assert (row.home_rest_days, row.away_rest_days) == (4, 4)


def test_enrich_does_not_clobber_existing(spark, dims):
    name_map, teams, stadiums, refs, injuries, lineups, xg = dims
    fact = spark.createDataFrame(
        [(D, "Liverpool", "Bayern Munich", 0.99)],
        "date: date, home_team: string, away_team: string, home_gk_rating: double",
    )
    hybrid = build_xg_hybrid(xg.limit(0), xg.limit(0))
    enriched = enrich_matches(
        fact, name_map, teams, stadiums, refs, injuries, lineups, hybrid
    )
    row = enriched.collect()[0]
    assert row.home_gk_rating == 0.99  # pre-existing fact value wins over 0.7


def test_build_hist_canonical_projection(spark, dims):
    name_map, teams, stadiums, refs, injuries, lineups, xg = dims
    fact = spark.createDataFrame(
        [(D, "Liverpool", "Bayern", 2, 1)],
        "date: date, home_team: string, away_team: string, "
        "home_goals: int, away_goals: int",
    )
    hybrid = build_xg_hybrid(xg.limit(0), xg.limit(0))
    enriched = enrich_matches(
        fact, name_map, teams, stadiums, refs, injuries, lineups, hybrid
    )
    hist = build_hist(enriched)
    assert hist.columns == [f.name for f in HIST_MATCHES.fields]  # 20 cols, order
    assert hist.count() == 1


def test_bootstrap_priors_first_wins_and_clamps(spark):
    from ucl_data_pipeline_spark.schemas import XG_METRICS_HYBRID

    hybrid = spark.createDataFrame(
        [
            ("Liverpool", 9, 2.0, 0.5, 1.5, 0.8),     # league 9 wins (first)
            ("Liverpool", 13, 1.0, 3.0, -2.0, -0.5),  # dup team dropped
            ("Weak FC", 9, 0.5, 200.0, -1.5, -0.9),   # gk floor clamps to 0.55
            ("NoXg FC", 9, None, None, None, None),   # midpoints
        ],
        XG_METRICS_HYBRID,
    )
    out = {r.team: r for r in bootstrap_team_priors(hybrid).collect()}
    assert len(out) == 3
    # first-wins dedup: league 9 row retained (xgd=1.5 → setpiece 0.65)
    assert out["Liverpool"].setpiece_rating == pytest.approx(0.65)
    assert out["Liverpool"].gk_rating == pytest.approx(
        0.80 - 0.15 * (0.5 / 34.0)
    )
    # ratio floor then clamp: 0.80-0.15*(200/34) < 0.55 → clamped
    assert out["Weak FC"].gk_rating == pytest.approx(0.55)
    # null xgd → sign 0 → 0.55; null xga → 0.80 gk
    assert out["NoXg FC"].setpiece_rating == pytest.approx(0.55)
    assert out["NoXg FC"].gk_rating == pytest.approx(0.80)
    assert all(r.crowd_index == 0.70 for r in out.values())


def test_hybrid_degradation_matrix(spark):
    cur = spark.createDataFrame(
        [(9, 2025, "2025", "A", 2.0, 1.0, 1.0, 0.5),
         (9, 2025, "2025", "B", 3.0, 2.0, 1.0, 0.5)],
        XG_METRICS,
    )
    last = spark.createDataFrame(
        [(9, 2024, "2024", "A", 1.0, 2.0, -1.0, -0.5),
         (9, 2024, "2024", "C", 9.0, 9.0, 0.0, 0.0)],
        XG_METRICS,
    )
    out = {r.team: r for r in build_xg_hybrid(cur, last).collect()}
    assert out["A"].xg_hybrid == pytest.approx(0.6 * 2.0 + 0.4 * 1.0)
    assert out["B"].xg_hybrid == pytest.approx(3.0)  # cur only
    assert out["C"].xg_hybrid == pytest.approx(9.0)  # last only (outer join)

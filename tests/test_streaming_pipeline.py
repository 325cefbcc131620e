"""End-to-end reference pipeline as a Structured Streaming job
(SURVEY.md §2.9): the reference's daily batch re-run is exactly the
``Trigger.AvailableNow`` batch-increment model, and because the enrich
chain is pure projections + stream-static broadcast joins, the SAME
``enrich_matches`` operator code (operators/pipeline.py, reference
scripts/enrich_features.py:151-179) runs unmodified over a file-source
stream:

- batch 1 lands → AvailableNow run enriches exactly those rows,
  value-identical to the batch engine on the same input;
- batch 2 lands → a resumed run (same checkpoint) processes ONLY the
  new file — the incremental behavior the reference fakes with a full
  re-fetch + overwrite (S8), here with exactly-once file tracking.
"""

from __future__ import annotations

import datetime

import pytest

from ucl_data_pipeline_spark.operators.pipeline import enrich_matches
from ucl_data_pipeline_spark.schemas import (
    INJURIES,
    LINEUPS,
    REF_BASELINES,
    STADIUMS,
    TEAM_NAME_MAP,
    TEAMS_MASTER,
)
D = datetime.date(2025, 9, 18)

_FACT_SCHEMA = (
    "date DATE, home_team STRING, away_team STRING, "
    "home_goals INT, away_goals INT"
)


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
        [("Liverpool", "2025", 1.98, 0.98, 1.04, 0.52)],
        "team STRING, league_id STRING, xg_hybrid DOUBLE, xga_hybrid DOUBLE, "
        "xgd_hybrid DOUBLE, xgd90_hybrid DOUBLE",
    )
    return name_map, teams, stadiums, refs, injuries, lineups, xg


def _write_batch(path: str, rows: list[str]) -> None:
    with open(path, "w") as f:
        f.write("date,home_team,away_team,home_goals,away_goals\n")
        f.writelines(r + "\n" for r in rows)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_enrich_pipeline_streams_available_now(spark, dims, tmp_path):
    name_map, teams, stadiums, refs, injuries, lineups, xg = dims
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        str(in_dir / "batch1.csv"),
        ["2025-09-18,Liverpool,Bayern,2,1"],
    )

    def enrich(fact):
        return enrich_matches(
            fact, name_map, teams, stadiums, refs, injuries, lineups, xg
        )

    stream_fact = (
        spark.readStream.schema(_FACT_SCHEMA)
        .option("header", "true")
        .csv(str(in_dir))
    )
    out_dir = str(tmp_path / "enriched")

    def run_increment():
        # parquet sink + checkpoint: the production shape — file sinks
        # track committed batches, so a resumed AvailableNow run is
        # exactly-once over newly arrived files (memory sinks cannot
        # recover a checkpoint).
        q = (
            enrich(stream_fact)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    got1 = run_increment()

    batch_fact = (
        spark.read.schema(_FACT_SCHEMA).option("header", "true").csv(str(in_dir))
    )
    want1 = enrich(batch_fact)
    assert sorted(got1.columns) == sorted(want1.columns)
    assert _sorted_rows(got1) == _sorted_rows(want1)
    row = {c: v for c, v in zip(sorted(got1.columns), _sorted_rows(got1)[0])}
    # spot-check the chain really ran in the stream: name-map applied,
    # priors joined, travel computed (Anfield → Allianz ≈ 1174 km)
    assert row["away_team"] == "Bayern Munich"
    assert row["home_gk_rating"] == 0.7
    assert row["away_travel_km"] == pytest.approx(1173.9, abs=5.0)

    # batch 2 lands; a resumed run processes ONLY the new file
    _write_batch(
        str(in_dir / "batch2.csv"),
        ["2025-09-19,Man City,Liverpool,0,0"],
    )
    got2 = run_increment()
    inc = [
        r
        for r in got2.collect()
        if r.date == datetime.date(2025, 9, 19)
    ]
    assert got2.count() - got1.count() == 1  # exactly the increment
    assert len(inc) == 1
    assert inc[0].home_team == "Manchester City"  # name map on the increment


def test_hist_upcoming_incremental_equals_full_recompute(spark, dims, tmp_path):
    """The reference's daily-rerun semantic (pipeline.yml:5-7: re-fetch
    everything, rebuild HIST/UPCOMING, overwrite) proven equivalent to
    the engine's incremental model: a resumed AvailableNow run over
    ONLY the newly landed matchday CSV must leave the HIST sink equal,
    row for row, to a from-scratch batch recompute over all inputs —
    and the same for the UPCOMING projection over a fixtures stream.
    Equality (not just count) is the assertion: enrich + conform are
    per-row and stream-static joins, so increment-append == recompute
    exactly.
    """
    from ucl_data_pipeline_spark.operators.pipeline import (
        build_hist,
        build_upcoming,
    )

    name_map, teams, stadiums, refs, injuries, lineups, xg = dims

    def enrich(fact):
        return enrich_matches(
            fact, name_map, teams, stadiums, refs, injuries, lineups, xg
        )

    cases = {
        # results feed -> HIST; fixtures feed (no goals yet) -> UPCOMING
        "hist": (build_hist, ["2025-09-18,Liverpool,Bayern,2,1"],
                 ["2025-09-19,Man City,Liverpool,0,0"]),
        "upcoming": (build_upcoming, ["2025-09-18,Liverpool,Bayern,,"],
                     ["2025-09-19,Man City,Liverpool,,"]),
    }
    for label, (project, batch1, batch2) in cases.items():
        in_dir = tmp_path / f"in_{label}"
        in_dir.mkdir()
        out_dir = str(tmp_path / f"out_{label}")
        ckpt = str(tmp_path / f"ckpt_{label}")
        _write_batch(str(in_dir / "batch1.csv"), batch1)

        def run_increment():
            q = (
                project(
                    enrich(
                        spark.readStream.schema(_FACT_SCHEMA)
                        .option("header", "true")
                        .csv(str(in_dir))
                    )
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.read.parquet(out_dir)

        run_increment()  # day 1
        _write_batch(str(in_dir / "batch2.csv"), batch2)  # new matchday
        got = run_increment()  # day 2: processes ONLY batch2

        full = project(
            enrich(
                spark.read.schema(_FACT_SCHEMA)
                .option("header", "true")
                .csv(str(in_dir))
            )
        )
        assert sorted(got.columns) == sorted(full.columns), label
        assert _sorted_rows(got) == _sorted_rows(full), label
        assert got.count() == 2, label

"""F12: nested odds-JSON flattening (SURVEY.md §2.8 F12).

Reference behavior (scripts/fetch_the_odds_api.py:118-143): per game,
iterate bookmakers→markets, take the FIRST market with key='h2h', build
a name→price dict from its outcomes, pick home/away prices by team name
and the draw price under "Draw" or "Tie".

The reference's "first" depends on API iteration order (SURVEY.md §7
hard-point (c)); we impose an explicit deterministic ordering
(bookmaker position, market position) via posexplode + row_number, so
re-runs reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flatten_odds_json(games: DataFrame) -> DataFrame:
    """games (A12 nested schema: home_team, away_team, commence_time,
    bookmakers[].markets[].{key, outcomes[].{name, price}}) →
    (date, home_team, away_team, home_odds_dec, draw_odds_dec,
    away_odds_dec).
    """
    exploded = (
        games.select(
            "home_team",
            "away_team",
            "commence_time",
            F.posexplode_outer("bookmakers").alias("bk_pos", "bk"),
        )
        .select(
            "home_team",
            "away_team",
            "commence_time",
            "bk_pos",
            F.posexplode_outer("bk.markets").alias("mk_pos", "mk"),
        )
        .filter(F.col("mk.key") == "h2h")
    )
    w = Window.partitionBy("home_team", "away_team", "commence_time").orderBy(
        "bk_pos", "mk_pos"
    )
    first_h2h = exploded.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    prices = F.map_from_entries(
        F.transform(
            F.col("mk.outcomes"), lambda o: F.struct(o["name"], o["price"])
        )
    )
    return first_h2h.select(
        F.to_timestamp("commence_time").alias("date"),
        "home_team",
        "away_team",
        F.element_at(prices, F.col("home_team")).alias("home_odds_dec"),
        F.coalesce(
            F.element_at(prices, F.lit("Draw")),
            F.element_at(prices, F.lit("Tie")),
        ).alias("draw_odds_dec"),
        F.element_at(prices, F.col("away_team")).alias("away_odds_dec"),
    )

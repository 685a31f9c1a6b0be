"""P1-P6 fidelity on the fixture battle feed (SURVEY.md §2.2)."""

from __future__ import annotations

import pytest

from clashroyale_datapipeline_agent_spark.fixtures import generate_raw_battles, raw_battles_df
from clashroyale_datapipeline_agent_spark.operators.normalize import (
    filter_and_normalize_ranked_1v1,
)

from tests.domain_oracle import filter_and_normalize


@pytest.fixture(scope="module")
def raw(spark):
    return raw_battles_df(spark, n_players=10, battles_per_player=25)


def test_filter_and_normalize_matches_oracle(spark, raw):
    got = filter_and_normalize_ranked_1v1(raw).drop("battle_ts").collect()
    want = filter_and_normalize(generate_raw_battles(n_players=10, battles_per_player=25))
    assert len(got) == len(want) > 0

    def key(row):
        return (row["battle_time"], row["player_tag"])

    got_by_key = {key(r): r for r in got}
    for w in want:
        g = got_by_key[(w["battle_time"], w["player_tag"])]
        assert g["result"] == w["result"]
        assert list(g["my_cards"]) == w["my_cards"]
        assert list(g["opp_cards"]) == w["opp_cards"]
        assert g["mode_name"] == w["mode_name"]


def test_battle_ts_parses(spark, raw):
    df = filter_and_normalize_ranked_1v1(raw)
    assert df.filter("battle_ts is null").count() == 0


def test_edge_cases_present():
    """The generator must actually exercise the edge paths."""
    raw = generate_raw_battles(n_players=10, battles_per_player=25)
    assert any(len(b["team"]) != 1 for b in raw)
    assert any((b["gameMode"]["id"] not in (72000006, 72000464)) for b in raw)
    norm = filter_and_normalize(raw)
    assert any(len(n["my_cards"]) != 8 for n in norm)
    assert any(n["result"] == "draw" for n in norm)

"""Golden end-to-end test (SURVEY.md §5.2 item 4): a fixed 20-battle
fixture through the full Phase-1 pipeline, compared against a committed
golden JSON (order-insensitive). Regenerate with:

    python -m tests.test_golden_e2e   # writes tests/golden_phase1.json
"""

from __future__ import annotations

import json
from pathlib import Path

GOLDEN_PATH = Path(__file__).parent / "golden_phase1.json"

#: tables whose row sets are captured (arrays stringified for stability)
CAPTURED = [
    "summary",
    "best_cards",
    "my_deck_types",
    "opp_deck_types",
    "deck_type_matchups",
    "llm_user_summary",
    "llm_user_deck_summary",
]


def _fixture_battles(spark):
    from clashroyale_datapipeline_agent_spark.fixtures import raw_battles_df

    return raw_battles_df(spark, n_players=4, battles_per_player=25, seed=99)


def _capture(spark) -> dict:
    from clashroyale_datapipeline_agent_spark.plans.pipeline import run_user_pipeline

    catalog = run_user_pipeline(_fixture_battles(spark))
    out: dict = {}
    for name in CAPTURED:
        rows = []
        for r in catalog[name].collect():
            d = {}
            for k, v in r.asDict().items():
                if isinstance(v, list):
                    v = "|".join(map(str, v))
                elif isinstance(v, float):
                    v = round(v, 9)
                d[k] = v
            rows.append(d)
        # order-insensitive: sort rows by their full JSON form
        out[name] = sorted(rows, key=lambda d: json.dumps(d, sort_keys=True))
    return out


def test_phase1_matches_golden(spark):
    assert GOLDEN_PATH.exists(), "golden file missing — run python -m tests.test_golden_e2e"
    got = _capture(spark)
    want = json.loads(GOLDEN_PATH.read_text())
    assert set(got) == set(want)
    for name in CAPTURED:
        assert got[name] == want[name], f"table {name} diverged from golden"


if __name__ == "__main__":
    from clashroyale_datapipeline_agent_spark.session import get_spark

    data = _capture(get_spark("golden-gen"))
    GOLDEN_PATH.write_text(json.dumps(data, indent=1, sort_keys=True))
    print(f"wrote {GOLDEN_PATH} ({sum(len(v) for v in data.values())} rows)")

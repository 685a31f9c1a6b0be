"""End-to-end pipeline tests: Phase-1 catalog, Phase-0 loop semantics
(SURVEY.md §5.2 items 4-5), Phase-2 router fixtures (FIXTURES.md §A6)."""

from __future__ import annotations

import json

import pytest

from clashroyale_datapipeline_agent_spark.fixtures import (
    generate_leaderboard,
    generate_raw_battles,
    raw_battles_df,
)
from clashroyale_datapipeline_agent_spark.plans import qna_router as qr
from clashroyale_datapipeline_agent_spark.plans.pipeline import (
    MetaDatasetBuilder,
    run_user_pipeline,
    user_llm_tables,
    user_analytics_tables,
)


@pytest.fixture(scope="module")
def catalog(spark):
    raw = raw_battles_df(spark, n_players=8, battles_per_player=25)
    return run_user_pipeline(raw)


def test_user_pipeline_catalog_complete(catalog):
    expected = {
        "summary", "best_cards", "worst_cards", "tough_opp_cards",
        "easy_opp_cards", "best_decks", "worst_decks", "tough_matchups",
        "easy_matchups", "my_deck_types", "opp_deck_types",
        "deck_type_matchups", "llm_user_summary", "llm_user_deck_summary",
        "llm_user_matchup_summary", "llm_user_card_summary",
        "llm_opponent_card_summary",
    }
    assert expected <= set(catalog)


def test_llm_card_summary_roles(catalog):
    rows = catalog["llm_user_card_summary"].collect()
    assert {r["role"] for r in rows} == {"best", "worst"}
    for r in rows:
        assert r["card_name"] == r["card"]
        assert r["source"] in ("best_cards", "worst_cards")


def test_summary_melt_is_stringly(catalog):
    rows = {r["metric"]: r["value"] for r in catalog["llm_user_summary"].collect()}
    assert set(rows) == {"games_played", "wins", "losses", "draws", "win_rate"}
    assert all(isinstance(v, str) for v in rows.values())


# ---------------------------------------------------------------------------
# Phase-0 loop
# ---------------------------------------------------------------------------

def _mk_fetcher(n_per_player: int = 25):
    """Scripted battlelog source keyed by tag (deterministic)."""
    def fetch(tag: str) -> list[dict]:
        idx = abs(hash(tag)) % 1000
        return generate_raw_battles(
            n_players=1, battles_per_player=n_per_player, seed=idx
        )
    return fetch


def test_meta_loop_stops_enough(spark, tmp_path):
    b = MetaDatasetBuilder(
        spark,
        _mk_fetcher(),
        str(tmp_path / "staging"),
        min_total_battles=50,
        min_games_per_type=0,
        initial_sample=10,
        increment_sample=3,
        seed=1,
    )
    tables = b.run(generate_leaderboard(40))
    assert b.notes[-1].split("decision=")[1].startswith("enough")
    assert tables["battles"].count() >= 50
    # participant table doubles rows
    assert tables["participants"].count() == 2 * tables["battles"].count()


def test_meta_loop_stops_by_exhaustion(spark, tmp_path):
    b = MetaDatasetBuilder(
        spark,
        _mk_fetcher(),
        str(tmp_path / "staging2"),
        min_total_battles=10_000_000,  # unreachable
        min_games_per_type=0,
        initial_sample=5,
        increment_sample=5,
        max_loops=50,
        seed=2,
    )
    b.run(generate_leaderboard(12))
    assert "decision=stop" in b.notes[-1]
    # every usable tag fetched
    usable = sum(1 for p in generate_leaderboard(12) if p.get("tag"))
    assert len(b.fetched_tags) == usable


def test_meta_loop_stops_by_max_loops(spark, tmp_path):
    b = MetaDatasetBuilder(
        spark,
        _mk_fetcher(),
        str(tmp_path / "staging3"),
        min_total_battles=10_000_000,
        initial_sample=2,
        increment_sample=1,
        max_loops=3,
        seed=3,
    )
    b.run(generate_leaderboard(200))
    assert b.loop_count == 3
    assert "decision=stop" in b.notes[-1]


# ---------------------------------------------------------------------------
# Phase-2 router (offline, mocked classifier)
# ---------------------------------------------------------------------------

def test_parse_classifier_fallbacks():
    c = qr.parse_classifier_output("not json at all")
    assert c.category == "other" and c.data_needs == ["SEND_ALL"]
    c = qr.parse_classifier_output(json.dumps({"category": "bogus", "data_needs": []}))
    assert c.category == "other" and c.data_needs == ["SEND_ALL"]
    c = qr.parse_classifier_output(
        json.dumps({"category": "card", "data_needs": ["NOT_A_BLOCK"]})
    )
    assert c.category == "card" and c.data_needs == ["USER_CARD_SUMMARY"]


def test_route_precedence_needs_over_category():
    c = qr.Classification("meta", ["USER_MATCHUP_SUMMARY"])
    assert qr.route_by_category(c) == "matchup"
    c = qr.Classification("user", ["OPPONENT_CARD_SUMMARY"])
    assert qr.route_by_category(c) == "card"
    c = qr.Classification("card", [])
    assert qr.route_by_category(c) == "card"  # category fallback
    c = qr.Classification("other", ["SEND_ALL"])
    assert qr.route_by_category(c) == "other"


def test_enough_data_meta_exempt():
    ok, warn = qr.enough_data(3, "meta")
    assert ok and warn == ""
    ok, warn = qr.enough_data(3, "user")
    assert not ok and "only 3 recent ranked games" in warn
    ok, _ = qr.enough_data(20, "user")
    assert ok


def test_full_qna_flow_offline(catalog):
    user_tables = {
        "user_summary": catalog["llm_user_summary"],
        "user_deck_summary": catalog["llm_user_deck_summary"],
        "user_matchup_summary": catalog["llm_user_matchup_summary"],
        "user_card_summary": catalog["llm_user_card_summary"],
        "opponent_card_summary": catalog["llm_opponent_card_summary"],
    }
    meta_tables = {
        "meta_deck_summary": catalog["llm_user_deck_summary"],  # stand-in
        "meta_matchup_summary": catalog["llm_user_matchup_summary"],
    }
    state = qr.answer_question(
        "why do I keep losing to bait?",
        classify=lambda q: json.dumps(
            {"category": "matchup", "data_needs": ["USER_MATCHUP_SUMMARY"]}
        ),
        answer=lambda q, ctx: f"ctx:{len(ctx)}",
        user_tables=user_tables,
        meta_tables=meta_tables,
        games_played=25,
    )
    assert state["route"] == "matchup"
    assert state["context_tables"] == [
        "meta_deck_summary", "meta_matchup_summary",
        "user_matchup_summary", "user_summary",
    ]
    assert state["has_enough_data"]
    # context cap honored
    assert int(state["answer"].split(":")[1]) <= qr.CONTEXT_CHAR_CAP


# ---------------------------------------------------------------------------
# Phase-2 coach loop (parity: phase2_qna_workflow.py:474-685)
# ---------------------------------------------------------------------------

def _coach_session(catalog, counters):
    from clashroyale_datapipeline_agent_spark.plans.coach import CoachSession

    def build_meta():
        counters["meta"] += 1
        return {
            "meta_deck_summary": catalog["llm_user_deck_summary"],  # stand-in
            "meta_matchup_summary": catalog["llm_user_matchup_summary"],
        }

    def build_user(tag):
        counters["user"] += 1
        counters["tags"].append(tag)
        return {
            "user_summary": catalog["llm_user_summary"],
            "user_deck_summary": catalog["llm_user_deck_summary"],
            "user_matchup_summary": catalog["llm_user_matchup_summary"],
            "user_card_summary": catalog["llm_user_card_summary"],
            "opponent_card_summary": catalog["llm_opponent_card_summary"],
        }

    return CoachSession(
        build_meta=build_meta,
        build_user=build_user,
        classify=lambda q: json.dumps(
            {"category": "meta" if "meta" in q else "user", "data_needs": []}
        ),
        answer=lambda q, ctx: f"A[{q}] ctx:{len(ctx)}",
    )


def test_coach_loop_memoizes_and_stops(catalog):
    """3 questions then a stop word: phase builds run EXACTLY once each
    (ensure_meta/ensure_user memoization), every question is answered,
    and the stop word ends the loop without an answer."""
    from clashroyale_datapipeline_agent_spark.plans.coach import run_coach_loop

    counters = {"meta": 0, "user": 0, "tags": []}
    session = _coach_session(catalog, counters)
    script = iter(["GVJQ20", "how is my win rate?", "what is the meta?",
                   "which deck should I play?", "  STOP  "])
    emitted = []
    state = run_coach_loop(session, ask=lambda prompt: next(script),
                           emit=emitted.append)

    assert counters == {"meta": 1, "user": 1, "tags": ["GVJQ20"]}
    assert state["meta_builds"] == 1 and state["user_builds"] == 1
    assert state["player_tag"] == "GVJQ20"
    assert [r["question"] for r in state["results"]] == [
        "how is my win rate?", "what is the meta?", "which deck should I play?",
    ]
    assert len(emitted) == 3 and all(e.startswith("A[") for e in emitted)
    # routing flows through the real Phase-2 router per question
    assert state["results"][1]["route"] == "meta"
    assert state["results"][0]["route"] == "user"


def test_coach_loop_stop_variants(catalog):
    from clashroyale_datapipeline_agent_spark.plans.coach import (
        is_stop,
        run_coach_loop,
    )

    assert is_stop("stop") and is_stop(" Exit ") and is_stop("QUIT")
    assert not is_stop("stop losing") and not is_stop(None)

    counters = {"meta": 0, "user": 0, "tags": []}
    session = _coach_session(catalog, counters)
    # immediate quit: no answers, but both phases still prebuilt (reference
    # graph order: ensure_meta -> ask_for_tag -> ensure_user -> ask)
    script = iter(["TAG", "quit"])
    state = run_coach_loop(session, ask=lambda p: next(script))
    assert state["results"] == []
    assert counters["meta"] == 1 and counters["user"] == 1


def test_rendered_context_matches_reference_fstrings(spark):
    """F7: engine-side F.format_string rendering reproduces the reference's
    f-string lines (phase2_qna_workflow.py:68-86) on a fixture with no
    half-ULP 2dp boundary values (JVM %.2f rounds HALF_UP, Python
    half-even — display-only divergence, excluded here by construction)."""
    summary = spark.createDataFrame(
        [("games_played", "30"), ("wins", "17"), ("win_rate", "0.5667")],
        "metric string, value string",
    )
    deck = spark.createDataFrame(
        [("Cycle", 30, 17, 0.5666666666666667),
         ("Beatdown", 9, 3, 1.0 / 3.0),
         ("Siege", 4, 2, 0.5)],
        "deck_type string, games long, wins long, win_rate double",
    )
    tables = {"user_summary": summary, "user_deck_summary": deck}
    rendered = qr.render_context_lines(
        "user", ["USER_SUMMARY", "USER_DECK_SUMMARY"], tables
    )
    expected_rows = [("games_played", "30"), ("wins", "17"), ("win_rate", "0.5667")]
    expected = [f"{m}: {v}" for m, v in expected_rows]
    expected.append("\nYour deck performance:")
    for dt, g, w, wr in [("Cycle", 30, 17, 17 / 30), ("Beatdown", 9, 3, 1 / 3),
                         ("Siege", 4, 2, 0.5)]:
        expected.append(f"- {dt}: {w}/{g} wins ({wr:.2f})")
    assert rendered == "\n".join(expected)

    # empty deck table -> the reference's fallback sentence
    empty = deck.filter("games < 0")
    rendered = qr.render_context_lines(
        "user", ["USER_DECK_SUMMARY"], {"user_deck_summary": empty,
                                        "user_summary": summary}
    )
    assert rendered == "\nNo deck statistics found for this user."


def test_answer_question_includes_rendered_text(catalog):
    user_tables = {
        "user_summary": catalog["llm_user_summary"],
        "user_deck_summary": catalog["llm_user_deck_summary"],
        "user_matchup_summary": catalog["llm_user_matchup_summary"],
        "user_card_summary": catalog["llm_user_card_summary"],
        "opponent_card_summary": catalog["llm_opponent_card_summary"],
    }
    meta_tables = {
        "meta_deck_summary": catalog["llm_user_deck_summary"],
        "meta_matchup_summary": catalog["llm_user_matchup_summary"],
    }
    captured = {}

    def answer(q, ctx):
        captured["ctx"] = ctx
        return "ok"

    state = qr.answer_question(
        "how am I doing?",
        classify=lambda q: json.dumps(
            {"category": "user",
             "data_needs": ["USER_SUMMARY", "USER_DECK_SUMMARY"]}
        ),
        answer=answer,
        user_tables=user_tables,
        meta_tables=meta_tables,
        games_played=25,
    )
    assert state["route"] == "user"
    assert "games_played:" in state["context_text"]
    assert "Your deck performance:" in state["context_text"]
    # the rendered text is shipped to the expert ahead of the JSON tables
    assert captured["ctx"].startswith(state["context_text"])


# ---------------------------------------------------------------------------
# Bucketed battle store (SCALE.md wiring: VERDICT r1 item 6)
# ---------------------------------------------------------------------------

def test_meta_loop_bucketed_store_no_exchange(spark, tmp_path):
    """The DEFAULT Phase-0 staging path is the bucketed store: without any
    opt-in, the per-player most-recent-k window (W1) over the staged table
    plans WITHOUT any Exchange — the bucketed scan already satisfies the
    window's required hash distribution."""
    import re

    from clashroyale_datapipeline_agent_spark.operators import meta as M

    b = MetaDatasetBuilder(
        spark,
        _mk_fetcher(),
        str(tmp_path / "staging-unused"),
        min_total_battles=50,
        min_games_per_type=0,
        initial_sample=10,
        increment_sample=3,
        seed=1,
        num_buckets=8,
    )
    try:
        assert b.bucket_table, "bucketed store must be the default"
        tables = b.run(generate_leaderboard(40))
        assert tables["battles"].count() >= 50

        ranked = M.most_recent_per_player(b.staged_battles(), 3)
        plan = spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            ranked._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        # and the result is still the real W1 semantics
        counts = ranked.groupBy("player_tag").count().collect()
        assert counts and all(r["count"] <= 3 for r in counts)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {b.bucket_table}")

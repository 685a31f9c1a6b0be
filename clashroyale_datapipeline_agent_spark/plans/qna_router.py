"""Phase-2 Q&A router (SURVEY.md §2.11, §3.3) — the reference's miniature
query planner, LLM-free at the core.

The classifier LLM's output ``{category, data_needs[]}`` is a logical plan
(which relations to scan); ``route_by_category`` is the planner;
prep functions are projection/limit execution over DataFrames; the expert
LLM call is the sink. LLM clients are injected so the whole thing tests
offline (FIXTURES.md §A6); serialization caps (4,000 chars) applied at the
driver boundary only.

Parity: ``/root/reference/src/workflows/phase2_qna_workflow.py:54-471`` and
``phase2_constants.py``.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CATEGORIES = ["user", "matchup", "meta", "card", "other"]

DATANEEDS = [
    "USER_SUMMARY",
    "USER_DECK_SUMMARY",
    "USER_MATCHUP_SUMMARY",
    "USER_CARD_SUMMARY",
    "OPPONENT_CARD_SUMMARY",
    "META_DECK_SUMMARY",
    "META_DECK_MATCHUPS",
    "SEND_ALL",
]

#: Fallback needs when the classifier output is empty/invalid
#: (``phase2_constants.py:46-52``).
DEFAULT_NEEDS = {
    "user": ["USER_SUMMARY", "USER_DECK_SUMMARY"],
    "matchup": ["USER_MATCHUP_SUMMARY"],
    "meta": ["META_DECK_SUMMARY"],
    "card": ["USER_CARD_SUMMARY"],
    "other": ["SEND_ALL"],
}

CONTEXT_CHAR_CAP = 4000  # phase2_qna_workflow.py:397-398


@dataclass
class Classification:
    category: str = "other"
    data_needs: list[str] = field(default_factory=list)


def parse_classifier_output(raw: str) -> Classification:
    """F6 — tolerant JSON parse of the classifier LLM output with the
    reference's fallbacks (``phase2_qna_workflow.py:238-257``): bad JSON or
    invalid category -> other/defaults; invalid needs filtered; empty needs
    -> category defaults."""
    try:
        data = json.loads(raw)
        if not isinstance(data, dict):
            raise ValueError
    except Exception:
        return Classification("other", list(DEFAULT_NEEDS["other"]))
    cat = data.get("category")
    if cat not in CATEGORIES:
        cat = "other"
    needs = [n for n in (data.get("data_needs") or []) if n in DATANEEDS]
    if not needs:
        needs = list(DEFAULT_NEEDS[cat])
    return Classification(cat, needs)


def route_by_category(c: Classification) -> str:
    """The planner (``phase2_qna_workflow.py:437-471``): data-needs take
    precedence over the category label; category is only a fallback hint."""
    needs = c.data_needs or []
    if any(n in needs for n in ("USER_MATCHUP_SUMMARY", "META_DECK_MATCHUPS")):
        return "matchup"
    if any(n in needs for n in ("USER_CARD_SUMMARY", "OPPONENT_CARD_SUMMARY")):
        return "card"
    if "META_DECK_SUMMARY" in needs:
        return "meta"
    if any(n in needs for n in ("USER_SUMMARY", "USER_DECK_SUMMARY")):
        return "user"
    if c.category in ("user", "matchup", "meta", "card"):
        return c.category
    return "other"


def enough_data(games_played: int, category: str, threshold: int = 20) -> tuple[bool, str]:
    """Data health check (``phase2_qna_workflow.py:289-326``): warn (never
    block) when a non-meta question has < threshold games; meta exempt."""
    if category == "meta":
        return True, ""
    if games_played >= threshold:
        return True, ""
    return False, (
        f"Warning: only {games_played} recent ranked games; "
        "these stats may be noisy or not fully representative."
    )


def prep_context(
    route: str,
    needs: list[str],
    user_tables: dict[str, DataFrame],
    meta_tables: dict[str, DataFrame],
    *,
    deck_rows_limit: int = 5,
) -> dict[str, DataFrame]:
    """Prep-node table selection (``phase2_qna_workflow.py:54-220``).

    Returns named DataFrame slices; limits (top-5 deck rows) are applied as
    ``.limit`` so only the shipped rows ever reach the driver. The "other"
    route ships user_summary only (the reference's SEND_ALL quirk,
    ``:209-220``).
    """
    out: dict[str, DataFrame] = {}
    if route == "user":
        if "USER_SUMMARY" in needs:
            out["user_summary"] = user_tables["user_summary"]
        if "USER_DECK_SUMMARY" in needs:
            out["user_deck_summary"] = user_tables["user_deck_summary"].limit(
                deck_rows_limit
            )
    elif route == "matchup":
        # always ships all four (phase2_qna_workflow.py:92-156)
        out["user_summary"] = user_tables["user_summary"]
        out["user_matchup_summary"] = user_tables["user_matchup_summary"]
        out["meta_deck_summary"] = meta_tables["meta_deck_summary"]
        out["meta_matchup_summary"] = meta_tables["meta_matchup_summary"]
    elif route == "card":
        if "USER_CARD_SUMMARY" in needs:
            out["user_card_summary"] = user_tables["user_card_summary"]
        if "OPPONENT_CARD_SUMMARY" in needs:
            out["opponent_card_summary"] = user_tables["opponent_card_summary"]
    elif route == "meta":
        if "META_DECK_SUMMARY" in needs:
            out["meta_deck_summary"] = meta_tables["meta_deck_summary"]
        if "META_DECK_MATCHUPS" in needs:
            out["meta_deck_matchups"] = meta_tables["meta_matchup_summary"]
    else:  # other
        out["user_summary"] = user_tables["user_summary"]
    return out


def render_context_lines(
    route: str,
    needs: list[str],
    user_tables: dict[str, DataFrame],
    *,
    deck_rows_limit: int = 5,
) -> str:
    """F7 — formatted, human-readable context lines rendered ENGINE-SIDE.

    Parity: ``phase2_qna_workflow.py:68-86`` — ``"{metric}: {value}"`` lines
    for the user summary and ``"- {deck_type}: {wins}/{games} wins
    ({win_rate:.2f})"`` for the top deck rows, with the empty-table fallback
    sentence. The f-strings become ``F.format_string`` expressions (JVM
    codegen), so only the final rendered strings cross the driver boundary —
    at scale the limit prunes before formatting, and nothing re-renders
    driver-side.

    Display nuance: ``%.2f`` rounds HALF_UP in the JVM while Python's
    f-string rounds half-even, so a win_rate landing exactly on a 2dp
    half-boundary (e.g. 0.625) can differ in the last digit. Display-only.
    """
    lines: list[str] = []
    if route == "user" and "USER_SUMMARY" in needs:
        rendered = user_tables["user_summary"].select(
            F.format_string("%s: %s", "metric", "value").alias("line")
        )
        lines.extend(r["line"] for r in rendered.collect())
    if route == "user" and "USER_DECK_SUMMARY" in needs:
        deck = render_deck_lines(
            user_tables["user_deck_summary"], limit=deck_rows_limit
        )
        rows = deck.collect()
        if rows:
            lines.append("\nYour deck performance:")
            lines.extend(r["line"] for r in rows)
        else:
            lines.append("\nNo deck statistics found for this user.")
    return "\n".join(lines)


def render_deck_lines(
    deck_summary: DataFrame, *, limit: int = 5, with_ordinal: bool = False
) -> DataFrame:
    """F7 — the deck-performance lines as a DataFrame of rendered strings.

    The reference sorts by games desc before taking the top rows
    (``user_llm_tables.py:84`` — ``deck_table[:5]``); ``deck_type`` asc is
    the deterministic tiebreak. ``win_rate`` is pre-rounded to 2dp with
    ``F.round`` before the ``%.2f`` format: JVM formatting of an
    already-2dp value is engine-stable (raw ``%.2f`` rounds HALF_UP in
    the JVM but half-even in C/Python on exact half-boundaries), which is
    what lets the ``f7_context_lines`` oracle pair this against DuckDB's
    ``printf``. The limit prunes BEFORE formatting — at scale only
    ``limit`` rows ever render. ``with_ordinal=True`` additionally emits
    the 1-based display position (``line_no``, the same games-desc
    order) so composed renderings can interleave sections
    deterministically."""
    line = F.format_string(
        "- %s: %d/%d wins (%.2f)",
        F.col("deck_type"),
        F.col("wins").cast("long"),
        F.col("games").cast("long"),
        F.round(F.col("win_rate").cast("double"), 2),
    ).alias("line")
    top = deck_summary.orderBy(F.desc("games"), F.asc("deck_type")).limit(limit)
    if not with_ordinal:
        return top.select(line)
    w = Window.orderBy(F.desc("games"), F.asc("deck_type"))
    return top.select(
        F.row_number().over(w).cast("long").alias("line_no"), line
    )


def serialize_context(tables: dict[str, DataFrame], char_cap: int = CONTEXT_CHAR_CAP) -> str:
    """Driver-boundary sink: tables -> JSON, truncated to the reference's
    4,000-char cap (``:392-398``). The only place rows are collected."""
    payload = {name: [r.asDict() for r in df.collect()] for name, df in tables.items()}
    text = json.dumps(payload, default=str)
    return text[:char_cap]


def answer_question(
    question: str,
    *,
    classify: Callable[[str], str],
    answer: Callable[[str, str], str],
    user_tables: dict[str, DataFrame],
    meta_tables: dict[str, DataFrame],
    games_played: int,
) -> dict:
    """Full Phase-2 flow with injected LLM callables (``classify`` returns
    the raw classifier output; ``answer(question, context)`` the coach
    reply). Returns the state dict a caller/test can inspect."""
    c = parse_classifier_output(classify(question))
    route = route_by_category(c)
    ok, warning = enough_data(games_played, c.category)
    tables = prep_context(route, c.data_needs, user_tables, meta_tables)
    context_text = render_context_lines(route, c.data_needs, user_tables)
    context = serialize_context(tables)
    if context_text:
        context = context_text + "\n" + context
    if warning:
        context = warning + "\n" + context
    return {
        "category": c.category,
        "data_needs": c.data_needs,
        "route": route,
        "has_enough_data": ok,
        "low_data_warning": warning,
        "context_tables": sorted(tables),
        "context_text": context_text,
        "answer": answer(question, context),
    }

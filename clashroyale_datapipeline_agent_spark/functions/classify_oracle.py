"""Pure-Python oracle for deck classification — TEST USE ONLY.

An independent transcription of the reference's classifier semantics
(``/root/reference/src/analytics/deck_type.py:38-152``) used to property-test
the native Spark expression in ``functions/cards.py`` (SURVEY.md §5.2 item 3).
Never used in a plan.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

from clashroyale_datapipeline_agent_spark.sources.readers import load_card_metadata_rows


@lru_cache(maxsize=4)
def _meta_by_name(path: str | None = None) -> dict[str, dict]:
    return {r["name"]: r for r in load_card_metadata_rows(path)}


def classify_deck_oracle(cards: list[str], path: str | Path | None = None) -> str:
    """Archetype per the reference cascade; see functions/cards.py for the
    production (native-expression) implementation this checks against."""
    if not cards:
        return "Hybrid"
    meta = _meta_by_name(str(path) if path else None)
    metas = [meta.get(c, {}) for c in cards]

    elixirs = [m["elixir"] for m in metas if isinstance(m.get("elixir"), (int, float))]
    if len(elixirs) == 0:
        avg_elixir = 3.0
        four_cycle = 12.0
    else:
        avg_elixir = sum(elixirs) / 8.0  # divisor fixed at deck size 8
        four_cycle = sum(sorted(elixirs)[:4])

    names = set(cards)
    bait = sum(1 for m in metas if m.get("is_bait_piece"))
    bridge = sum(1 for m in metas if m.get("is_bridge_spam_piece"))
    tank = sum(1 for m in metas if m.get("is_big_tank"))

    if "X-Bow" in names or "Mortar" in names:
        return "Siege"
    if bait >= 3:
        return "Bait"
    if four_cycle <= 9:
        return "Cycle"
    if bridge >= 2:
        return "Bridge Spam"
    if tank >= 1 and avg_elixir >= 3.5:
        return "Beatdown"
    return "Hybrid"

"""Deck classification (SURVEY.md §2.8 F1 + §2.3 J1) as native expressions.

The reference classifies a deck with a per-row Python dict lookup + rule
cascade (``/root/reference/src/analytics/deck_type.py:38-152``). Here the
121-row card dimension becomes a **map literal** folded into the plan, and
the cascade becomes a ``when`` chain over array expressions — zero shuffle,
zero Python, fully whole-stage-codegen'd. (The broadcast-join formulation of
J1 lives in ``operators/card_stats.py`` where per-card rows are wanted
anyway; for per-deck features the map literal is strictly better: no
explode/re-agg round trip.)

Fidelity notes (the subtle bits, per SURVEY.md §7.4):
- avg_elixir divides by 8.0 regardless of how many elixirs resolved
  (``deck_type.py:59``);
- unknown cards and the one null-elixir card are silently dropped from the
  elixir list (``deck_type.py:51-53``);
- if NO elixirs resolve: avg=3.0, four_cycle=12.0 (``deck_type.py:54-57``);
- four-card cycle cost = sum of the 4 cheapest resolved elixirs
  (``deck_type.py:61``);
- X-Bow/Mortar trigger on the card NAME, not a metadata flag
  (``deck_type.py:34-35,65-66``);
- priority: empty->Hybrid; Siege; Bait(>=3); Cycle(<=9); Bridge Spam(>=2);
  Beatdown(tank>=1 & avg>=3.5); Hybrid (``deck_type.py:97-152``).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.sources.readers import load_card_metadata_rows

ARCHETYPE_SIEGE = "Siege"
ARCHETYPE_BAIT = "Bait"
ARCHETYPE_CYCLE = "Cycle"
ARCHETYPE_BRIDGE_SPAM = "Bridge Spam"
ARCHETYPE_BEATDOWN = "Beatdown"
ARCHETYPE_HYBRID = "Hybrid"


def card_meta_map(path: str | Path | None = None) -> Column:
    """The card elixir dimension as a flat ``map<string,int>`` literal.

    Only elixir needs a value lookup; the three boolean flags compile to
    ``isin`` literal lists instead (9/22/7 names), keeping the classify
    expression tree small enough for whole-stage codegen (a map-of-structs
    formulation blew past comfortable codegen size once referenced from
    every feature). The card with null elixir is simply omitted — same
    semantics as the reference's isinstance-drop (``deck_type.py:51-53``).
    For dimensions too big to inline, use the broadcast-join path.
    """
    rows = load_card_metadata_rows(path)
    entries: list[Column] = []
    for r in rows:
        if r["elixir"] is None:
            continue
        entries.append(F.lit(r["name"]))
        entries.append(F.lit(int(r["elixir"])))
    return F.create_map(*entries)


@lru_cache(maxsize=4)
def _flag_names(path: str | None = None) -> dict[str, tuple[str, ...]]:
    rows = load_card_metadata_rows(path)
    return {
        flag: tuple(r["name"] for r in rows if r[flag])
        for flag in ("is_bait_piece", "is_bridge_spam_piece", "is_big_tank")
    }


def deck_feature_cols(cards: Column, meta_map: Column) -> dict[str, Column]:
    """The classifier's precomputed per-deck features as columns.

    Mirrors ``_precompute_deck_values`` (``deck_type.py:38-82``) including
    its quirks (see module docstring). ``cards`` is ``array<string>``.
    Flag counts are per card *instance* (duplicates count twice), matching
    the reference's per-meta iteration — hence ``filter``+``isin``, not
    ``array_intersect`` (which would dedup).
    """
    flags = _flag_names()
    elixirs = F.filter(
        F.transform(cards, lambda c: F.element_at(meta_map, c)),
        lambda e: e.isNotNull(),
    )
    n_elixirs = F.size(elixirs)
    avg_elixir = F.when(n_elixirs == 0, F.lit(3.0)).otherwise(
        F.aggregate(elixirs, F.lit(0.0), lambda acc, x: acc + x) / F.lit(8.0)
    )
    four_cycle = F.when(n_elixirs == 0, F.lit(12.0)).otherwise(
        F.aggregate(
            F.slice(F.array_sort(elixirs), 1, 4),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )

    def _flag_count(flag: str) -> Column:
        names = flags[flag]
        return F.size(F.filter(cards, lambda c: c.isin(*names)))

    return {
        "avg_elixir": avg_elixir,
        "four_card_cycle_cost": four_cycle,
        "has_xbow": F.array_contains(cards, "X-Bow"),
        "has_mortar": F.array_contains(cards, "Mortar"),
        "bait_pieces": _flag_count("is_bait_piece"),
        "bridge_spam_count": _flag_count("is_bridge_spam_piece"),
        "big_tank_count": _flag_count("is_big_tank"),
    }


def classify_deck_col(cards: Column, meta_map: Column | None = None) -> Column:
    """Archetype of an ``array<string>`` deck column — the F1 cascade.

    Parity: ``classify_deck`` (``deck_type.py:85-152``). Empty/null deck ->
    Hybrid (``:97-98``; null arrays only arise from malformed rows, which the
    reference would have skipped upstream).
    """
    if meta_map is None:
        meta_map = card_meta_map()
    v = deck_feature_cols(cards, meta_map)
    return (
        F.when(cards.isNull() | (F.size(cards) == 0), F.lit(ARCHETYPE_HYBRID))
        .when(v["has_xbow"] | v["has_mortar"], F.lit(ARCHETYPE_SIEGE))
        .when(v["bait_pieces"] >= 3, F.lit(ARCHETYPE_BAIT))
        .when(v["four_card_cycle_cost"] <= 9, F.lit(ARCHETYPE_CYCLE))
        .when(v["bridge_spam_count"] >= 2, F.lit(ARCHETYPE_BRIDGE_SPAM))
        .when((v["big_tank_count"] >= 1) & (v["avg_elixir"] >= 3.5), F.lit(ARCHETYPE_BEATDOWN))
        .otherwise(F.lit(ARCHETYPE_HYBRID))
    )

"""Shared scalar column functions (SURVEY.md §2.8).

All native expressions — no Python UDFs — so they stay inside whole-stage
codegen and never block predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def flip_result(result: Column) -> Column:
    """POV flip: win<->loss, draw (and anything else) unchanged.

    Parity: ``/root/reference/src/analytics/meta_analytics.py:32-38`` (dup at
    ``meta_standardize.py:22-28``). Draws never flip.
    """
    return (
        F.when(result == "win", F.lit("loss"))
        .when(result == "loss", F.lit("win"))
        .otherwise(result)
    )


def normalize_tag(tag: Column, *, url: bool = False) -> Column:
    """Canonical player tag: trim, uppercase, ensure one leading ``#``;
    ``url=True`` emits the ``%23``-encoded form.

    Parity: ``/root/reference/src/api/battles.py:6-17`` (strip/upper/
    prepend-#) and ``:33-35`` (``#`` -> ``%23``).
    """
    bare = F.regexp_replace(F.upper(F.trim(tag)), "^#", "")
    prefix = "%23" if url else "#"
    return F.concat(F.lit(prefix), bare)


def win_rate(wins: Column, games: Column) -> Column:
    """``wins/games`` with the reference's divide-by-zero convention.

    Two reference idioms (ternary -> 0.0 at ``user_analytics.py:80``; pandas
    ``.where(games>0, 1)`` divisor at ``meta_analytics.py:86``) produce the
    same value (0/1 == 0.0); unified here as ``otherwise(0.0)`` per
    SURVEY.md §2.2 P10.
    """
    return (
        F.when(games > 0, wins.cast("double") / games.cast("double"))
        .otherwise(F.lit(0.0))
    )


def advantage_label(wr: Column, margin: float = 0.05) -> Column:
    """win_rate -> favored/even/unfavored with a ±margin band around 0.5.

    Parity: ``/root/reference/src/analytics/meta_llm_tables.py:79-90``
    (duplicate at ``user_llm_tables.py:87-100``).
    """
    return (
        F.when(wr >= 0.5 + margin, F.lit("favored"))
        .when(wr <= 0.5 - margin, F.lit("unfavored"))
        .otherwise(F.lit("even"))
    )

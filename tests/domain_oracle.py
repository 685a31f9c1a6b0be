"""In-test pure-Python oracle for the battle front end + counter aggregates.

Independent transcriptions of the reference semantics
(``/root/reference/src/analytics/battle_filters.py``, counter pattern of
``user_analytics.py`` / ``meta_analytics.py``) used ONLY to check the Spark
operators on fixture data.
"""

from __future__ import annotations

from collections import defaultdict

RANKED_IDS = {72000006, 72000464}


def is_ranked_1v1(b: dict) -> bool:
    team, opp = b.get("team", []), b.get("opponent", [])
    if not isinstance(team, list) or not isinstance(opp, list):
        return False
    if len(team) != 1 or len(opp) != 1:
        return False
    gm = b.get("gameMode", {}) or {}
    return gm.get("id") in RANKED_IDS


def normalize(b: dict) -> dict:
    team = b.get("team", [{}]) or [{}]
    opp = b.get("opponent", [{}]) or [{}]
    my, op = (team[0] if team else {}), (opp[0] if opp else {})
    mc, oc = my.get("crowns", 0) or 0, op.get("crowns", 0) or 0
    result = "win" if mc > oc else ("loss" if mc < oc else "draw")

    def cards(side):
        return [
            (c.get("name") or "").strip()
            for c in (side.get("cards") or [])
            if isinstance(c, dict) and c.get("name")
        ]

    gm = b.get("gameMode", {}) or {}
    return {
        "battle_time": b.get("battleTime"),
        "result": result,
        "my_cards": cards(my),
        "opp_cards": cards(op),
        "mode_name": gm.get("name") or (b.get("type") or ""),
        "player_tag": b.get("player_tag"),
    }


def filter_and_normalize(raw: list[dict]) -> list[dict]:
    return [normalize(b) for b in raw if isinstance(b, dict) and is_ranked_1v1(b)]


def flip(res: str) -> str:
    return {"win": "loss", "loss": "win"}.get(res, res)


def counter_table(rows: list[tuple], min_games: int = 0) -> dict:
    """rows: (key, result) -> {key: {games,wins,losses,draws,win_rate}}"""
    stats: dict = defaultdict(lambda: {"games": 0, "wins": 0, "losses": 0, "draws": 0})
    for key, result in rows:
        s = stats[key]
        s["games"] += 1
        if result == "win":
            s["wins"] += 1
        elif result == "loss":
            s["losses"] += 1
        else:
            s["draws"] += 1
    out = {}
    for k, s in stats.items():
        if s["games"] < min_games:
            continue
        s = dict(s)
        s["win_rate"] = s["wins"] / s["games"] if s["games"] else 0.0
        out[k] = s
    return out

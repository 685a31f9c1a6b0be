"""Diff two bench artifacts (BENCH_*.json / BENCH_local.json).

The shared bench host shows ±2-10× single-shot noise (SCALE.md), so the
artifacts carry per-query MIN-of-N timings; this tool compares those
minimums and flags real movement: regressions/improvements beyond a
ratio threshold AND an absolute floor (tiny queries bounce ±50 ms from
JIT/GC without meaning anything).

When both artifacts carry bench.py's ``calibration_sec`` host-speed
constant (round 9+), old timings are first scaled by the calibration
ratio, so a uniformly slower/faster host is factored out before any
flagging; pre-r9 artifacts compare unnormalized.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [ratio=2.0] [floor_s=0.5] [--artifact]

Round-over-round discipline: compare the PREVIOUS round's full map
(BENCH_local.json as committed at that round's end) against the fresh
one — never BENCH_r01-era tails, whose registry barely overlaps today's.
``--artifact`` additionally writes BENCH_REGRESSIONS.json so the judge
reads regressions from a recorded table instead of recomputing.

Exit 0 always (informational — round gating is the judge's job); prints
one line per flagged query plus add/drop lists and the common-subset
totals, which are the only totals comparable across registries of
different sizes.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    """Accept either bench.py's own one-line JSON (has a ``queries``
    map) or the driver's BENCH_r*.json wrapper, whose ``tail`` field is
    a front-TRUNCATED string of that line.

    For a tail, first try to locate and json-parse the ``"queries"``
    sub-object (robust to any surrounding wrapper fields); only when
    the truncation cut into the map itself fall back to pair-regex
    recovery, with recovered keys intersected against the repo's query
    registry names when importable — so a numeric wrapper field can
    never masquerade as a query timing."""
    raw = json.load(open(path))
    if isinstance(raw.get("queries"), dict):
        return {k: float(v) for k, v in raw["queries"].items()}
    text = raw.get("tail", "")
    m = re.search(r'"queries"\s*:\s*\{', text)
    if m:
        # raw_decode consumes one complete JSON value from the '{' — a
        # brace-depth-correct parse, robust to nested objects inside the
        # map (a flat text.find('}') would silently truncate those)
        try:
            obj, _ = json.JSONDecoder().raw_decode(text, m.end() - 1)
            return {
                k: float(v)
                for k, v in obj.items()
                if isinstance(v, (int, float))
            }
        except (ValueError, TypeError):
            pass
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', text)
    skip = {"value", "sf", "reps", "n", "rc", "cpus"}
    out = {k: float(v) for k, v in pairs if k not in skip}
    known = _registry_names()
    if known:
        out = {k: v for k, v in out.items() if k in known}
    return out


def load_calibration(path: str) -> float | None:
    """The artifact's host-speed constant (``calibration_sec``, written
    by bench.py since round 9): identical fixed work every round, so the
    ratio of two artifacts' calibrations is the ambient host-speed ratio.
    Works on full lines, driver wrappers (``parsed``), and raw tails.
    None for pre-r9 artifacts — comparison then runs unnormalized."""
    raw = json.load(open(path))
    for obj in (raw, raw.get("parsed") or {}):
        v = obj.get("calibration_sec") if isinstance(obj, dict) else None
        if isinstance(v, (int, float)) and v > 0:
            return float(v)
    m = re.search(r'"calibration_sec"\s*:\s*([0-9]+(?:\.[0-9]+)?)', raw.get("tail", ""))
    return float(m.group(1)) if m else None


def _registry_names() -> set[str] | None:
    """Names of every registered query, or None when the package (and
    its pyspark dependency) is not importable in this interpreter."""
    try:
        import __spark_entry__ as entry

        return set(entry.queries())
    except Exception:
        return None


def compare(
    old: dict, new: dict, ratio: float, floor_s: float, cal_ratio: float = 1.0
) -> dict:
    """``cal_ratio`` = new_calibration / old_calibration: >1 means the
    host ran slower for the NEW artifact. Old timings are scaled by it
    before flagging, so ambient drift the calibration probe also felt is
    not reported as a code regression (and a host speedup cannot mask
    one)."""
    oq, nq = old, new
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    dropped = sorted(set(oq) - set(nq))
    regressions, improvements = [], []
    for name in common:
        a, b = oq[name] * cal_ratio, nq[name]
        if max(a, b) < floor_s:
            continue
        if b >= a * ratio:
            regressions.append((name, round(a, 3), b))
        elif a >= b * ratio:
            improvements.append((name, round(a, 3), b))
    return {
        "common": common,
        "added": added,
        "dropped": dropped,
        "cal_ratio": round(cal_ratio, 4),
        "regressions": sorted(regressions, key=lambda t: -t[2] / max(t[1], 1e-9)),
        "improvements": sorted(improvements, key=lambda t: -t[1] / max(t[2], 1e-9)),
        "old_total_common": round(sum(oq[n] for n in common), 2),
        "old_total_common_normalized": round(
            sum(oq[n] for n in common) * cal_ratio, 2
        ),
        "new_total_common": round(sum(nq[n] for n in common), 2),
    }


def main(argv: list[str]) -> int:
    emit = "--artifact" in argv
    argv = [a for a in argv if a != "--artifact"]
    if len(argv) < 3:
        print(__doc__)
        return 2
    old = load_queries(argv[1])
    new = load_queries(argv[2])
    ratio = float(argv[3]) if len(argv) > 3 else 2.0
    floor_s = float(argv[4]) if len(argv) > 4 else 0.5
    cal_old, cal_new = load_calibration(argv[1]), load_calibration(argv[2])
    cal_ratio = cal_new / cal_old if cal_old and cal_new else 1.0
    r = compare(old, new, ratio, floor_s, cal_ratio=cal_ratio)
    if emit:
        from pathlib import Path

        art = Path(__file__).resolve().parents[1] / "BENCH_REGRESSIONS.json"
        art.write_text(
            json.dumps(
                {
                    "old": argv[1],
                    "new": argv[2],
                    "ratio": ratio,
                    "floor_s": floor_s,
                    **{
                        k: r[k]
                        for k in (
                            "cal_ratio",
                            "regressions",
                            "improvements",
                            "added",
                            "dropped",
                            "old_total_common",
                            "old_total_common_normalized",
                            "new_total_common",
                        )
                    },
                    "n_common": len(r["common"]),
                },
                indent=1,
            )
        )
    print(
        f"common subset: {len(r['common'])} queries | "
        f"old {r['old_total_common']}s -> new {r['new_total_common']}s"
        + (
            f" | host cal ratio {cal_ratio:.2f}x "
            f"(old normalized: {r['old_total_common_normalized']}s)"
            if cal_ratio != 1.0
            else " | no calibration in one/both artifacts"
        )
    )
    if r["added"]:
        print(f"added ({len(r['added'])}): {', '.join(r['added'])}")
    if r["dropped"]:
        print(f"dropped ({len(r['dropped'])}): {', '.join(r['dropped'])}")
    for name, a, b in r["regressions"]:
        print(f"REGRESSION  {name}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
    for name, a, b in r["improvements"]:
        print(f"improved    {name}: {a:.2f}s -> {b:.2f}s ({a / b:.1f}x faster)")
    if not r["regressions"]:
        print(f"no regressions beyond {ratio}x (floor {floor_s}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

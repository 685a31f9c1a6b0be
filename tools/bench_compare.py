"""Diff two bench artifacts (BENCH_*.json / BENCH_local.json).

The shared bench host shows ±2-10× single-shot noise (SCALE.md), so the
artifacts carry per-query MIN-of-N timings; this tool compares those
minimums RAW and flags real movement: regressions/improvements beyond a
ratio threshold AND an absolute floor (tiny queries bounce ±50 ms from
JIT/GC without meaning anything).

Round-12 discipline (judge ask #6): NO calibration-scalar
normalization. The 0.1-0.2 s ``calibration_sec`` microbenchmark cannot
support cross-run scaling — the r10/r11 artifacts carry 0.212 vs 0.135
on the same host class, which would swing a flat comparison to ±50%
depending on direction. Both artifacts' calibration values are RECORDED
as a note, and systematic drift is read from a PAIRED RANK TEST over
the common queries instead: the Wilcoxon signed-rank statistic on
per-query log-ratios (normal approximation), plus the median ratio and
the faster/slower counts. A genuine uniform host slowdown moves nearly
every query the same way (|z| large, median ratio far from 1); noise
does not.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [ratio=2.0] [floor_s=0.5] [--artifact]

Round-over-round discipline: compare the PREVIOUS round's full map
(BENCH_local.json as committed at that round's end) against the fresh
one — never BENCH_r01-era tails, whose registry barely overlaps today's.
``--artifact`` additionally writes BENCH_REGRESSIONS.json so the judge
reads regressions from a recorded table instead of recomputing.

Exit 0 always (informational — round gating is the judge's job); prints
one line per flagged query plus add/drop lists, the raw common-subset
totals, and the rank-test row.
"""

from __future__ import annotations

import json
import math
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
    by bench.py since round 9). Recorded as a NOTE only — never used to
    scale timings (round-12). None for pre-r9 artifacts."""
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


def rank_test(old: dict, new: dict, common: list[str]) -> dict:
    """Wilcoxon signed-rank over per-query log-ratios new/old (normal
    approximation, zero-ratio pairs dropped, average ranks on ties).
    z > 0 = systematically SLOWER; |z| < ~2 = no systematic shift."""
    diffs = []
    for n in common:
        if old[n] > 0 and new[n] > 0:
            d = math.log(new[n] / old[n])
            if d != 0.0:
                diffs.append(d)
    n = len(diffs)
    if n < 5:
        return {"n_pairs": n, "z": None, "median_ratio": None}
    ranked = sorted(diffs, key=lambda d: abs(d))
    # average ranks for tied |d|
    ranks: list[float] = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j + 1 < n and abs(ranked[j + 1]) == abs(ranked[i]):
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[k] = avg
        i = j + 1
    w_plus = sum(r for d, r in zip(ranked, ranks) if d > 0)
    mean = n * (n + 1) / 4
    sd = math.sqrt(n * (n + 1) * (2 * n + 1) / 24)
    z = (w_plus - mean) / sd if sd > 0 else 0.0
    ratios = sorted(math.exp(d) for d in diffs)
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return {
        "n_pairs": n,
        "z": round(z, 2),
        "median_ratio": round(med, 4),
        "n_slower": sum(1 for d in diffs if d > 0),
        "n_faster": sum(1 for d in diffs if d < 0),
    }


def compare(old: dict, new: dict, ratio: float, floor_s: float) -> dict:
    """RAW per-query min comparison (no calibration scaling) plus the
    paired rank test for systematic drift."""
    oq, nq = old, new
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    dropped = sorted(set(oq) - set(nq))
    regressions, improvements = [], []
    for name in common:
        a, b = oq[name], nq[name]
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
        "regressions": sorted(regressions, key=lambda t: -t[2] / max(t[1], 1e-9)),
        "improvements": sorted(improvements, key=lambda t: -t[1] / max(t[2], 1e-9)),
        "old_total_common": round(sum(oq[n] for n in common), 2),
        "new_total_common": round(sum(nq[n] for n in common), 2),
        "rank_test": rank_test(oq, nq, common),
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
    # round-12 ask #5: when the two runs' host-speed probes differ by
    # more than 15%, raw per-query ratios are contaminated by ambient
    # drift — warn loudly so the comparison is re-run on an idle host
    # (or read via the rank test only) instead of being taken at face
    # value. Never used to scale timings (round-12 discipline).
    cal_warn = None
    if cal_old and cal_new:
        drift = max(cal_old, cal_new) / min(cal_old, cal_new)
        if drift > 1.15:
            cal_warn = (
                f"calibrations differ {drift:.2f}x ({cal_old} vs {cal_new}):"
                " host speed shifted between runs — treat raw per-query"
                " ratios as contaminated; trust the rank test direction"
                " only, or re-run on an idle host (see the 'host' block"
                " in each artifact)"
            )
    r = compare(old, new, ratio, floor_s)
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
                    "calibration_note": {"old": cal_old, "new": cal_new},
                    "calibration_divergence_warning": cal_warn,
                    **{
                        k: r[k]
                        for k in (
                            "regressions",
                            "improvements",
                            "added",
                            "dropped",
                            "old_total_common",
                            "new_total_common",
                            "rank_test",
                        )
                    },
                    "n_common": len(r["common"]),
                },
                indent=1,
            )
        )
    rt = r["rank_test"]
    print(
        f"common subset: {len(r['common'])} queries | "
        f"old {r['old_total_common']}s -> new {r['new_total_common']}s (raw)"
    )
    if rt.get("z") is not None:
        print(
            f"paired rank test: z={rt['z']} median_ratio={rt['median_ratio']} "
            f"({rt['n_slower']} slower / {rt['n_faster']} faster of "
            f"{rt['n_pairs']}; |z|<2 = no systematic shift)"
        )
    if cal_old or cal_new:
        print(
            f"calibration (note only, not used): old={cal_old} new={cal_new}"
        )
    if cal_warn:
        print(f"WARNING {cal_warn}")
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

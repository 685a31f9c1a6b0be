"""Intra-engine determinism sweep: run every registered query N times in
one session and flag any whose VALUES vary across runs.

Why this exists: Spark's partial-aggregation merge order varies with task
completion order, so a float SUM/AVG can differ in its last bits between
runs — invisible until a ROUND boundary flips a stored decimal (the
``docs_source_gini_balance`` flake: 1 − SUM((c/n)²) flipped its 4th
decimal ~1 run in 3 on a corpus whose true value sat on the boundary).
The cross-engine oracle can only catch that when a flip happens DURING
its run; this sweep provokes it directly by re-executing and comparing
the full result set hash run-over-run.

    python tools/determinism_sweep.py [sf_dir] [reps] [name1,name2,...]

Exit 1 if any query is unstable; prints the first differing cell.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _canon(rows) -> list[tuple]:
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append(tuple((k, repr(d[k])) for k in sorted(d)))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import __spark_entry__ as entry
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("determinism_sweep")
    qs = entry.queries()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown query names (not in registry): {unknown}")
    unstable: dict[str, str] = {}
    checked = 0
    for name in sorted(qs):
        if names and name not in names:
            continue
        checked += 1
        try:
            first = _canon(qs[name](spark, sf_dir).collect())
            for rep in range(1, reps):
                again = _canon(qs[name](spark, sf_dir).collect())
                if again != first:
                    diff = next(
                        (f"run0={a} run{rep}={b}" for a, b in zip(first, again) if a != b),
                        f"row-count {len(first)} vs {len(again)}",
                    )
                    unstable[name] = diff[:300]
                    break
        except Exception as exc:
            unstable[name] = f"ERROR {type(exc).__name__}: {exc}"[:300]
    # record the run as an artifact: each sweep appends its verdict so
    # the stability evidence accumulates across sf dirs / rep counts
    import json

    art = Path(__file__).resolve().parents[1] / "DETERMINISM.json"
    runs = []
    if art.exists():
        try:
            runs = json.loads(art.read_text()).get("runs", [])
        except ValueError:
            runs = []
    from tools.oracle_check import git_sha

    runs.append(
        {
            "sf_dir": sf_dir,
            "reps": reps,
            "checked": checked,
            "unstable": unstable,
            "git_sha": git_sha(),
        }
    )
    art.write_text(json.dumps({"runs": runs[-20:]}, indent=1))
    if unstable:
        for n, d in unstable.items():
            print(f"UNSTABLE {n} :: {d}")
        print(f"{len(unstable)}/{checked} queries unstable over {reps} runs")
        return 1
    print(f"all {checked} queries value-stable over {reps} runs at {sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

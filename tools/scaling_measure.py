"""Three-point scaling measurement (round-10 judge ask #3): run the
most expensive registry queries at x1 / x3 / x10 of the sf0.1 heavy-
table sizes (tools/gen_scaled_data.py) and fit a log-log slope of
wall-clock vs data multiplier.

slope ~ 1.0 = linear in data volume; ~ 0 = size-independent (fixed
census / fixed iteration count); >> 1 = superlinear, a scale smell the
plan audit should explain. Each timing is the min of ``--reps`` runs
(min, not mean: we measure the plan, not the scheduler). Results land
in SCALING.json, git_sha-pinned, and feed SCALE.md's "Measured
scaling" table.

Usage: python tools/scaling_measure.py [--reps 2] [name1,name2,...]
Default query set: the top-expensive queries of BENCH_local.json whose
cost is driven by the scaled tables (documents/embeddings/events).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.oracle_check import git_sha  # noqa: E402

#: top-of-BENCH queries whose runtime is keyed on the scaled tables.
#: orders_adamic_adar_topk (orders — constant-size symlink) is excluded
#: and documented in SCALE.md.
DEFAULT_QUERIES = [
    "docs_incremental_neardup_counts",
    "curation_image_neardup_report",
    "graph_pagerank_topk",
    "dedup_lsh_band_sweep_xx",
    "embeddings_kcenter_coreset",
    "curation_neardup_pipeline_report",
    "docs_contrastive_pairs_stats",
    "embeddings_facility_location_gains",
    "ann_ivf_recall_sweep",
    "dedup_lsh_band_sweep",
]

SCALES = [("x1", 1), ("x3", 3), ("x10", 10)]


def _fit_slope(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log(sec) on log(mult)."""
    xs = [math.log(m) for m, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    names = args[0].split(",") if args else DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from clashroyale_datapipeline_agent_spark.session import get_spark

    repo = Path(__file__).resolve().parents[1]
    root = repo / ".scaledata"
    if not (root / "x10").exists():
        sys.exit("run tools/gen_scaled_data.py first")
    spark = get_spark("scaling-measure")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        rec: dict[str, float] = {}
        # untimed warmup at the smallest scale: JVM/codegen/file-listing
        # warmup otherwise inflates the x1 point and flattens the slope
        fn(spark, str(root / SCALES[0][0])).collect()
        for sname, mult in SCALES:
            sf_dir = str(root / sname)
            best = math.inf
            for _ in range(reps):
                t0 = time.monotonic()
                fn(spark, sf_dir).collect()
                best = min(best, time.monotonic() - t0)
            rec[sname] = round(best, 3)
            print(f"{name} {sname}: {best:.2f}s", flush=True)
        slope = _fit_slope([(m, rec[s]) for s, m in SCALES])
        rec["slope"] = round(slope, 3)
        out[name] = rec
        print(f"{name}: slope={slope:.3f}", flush=True)
    path = repo / "SCALING.json"
    hist = json.loads(path.read_text()) if path.exists() else []
    hist.append(
        {
            "git_sha": git_sha(),
            "reps": reps,
            "scales": {s: m for s, m in SCALES},
            "queries": out,
        }
    )
    path.write_text(json.dumps(hist, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

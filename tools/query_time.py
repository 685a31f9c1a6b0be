"""Time individual registry queries with the noop sink (guide §1.4).

Usage:
    python tools/query_time.py name1,name2,... [reps]

Per query: one untimed warm-up run at sf0.001 (plan/codegen warm), then
``reps`` (default 3) timed executions at $SPARK_GRAFT_SF_DIR via
``df.write.format("noop")`` — every column of every row computed, no
sink cost, full plan visible in the SQL tab. Reports min/median per
query as JSON on the last line. Jobs are labelled with the query name
(guide §1.5). The bench-of-record (bench.py) still times
plan+execute+count; this tool is the isolation probe for optimization
work, not the driver metric.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("query-time")
    qs = entry.queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        try:
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — warm-up is best-effort
            pass
        times: list[float] = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "all": times,
        }
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

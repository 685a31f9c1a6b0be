"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage:
    python tools/explain_dump.py <out_dir> <suffix> [name1,name2,...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query (e.g. suffix
``before`` / ``after`` for the round-13 optimization evidence). With no
name list, dumps every registered query. The dump is the PRE-execution
plan (``AdaptiveSparkPlan isFinalPlan=false``) — deterministic, no jobs
beyond whatever driver-side collects the query constructor itself runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("explain-dump")
    qs = entry.queries()
    if names is None:
        names = sorted(qs)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"OK {name} -> {path}")


if __name__ == "__main__":
    main()

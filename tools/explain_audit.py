"""Physical-plan audit: per registered query, report the plan facts that
matter at 100 TB — scan pushdown, join strategies, shuffle count, codegen
coverage. Usage: python tools/explain_audit.py [sf_dir] [names,csv]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def audit(sf_dir: str, names: list[str] | None = None) -> None:
    import __spark_entry__ as entrymod
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = entrymod.queries()
    for name, fn in sorted(qs.items()):
        if names and name not in names:
            continue
        df = fn(spark, sf_dir)
        plan = spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_n = sum(1 for p in pushed if p.strip())
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        read_cols = sum(s.count(":") for s in schemas)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        n_wsc = len(re.findall(r"WholeStageCodegen", plan))
        n_scan = len(re.findall(r"Scan parquet", plan))
        top_k = "TakeOrderedAndProject" in plan
        print(
            f"{name:36s} scans={n_scan} pushedFilters={pushed_n} readCols={read_cols} "
            f"exchanges={n_exchange} BHJ={n_bhj} SMJ={n_smj} BNLJ={n_bnlj} "
            f"codegenSpans={n_wsc} topK={top_k}"
        )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    audit(sf_dir, names)

"""Scaling probe: time the flagship aggregation at 1x/4x/16x the sf0.1
lineitem volume (duplicated with perturbed keys into /tmp parquet) and
report rows/sec. Linear wall-clock growth (flat rows/sec) demonstrates the
plan has no super-linear term — the local proxy for the 100 TB claim.

    python tools/scale_probe.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    spark = get_spark("scale-probe")
    base = load_star_table(spark, "/root/testdata/sf0.1", "lineitem")

    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_"))
    results = []
    for mult in (1, 4, 16):
        path = tmp / f"x{mult}"
        (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .withColumn("l_orderkey", F.col("l_orderkey") * mult + F.col("_rep"))
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path))
        )
        df = spark.read.parquet(str(path))
        n = df.count()
        # warm
        _agg(df).count()
        t0 = time.perf_counter()
        _agg(df).count()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(f"x{mult:<3d} rows={n:>9,d}  wall={dt:6.2f}s  rows/sec={int(n/dt):,}")

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means near-linear scaling; <1 includes fixed overhead amortizing out)"
    )


def _agg(df):
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sq"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sd"),
            F.avg("l_discount").alias("ad"),
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timing each query's full
execution (plan + execute + collect-to-count). Prints:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import time


HEADLINE = [
    "flagship_pricing_summary",
    "a7_symmetric_pair_matrix",
    "a2_explode_token_stats",
    "p10_win_rate_per_customer",
    "w1_topk_per_group",
    "j1_broadcast_dim_join",
    "j3_anti_join_unordered_customers",
    "events_tumbling_hourly",
    "events_sessionization",
    "o1_global_topk",
    "a9_role_tagged_union",
    "cr_classify_archetype_counts",
    "cr_symmetric_matchup_matrix",
    "dedup_exact_groups",
    "dedup_shingle_minhash_md5",
    "ann_cosine_topk",
    "j_range_join_ship_window",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "text_token_stats_by_lang",
    "lang_id_confusion",
    "f6_json_props_extract",
]

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark import plans  # noqa: F401
    import __spark_entry__ as entry

    spark = get_spark("bench")
    qs = entry.queries()

    # steady-state warm-up: run each headline query once at the smallest sf
    # so JIT/codegen caches are hot and timings measure the queries, not
    # JVM bring-up (same plans, different input dir)
    for name in HEADLINE:
        try:
            qs[name](spark, WARMUP_SF_DIR).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline query wall-clock at sf, local mode",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

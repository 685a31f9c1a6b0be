"""Plan-shape regressions for the round-3 TPC-H-extra catalog
(plans/tpch_extra.py). Correctness is covered by the oracle rows; these
lock the physical properties the scale design depends on:

- Q19's OR-of-ANDs must still hash-join on the extracted partkey equi-key
  (a nested-loop here would be O(|lineitem| x |part|) at scale);
- Q4/Q21's EXISTS / NOT EXISTS become semi/anti joins, not
  distinct+inner-join rewrites;
- top-k queries plan as TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from clashroyale_datapipeline_agent_spark.plans import tpch_extra as TQ


def _plan(spark, df) -> str:
    return spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q19_disjunction_keeps_equi_hash_join(spark, sf_dir):
    plan = _plan(spark, TQ.q19_disjunctive_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    plan = _plan(spark, TQ.q4_priority_late_exists(spark, sf_dir))
    assert "LeftSemi" in plan
    # the orders date window reaches the parquet scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_q21_double_correlation_is_semi_plus_anti(spark, sf_dir):
    plan = _plan(spark, TQ.q21_waiting_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_q10_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, TQ.q10_returned_revenue_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # returnflag predicate pushed into the fact scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q9_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, TQ.q9_profit_by_nation_year(spark, sf_dir))
    # part (LIKE-filtered), supplier, and nation all broadcast — at least
    # three broadcast joins; the only shuffle joins allowed are fact-fact
    assert plan.count("BroadcastHashJoin") >= 3


def test_q16_blocklist_is_broadcast_anti(spark, sf_dir):
    plan = _plan(spark, TQ.q16_supplier_counts_by_class(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q2_window_ranks_inside_broadcast_candidates(spark, sf_dir):
    plan = _plan(spark, TQ.q2_best_supplier_per_part(spark, sf_dir))
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastHashJoin" in plan


def test_open_census_matches_direct_count(spark, sf_dir):
    """The boundary prefix-sum census must equal the direct definition:
    for the reported peak day d, n_open == count of lines with
    o_orderdate <= d AND l_shipdate > d (same-day ship counts closed).
    The census computes this WITHOUT a day-by-interval range join; the
    direct count here is the (unscalable) ground truth."""
    from pyspark.sql import functions as F2

    from clashroyale_datapipeline_agent_spark.plans import tpch_extra as TE
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_tables,
    )

    rows = TE.lineitem_open_census_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["n_open"] >= rows[-1]["n_open"] for r in rows)
    t = load_star_tables(spark, sf_dir, "lineitem", "orders")
    iv = t["lineitem"].join(
        t["orders"],
        t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"],
    ).filter(F2.to_date("l_shipdate") >= F2.to_date("o_orderdate"))
    for r in rows[:3]:
        d = r["census_date"]
        direct = iv.filter(
            (F2.to_date("o_orderdate") <= F2.lit(d))
            & (F2.to_date("l_shipdate") > F2.lit(d))
        ).count()
        assert direct == r["n_open"], (d, direct, r["n_open"])

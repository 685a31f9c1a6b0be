"""Plan-regression tests: assert the physical-plan properties the scale
design depends on (SCALE.md). If a refactor silently turns a broadcast join
into a shuffle join or blocks pushdown, these fail."""

from __future__ import annotations

from clashroyale_datapipeline_agent_spark.plans import star_queries as SQ


def _plan(spark, df) -> str:
    return spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, SQ.p1_predicate_pushdown_scan(spark, sf_dir))
    assert "PushedFilters: [" in plan
    # at least one real pushed filter (not an empty list)
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any(p.strip() for p in pushed)
    # column pruning: only the 5 consumed columns are read
    assert "l_extendedprice" not in plan.split("ReadSchema")[1]


def test_dimension_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, SQ.j1_broadcast_dim_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_broadcasts_no_shuffle(spark, sf_dir):
    plan = _plan(spark, SQ.j3_anti_join_unordered_customers(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_global_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, SQ.o1_global_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_counter_agg_is_partial_final(spark, sf_dir):
    plan = _plan(spark, SQ.p10_win_rate_per_customer(spark, sf_dir))
    # two HashAggregate nodes (partial + final) around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_classify_plan_has_no_python_udf(spark, sf_dir):
    from clashroyale_datapipeline_agent_spark.plans import domain_queries as DQ

    plan = _plan(spark, DQ.cr_classify_archetype_counts(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spread_is_noop_on_multipartition_input(spark):
    """_spread must NOT insert a round-robin exchange once the input is
    already parallel (VERDICT.md round-1: the unconditional repartition was
    a gratuitous full-table shuffle at cluster scale) — and must still
    spread a single-partition input locally."""
    from clashroyale_datapipeline_agent_spark.plans.domain_queries import _spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, numPartitions=target)
    assert _spread(wide) is wide  # no new plan node at all

    narrow = spark.range(0, 10_000, numPartitions=1)
    spread = _spread(narrow)
    assert spread.rdd.getNumPartitions() == target
    assert "RoundRobinPartitioning" in _plan(spark, spread)


def test_sessionization_single_shuffle(spark, sf_dir):
    from clashroyale_datapipeline_agent_spark.plans import text_queries as TQ

    plan = _plan(spark, TQ.events_sessionization(spark, sf_dir))
    # the user_id shuffle is reused by lag, cumsum, and the final agg
    # (formatted mode lists each node twice: tree + details section)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_pov_doubling_is_explode_not_union(spark, sf_dir):
    """The symmetric matrix (and its mirror-filtered view) must double rows
    through ONE Generate, never a Union of two projections: union branches
    re-execute the parent subtree and let pushed key-filters duplicate the
    classification cascade into each branch (the round-2 cr_p8 3.5x
    regression)."""
    from clashroyale_datapipeline_agent_spark.plans import domain_queries as DQ

    for q in (DQ.cr_symmetric_matchup_matrix, DQ.cr_p8_mirror_exclusion):
        plan = _plan(spark, q(spark, sf_dir))
        assert plan.count("Generate") >= 1, plan
        assert "Union" not in plan, plan


def test_a15_combined_counts_single_scan(spark, sf_dir):
    """A15 must read the battle lineage ONCE: classify both sides in one
    projection and explode-double, not two per-side value_counts scans
    unioned (the round-3 4.2 s plan wart). One parquet scan of lineitem
    (the battle fixture lineage), one Generate, no Union."""
    from clashroyale_datapipeline_agent_spark.plans import domain_queries as DQ

    import re

    plan = _plan(spark, DQ.cr_a15_combined_type_counts(spark, sf_dir))
    # distinct scan NODES (the tree may reference one node id repeatedly)
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) == 1, plan
    gen_ids = set(re.findall(r"\((\d+)\) Generate", plan))
    assert len(gen_ids) == 1, plan
    assert "Union" not in plan, plan


def test_asof_join_single_shuffle_no_udf(spark, sf_dir):
    """as_of_join plans as one Exchange on the key (the union + running
    window shape) with no Python evaluation node."""
    import re

    from clashroyale_datapipeline_agent_spark.plans import text_queries as TQ

    plan = _plan(spark, TQ.events_asof_attribution(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly two shuffles: the views (user_id, ts) pre-dedup aggregation
    # and the single-key window shuffle the as-of carry runs on; a naive
    # per-key merge implementation would add more (or a sort-merge join)
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L, ts", plan)) == 1, plan
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L, \d+\)", plan)) == 1, plan
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_chunking_is_map_side_only(spark, sf_dir):
    """RAG chunking must not shuffle: sequence+explode+slice is a pure
    map-side fan-out."""
    from clashroyale_datapipeline_agent_spark.operators.text import chunk_documents
    from clashroyale_datapipeline_agent_spark.plans.star_queries import _t

    d = _t(spark, sf_dir, "documents")
    plan = _plan(spark, chunk_documents(d))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_broadcasts_stats_and_df(spark, sf_dir):
    """BM25's corpus stats (1 row) and query-term DF table (|query| rows)
    must broadcast — a shuffle join there would dominate the plan."""
    from clashroyale_datapipeline_agent_spark.operators.text import bm25_scores
    from clashroyale_datapipeline_agent_spark.plans.star_queries import _t

    d = _t(spark, sf_dir, "documents")
    plan = _plan(spark, bm25_scores(d, ["spark", "join"]))
    assert "SortMergeJoin" not in plan  # all joins broadcast-shaped


def test_cap_per_group_single_shuffle(spark, sf_dir):
    """Per-group capping is one Exchange on the group key (the W1 window
    shape) — nothing else."""
    import re

    from clashroyale_datapipeline_agent_spark.operators.sampling import cap_per_group
    from clashroyale_datapipeline_agent_spark.plans.star_queries import _t

    d = _t(spark, sf_dir, "documents")
    plan = _plan(spark, cap_per_group(d, group_col="lang", cap=10, id_col="doc_id"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is the pushdown acid test: every predicate reaches the scan and
    only the 4 consumed columns are read."""
    plan = _plan(spark, SQ.q6_forecast_revenue(spark, sf_dir))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    read = plan.split("ReadSchema")[1]
    assert "l_orderkey" not in read and "l_suppkey" not in read


def test_q18_having_join_take_ordered(spark, sf_dir):
    """Q18: the top-25 must be TakeOrderedAndProject (never a full sort)
    and the HAVING aggregate must sit below the joins."""
    plan = _plan(spark, SQ.q18_large_volume_customers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan


def test_q13_preaggregates_orders_before_join(spark, sf_dir):
    """Q13: orders must reduce to one (custkey, count) row per customer
    BEFORE the outer join — the join's right side is an aggregate, so the
    plan carries a HashAggregate on o_custkey beneath the join node."""
    import re

    plan = _plan(spark, SQ.q13_order_count_distribution(spark, sf_dir))
    assert "Join" in plan
    assert re.search(r"Keys \[1\]: \[o_custkey", plan)


def test_funnel_single_user_shuffle_no_join(spark, sf_dir):
    """The 3-step funnel must stay join-free: three conditional window
    passes over ONE user_id exchange, then the 1-row rollup."""
    import re

    from clashroyale_datapipeline_agent_spark.plans import text_queries as TQ

    plan = _plan(spark, TQ.events_funnel_3step(spark, sf_dir))
    assert "Join" not in plan
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 2, exchanges  # user_id hash + final single-partition


def test_pq_assign_is_map_side(spark, sf_dir):
    """PQ assignment must be a pure map-side literal-argmin: zero
    exchanges, no joins, no Python nodes."""
    from clashroyale_datapipeline_agent_spark.operators.similarity import pq_assign
    from clashroyale_datapipeline_agent_spark.plans.star_queries import _t

    e = _t(spark, sf_dir, "embeddings")
    seed = (
        e.filter(e.vec_id < 4)
        .orderBy("vec_id")
        .select(e.embedding.cast("array<double>"))
        .collect()
    )
    books = [[list(r[0][g * 8 : g * 8 + 8]) for r in seed] for g in range(8)]
    plan = _plan(spark, pq_assign(e, books))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_equidepth_no_window(spark, sf_dir):
    # the whole point: exact equi-depth WITHOUT a global-order WindowExec
    from clashroyale_datapipeline_agent_spark.plans import scale_queries as SCQ

    plan = _plan(spark, SCQ.docs_equidepth_histogram(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_zorder_no_sort_no_window(spark, sf_dir):
    # zone maps via closed-form buckets: no Sort, no Window anywhere
    from clashroyale_datapipeline_agent_spark.plans import scale_queries as SCQ

    plan = _plan(spark, SCQ.orders_zorder_locality(spark, sf_dir))
    assert "Window" not in plan
    assert "TakeOrdered" in plan or plan.count("Sort ") <= 1  # final ORDER BY only


def test_merge_single_join(spark, sf_dir):
    # MERGE = exactly one (full-outer) join, no second pass
    from clashroyale_datapipeline_agent_spark.plans import scale_queries as SCQ

    plan = _plan(spark, SCQ.orders_merge_upsert_stats(spark, sf_dir))
    # "formatted" lists each node in tree + detail sections: count the
    # unique "Join type:" detail line instead of node-name substrings
    assert plan.count("Join type:") == 1
    assert "Join type: FullOuter" in plan


def test_cms_counters_partial_final(spark, sf_dir):
    # sketch state collapses map-side before the exchange
    from clashroyale_datapipeline_agent_spark.operators.sketches import cms_counters
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    ev = load_star_table(spark, sf_dir, "events")
    plan = _plan(spark, cms_counters(ev, "user_id"))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_fk_audit_dimension_edges_broadcast(spark, sf_dir):
    from clashroyale_datapipeline_agent_spark.plans import scale_queries as SCQ

    plan = _plan(spark, SCQ.fk_integrity_audit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier/customer/nation edges


def test_registry_wide_no_cartesian_no_stray_python(spark):
    """The two audit rules (tools/explain_audit.py), codified over the
    ENTIRE registry as built plans: no query may plan a CartesianProduct,
    and Python-eval nodes may appear only in the documented
    Arrow-batched operators. A new query that violates either fails here
    before any driver round sees it."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import __spark_entry__ as entry
    from explain_audit import EXPECTED_PYTHON_EVAL, plan_facts

    sf_dir = "/root/testdata/sf0.001"
    from explain_audit import EXPECTED_GLOBAL_WINDOW

    bad_cartesian, bad_python, bad_window = [], [], []
    for name, fn in entry.queries().items():
        plan = _plan(spark, fn(spark, sf_dir))
        facts = plan_facts(plan)
        if facts["joins"].get("CartesianProduct"):
            bad_cartesian.append(name)
        if facts["python_eval"] and name not in EXPECTED_PYTHON_EVAL:
            bad_python.append(name)
        # round-10 rule: an UNPARTITIONED window (single-task funnel)
        # requires an allowlist entry naming its input bound
        if facts.get("global_window") and name not in EXPECTED_GLOBAL_WINDOW:
            bad_window.append(name)
    assert bad_cartesian == [], bad_cartesian
    assert bad_python == [], bad_python
    assert bad_window == [], bad_window


def test_float_rounded_queries_stable_across_reruns(spark):
    """Determinism insurance for the source-Gini flake class: every
    query whose oracle SQL ROUNDs a SUM/AVG (the shape where Spark's
    partial-aggregation merge order can flip a stored decimal) is run
    twice and must produce identical values. tools/determinism_sweep.py
    is the full-registry, higher-rep version; this keeps the guard in
    the default test run."""
    import re

    import __spark_entry__ as entry

    def canon(rows):
        out = []
        for r in rows:
            d = r.asDict(recursive=True)
            out.append(tuple((k, repr(d[k])) for k in sorted(d)))
        return sorted(out)

    sf_dir = "/root/testdata/sf0.001"
    qs = entry.queries()
    risky = [
        n
        for n, sql in entry.oracle_sql().items()
        if re.search(r"ROUND\(\s*-?\s*(SUM|AVG)\(", sql)
    ]
    assert len(risky) >= 10  # the guard covers a real population
    unstable = []
    for name in risky:
        a = canon(qs[name](spark, sf_dir).collect())
        b = canon(qs[name](spark, sf_dir).collect())
        if a != b:
            unstable.append(name)
    assert unstable == [], unstable

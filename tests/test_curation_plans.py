"""Physical-plan properties of the round-4 curation queries (SCALE.md
"Round-4 curation operators"), plus the S7 env/config source check."""

from __future__ import annotations

import os

from clashroyale_datapipeline_agent_spark.plans import curation_queries as CQ
from clashroyale_datapipeline_agent_spark.session import get_spark


def _plan(spark, df) -> str:
    return spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_semantic_dedup_pair_join_is_equi_join(spark, sf_dir):
    """The SemDeDup pair join must key on the cluster id — an equi-join,
    never a nested-loop/cartesian all-pairs — and stay UDF-free."""
    plan = _plan(spark, CQ.semantic_dedup_cluster_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_coverage_has_no_pair_join(spark, sf_dir):
    """Span coverage is a document-frequency re-agg: exactly one
    (hash-key) join back to the gram table, no doc×doc join, no UDF."""
    plan = _plan(spark, CQ.docs_ngram_coverage_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # top-k rides a total order, not a global sort + collect
    assert "TakeOrderedAndProject" in plan


def test_perplexity_buckets_broadcasts_boundaries(spark, sf_dir):
    """Tercile boundaries join back as a broadcast 1-row aggregate; the
    bucket assignment must not shuffle the scored table again."""
    plan = _plan(spark, CQ.docs_perplexity_buckets(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_plan_is_aggregate_only(spark, sf_dir):
    """Everything after the per-source aggregate touches sources² rows;
    the totals join is a broadcast of a 1-row aggregate."""
    plan = _plan(spark, CQ.docs_mixture_plan(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_s7_env_config_source(spark):
    """S7 — the session IS the env/config source: get_spark is
    idempotent (getOrCreate) and the scale-relevant confs from
    session.py survive into the live session."""
    again = get_spark("s7-reuse")
    assert again is spark  # same JVM session, not a second context
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.parquet.filterPushdown") == "true"
    assert int(conf.get("spark.sql.files.maxPartitionBytes")) == 128 * 1024 * 1024
    # shuffle partitions honor $SPARK_GRAFT_CPUS (default 32)
    expect = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    assert int(conf.get("spark.sql.shuffle.partitions")) == expect


def test_ann_recall_probe_set_broadcasts(spark, sf_dir):
    """The brute-force ground truth is a BOUNDED 16-query fan-out: the
    probe set must broadcast (nested-loop against it is the documented
    small-side-only baseline), and the bucket-count join must broadcast
    too — no shuffle keyed on the corpus."""
    plan = _plan(spark, CQ.ann_signlsh_recall(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 16-row probe side
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

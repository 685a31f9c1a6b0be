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
    session.py survive into the live session.

    The reuse call passes the session's CURRENT shuffle-partition count
    back in: getOrCreate applies builder configs to an existing
    session's runtime conf, so a bare ``get_spark()`` here would
    silently flip the shared test session from the conftest's 8
    partitions to the 32 default MID-SUITE — every later test would
    then run under different partial-aggregation partitioning than it
    does in isolation (a flake vector, not a hypothetical)."""
    before = int(spark.conf.get("spark.sql.shuffle.partitions"))
    again = get_spark("s7-reuse", shuffle_partitions=before)
    assert again is spark  # same JVM session, not a second context
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.parquet.filterPushdown") == "true"
    assert int(conf.get("spark.sql.files.maxPartitionBytes")) == 128 * 1024 * 1024
    # the reuse call left the live session's partitioning untouched
    assert int(conf.get("spark.sql.shuffle.partitions")) == before


def test_ann_recall_probe_set_broadcasts(spark, sf_dir):
    """The brute-force ground truth is a BOUNDED 16-query fan-out: the
    probe set must broadcast (nested-loop against it is the documented
    small-side-only baseline), and the bucket-count join must broadcast
    too — no shuffle keyed on the corpus."""
    plan = _plan(spark, CQ.ann_signlsh_recall(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 16-row probe side
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_substring_coverage_known_span(spark, tmp_path):
    """Exactness of the merged-interval math: two docs share one exact
    60-char substring and nothing else, so with L=40 each doc has 21
    duplicated window positions (60-40+1) that must merge to EXACTLY 60
    covered chars — overcounting (21*40) or undercounting (40) would
    both show. A third doc with no 40-char overlap reports no row."""
    import string

    shared = (string.ascii_lowercase + string.digits)[:30] * 2  # 60 chars
    assert len(shared) == 60
    pre = "".join(chr(ord("A") + (i * 7) % 26) for i in range(50))
    post = "".join(chr(ord("a") + (i * 11) % 26) for i in range(50))
    rows = [
        (1, pre + shared + post, "en", "syn", 160),
        (2, "x" * 0 + shared + "QQ" + pre[::-1], "en", "syn", 112),
        (3, "entirely different text with no forty char overlap at all",
         "en", "syn", 57),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r
        for r in CQ.docs_exact_substring_coverage(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["dup_chars"] == 60 and got[2]["dup_chars"] == 60
    assert got[1]["n_chars"] == 160
    assert abs(got[1]["dup_frac"] - round(60 / 160, 4)) < 1e-9


def test_exact_substring_coverage_no_pair_join(spark, sf_dir):
    """Duplicate detection is a groupBy count + semi-join on the window
    hash — never a postings self-join (doc x doc) and never a UDF."""
    plan = _plan(spark, CQ.docs_exact_substring_coverage(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan


def test_shard_plan_partitions_corpus(spark, sf_dir):
    """Shards partition the corpus exactly: per source the shard ids are
    contiguous from 0, token/doc totals across shards equal the source
    totals, and every shard but the last starts because the previous one
    reached its boundary (its start offset = cumulative tokens before it
    >= shard * target)."""
    from pyspark.sql import functions as F2

    from clashroyale_datapipeline_agent_spark.operators.text import tokens_col
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
    )

    target = 512
    rows = CQ.docs_shard_plan(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    d = load_star_table(spark, sf_dir, "documents")
    want = {
        r["source"]: (r["n"], r["tok"])
        for r in d.groupBy("source")
        .agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum(
                F2.size(tokens_col(F2.lower(F2.trim(F2.col("text")))))
            ).alias("tok"),
        )
        .collect()
    }
    assert set(per_source) == set(want)
    for src, shards in per_source.items():
        ids = [s["shard"] for s in shards]
        assert ids == list(range(len(ids)))  # contiguous from 0
        assert sum(s["n_docs"] for s in shards) == want[src][0]
        assert sum(s["n_tokens"] for s in shards) == want[src][1]
        # shard k>0 exists only because tokens before it crossed k*target
        cum = 0
        for s in shards:
            if s["shard"] > 0:
                assert cum >= s["shard"] * target
            cum += s["n_tokens"]


def test_md5_hash_fn_seam_changes_family_only():
    """minhash_signature(hash_fn=md5_salted_hash) swaps the hash family
    while keeping the componentwise-min semantics: each component equals
    the min of md5(shingle || '#seed') over the shingle set."""
    import hashlib

    from pyspark.sql import functions as F2

    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        md5_salted_hash,
        minhash_signature,
        shingles_col,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = df.select(
        minhash_signature(
            shingles_col(F2.col("text"), 3), 4, hash_fn=md5_salted_hash
        ).alias("sig")
    ).collect()[0]
    words = text.split()
    shingles = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
    for seed, got in enumerate(row["sig"]):
        want = min(
            hashlib.md5(f"{s}#{seed}".encode()).hexdigest() for s in shingles
        )
        assert got == want


def test_neardup_pipeline_composition_invariants(spark):
    """The composed near-dup curation report: keep counts are nested
    (raw >= exact-kept >= near-kept), the near-dup leg removes something
    the exact leg could not, and mixture targets respect the 0.5 budget."""
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        curation_neardup_pipeline_report,
        curation_pipeline_report,
    )

    sf = "/root/testdata/sf0.01"
    rows = curation_neardup_pipeline_report(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["n_raw_docs"] >= r["n_exact_kept"] >= r["n_near_kept"] > 0
    assert sum(r["n_exact_kept"] for r in rows) > sum(
        r["n_near_kept"] for r in rows
    ), "near-dup leg removed nothing — LSH stage is dead"
    # exact-dedup stage agrees with the exact-only flagship lineage
    exact_only = {
        r["source"]: r["n_kept_docs"]
        for r in curation_pipeline_report(spark, sf).collect()
    }
    assert {r["source"]: r["n_exact_kept"] for r in rows} == exact_only
    total_tokens = sum(r["n_tokens"] for r in rows)
    total_target = sum(r["target_tokens"] for r in rows)
    assert total_target <= 0.5 * total_tokens

"""Recall floors for the approximate similarity paths (VERDICT r1 items 8-9).

Every approximate operator is pinned against the exact brute-force answer on
the deterministic sf0.001 embeddings fixture (500 random-gaussian vectors,
dim 64 — the WORST case for angular LSH: no cluster structure, so these
floors are conservative lower bounds; real embedding corpora cluster and
recall rises). All seeds are fixed, so the measured recalls are exact
reproducible numbers; the floors sit below them with margin.

Measured on the fixture (2026-08-13):
  bucketed_pairwise_topk  n_planes=3 multi_probe  recall@5  = 0.58
  lsh_topk                n_planes=2              recall@10 = 0.20
  ivf_topk                n_probe=2/8             recall@10 = 0.80
  ivf_topk                n_probe=4/8             recall@10 = 1.00
  cosine_near_dup_pairs   thr=0.30 planes=2/3/4   recall    = 0.85 / 0.61 / 0.48
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators import similarity as S
from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_star_table(spark, sf_dir, "embeddings").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]


@pytest.fixture(scope="module")
def exact_top10(emb, qvec):
    return [
        r["vec_id"]
        for r in S.brute_force_topk(emb, qvec, k=11, exclude_id=0).collect()
    ][:10]


def _recall(got: list[int], exact: list[int]) -> float:
    return len(set(got) & set(exact)) / len(exact)


def test_lsh_topk_recall_floor(emb, qvec, exact_top10):
    got = [
        r["vec_id"]
        for r in S.lsh_topk(emb, qvec, k=50, n_planes=2).collect()
        if r["vec_id"] != 0
    ][:10]
    assert _recall(got, exact_top10) >= 0.15


def test_ivf_topk_recall_floor(emb, qvec, exact_top10):
    indexed, cents = S.ivf_index(emb, n_centroids=8)
    indexed = indexed.cache()
    recalls = {}
    for probe in (2, 4):
        got = [
            r["vec_id"]
            for r in S.ivf_topk(indexed, cents, qvec, k=11, n_probe=probe).collect()
            if r["vec_id"] != 0
        ][:10]
        recalls[probe] = _recall(got, exact_top10)
    assert recalls[2] >= 0.7
    assert recalls[4] >= 0.9
    # the n_probe knob must not trade recall the wrong way
    assert recalls[4] >= recalls[2]


def _pairwise_recall(result_rows, exact: dict[int, set[int]], k: int) -> float:
    got: dict[int, list[int]] = {}
    for r in result_rows:
        if r["vec_id"] != r["query_id"]:
            got.setdefault(r["query_id"], []).append(r["vec_id"])
    hit = sum(len(set(got.get(q, [])[:k]) & exact[q]) for q in exact)
    return hit / (k * len(exact))


def test_bucketed_pairwise_topk_recall_and_plan(emb):
    """The big-query-set batch-ANN path: equi-join on LSH bucket (no
    crossJoin anywhere in the plan), recall@5 >= 0.5 vs the exact
    broadcast pairwise join, and multi-probe never hurts."""
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact: dict[int, list[int]] = {}
    for r in S.pairwise_topk_join(emb, queries, k=6).collect():
        if r["vec_id"] != r["query_id"]:
            exact.setdefault(r["query_id"], []).append(r["vec_id"])
    exact_top5 = {q: set(v[:5]) for q, v in exact.items()}

    approx = S.bucketed_pairwise_topk(
        emb, queries, k=6, n_planes=3, multi_probe=True
    )
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    rec_mp = _pairwise_recall(approx.collect(), exact_top5, 5)
    assert rec_mp >= 0.5

    single = S.bucketed_pairwise_topk(
        emb, queries, k=6, n_planes=3, multi_probe=False
    )
    rec_single = _pairwise_recall(single.collect(), exact_top5, 5)
    assert rec_mp >= rec_single
    # per-query cap honored
    per_q = (
        S.bucketed_pairwise_topk(emb, queries, k=3, n_planes=3)
        .groupBy("query_id")
        .count()
        .collect()
    )
    assert per_q and all(r["count"] <= 3 for r in per_q)


def test_cosine_near_dup_recall_vs_exact(emb):
    """The LSH-bucketed near-dup path recovers a floor fraction of the true
    >= threshold pairs on a keyed slice, every returned pair is genuinely
    above threshold (exact verify — zero false positives), and multi-probe
    recall dominates single-probe."""
    sl = emb.filter(F.col("vec_id") % 4 == 0)
    thr = 0.30
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_all_pairs(sl).filter(F.col("cosine") >= thr).collect()
    }
    assert exact, "fixture must contain pairs above threshold"

    got_rows = S.cosine_near_dup_pairs(sl, threshold=thr, n_planes=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    # exact verify => no false positives, and orientation is id_a < id_b
    assert got <= exact
    assert all(r["id_a"] < r["id_b"] for r in got_rows)
    recall = len(got) / len(exact)
    assert recall >= 0.5, (recall, len(exact))

    single = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_near_dup_pairs(
            sl, threshold=thr, n_planes=3, multi_probe=False
        ).collect()
    }
    assert len(got) >= len(single)


def test_ngram_jaccard_all_pairs_consistent_with_candidate_verify(spark, sf_dir):
    """The exact shingle-join Jaccard agrees with the LSH-candidate verify
    path on every candidate pair (same numbers, from two different plans)."""
    from clashroyale_datapipeline_agent_spark.operators import dedup as D
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    docs = load_star_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    cands = D.lsh_candidate_pairs(docs, bands=16)
    via_verify = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in D.ngram_jaccard_pairs(docs, cands, threshold=0.0).collect()
    }
    all_pairs = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in D.ngram_jaccard_all_pairs(docs).collect()
    }
    for pair, j in via_verify.items():
        if j > 0:
            assert all_pairs.get(pair) == j, pair


def test_kmeans_lloyd_inertia_decreases(spark):
    import pyspark.sql.functions as F

    from clashroyale_datapipeline_agent_spark.operators.similarity import (
        kmeans_lloyd,
        nearest_centroid_col,
    )

    v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def inertia(cents):
        assigned = v.withColumn(
            "_c", nearest_centroid_col(F.col("embedding"), cents)
        )
        # squared distance to the assigned centroid, summed
        total = 0.0
        for ci, c in enumerate(cents):
            arr = F.array(*[F.lit(x) for x in c])
            d = F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    arr,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            row = assigned.filter(F.col("_c") == ci).agg(F.sum(d)).collect()[0]
            total += row[0] or 0.0
        return total

    init = [
        list(r["c"])
        for r in v.orderBy("vec_id")
        .limit(4)
        .select(F.col("embedding").cast("array<double>").alias("c"))
        .collect()
    ]
    _, cents3 = kmeans_lloyd(v, k=4, n_iter=3)
    assert inertia(cents3) < inertia(init)  # Lloyd monotonicity held


def test_ivf_recall_monotone_in_nprobe(spark):
    """ann_ivf_recall_sweep: per query, recall@10 and candidate volume
    are non-decreasing in n_probe (probing more clusters can only add
    candidates), hits stay within [0, 10], and the probe grid is the
    full 16-query x {1,2,4} grid."""
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        ann_ivf_recall_sweep,
    )

    rows = ann_ivf_recall_sweep(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 16 * 3
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["hits"] <= 10
        assert r["recall"] == round(r["hits"] / 10.0, 4)
        by_q.setdefault(r["vec_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["n_probe"])
        assert [r["n_probe"] for r in rs] == [1, 2, 4]
        for a, b in zip(rs, rs[1:]):
            assert a["hits"] <= b["hits"], f"recall not monotone for q={q}"
            assert a["n_candidates"] <= b["n_candidates"]
        assert rs[0]["n_candidates"] >= 0

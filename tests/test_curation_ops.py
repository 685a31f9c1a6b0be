"""Round-4 curation operators: semantic dedup, filter funnel, n-gram
span coverage, mixture planning. Cross-engine value checks live in the
DuckDB oracle rows (``plans/curation_queries.py``); these pin the
operator SEMANTICS on hand-built fixtures with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.dedup import ngram_coverage
from clashroyale_datapipeline_agent_spark.operators.sampling import (
    plan_source_mixture,
)
from clashroyale_datapipeline_agent_spark.operators.similarity import (
    semantic_dedup_prune,
)
from clashroyale_datapipeline_agent_spark.operators.text import filter_funnel


# ---------------------------------------------------------------------------
# semantic_dedup_prune
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    # Two well-separated clusters on the axes; ids 10/11/12 are an exact
    # triplicate near e_x, id 13 is a distinct e_x-cluster member, ids
    # 20/21 duplicate each other near e_y.
    rows = [
        (10, [1.0, 0.0]),
        (11, [1.0, 0.0]),
        (12, [1.0, 0.0]),
        (13, [0.9, -0.45]),
        (20, [0.0, 1.0]),
        (21, [0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_prunes_later_ids_only(vectors):
    out = {
        r["vec_id"]: (r["cluster"], r["pruned"])
        for r in semantic_dedup_prune(
            vectors, [[1.0, 0.0], [0.0, 1.0]], threshold=0.95
        ).collect()
    }
    assert len(out) == 6  # one row per input vector
    # exact-dup sets keep their LOWEST id
    assert out[10][1] is False and out[11][1] is True and out[12][1] is True
    assert out[20][1] is False and out[21][1] is True
    # a same-cluster member below the threshold survives
    assert out[13] == (0, False)
    # cluster assignment is the argmin centroid
    assert {out[i][0] for i in (10, 11, 12, 13)} == {0}
    assert {out[i][0] for i in (20, 21)} == {1}


def test_semantic_dedup_is_cluster_blind_across_clusters(spark):
    # Near-identical vectors that land in DIFFERENT clusters are never
    # compared — the documented SemDeDup blind spot (recall is traded
    # for the bounded within-cluster pair join).
    rows = [(1, [1.0, 0.05]), (2, [1.0, -0.05])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["pruned"]
        for r in semantic_dedup_prune(
            v, [[1.0, 0.06], [1.0, -0.06]], threshold=0.9
        ).collect()
    }
    assert out == {1: False, 2: False}


# ---------------------------------------------------------------------------
# filter_funnel
# ---------------------------------------------------------------------------


def test_filter_funnel_sequential_semantics(spark):
    df = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, True), (4, False, False)],
        "id long, p1 boolean, p2 boolean",
    )
    rows = {
        r["stage"]: r
        for r in filter_funnel(
            df, [("one", F.col("p1")), ("two", F.col("p2"))]
        ).collect()
    }
    assert rows["one"]["n_in"] == 4 and rows["one"]["n_out"] == 2
    # stage two's n_in chains from stage one's survivors; row 3 passes
    # p2 but already died at p1, so it must NOT count.
    assert rows["two"]["n_in"] == 2 and rows["two"]["n_out"] == 1
    assert [rows[s]["stage_idx"] for s in ("one", "two")] == [1, 2]


def test_filter_funnel_single_scan_plan(spark):
    df = spark.createDataFrame([(1, True)], "id long, p1 boolean")
    plan = filter_funnel(df, [("only", F.col("p1"))])._jdf.queryExecution().executedPlan().toString()
    # one aggregation over one scan — no join, no second scan
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# ngram_coverage
# ---------------------------------------------------------------------------


def test_ngram_coverage_counts_shared_spans(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),  # 3-grams: abc bcd cde
            (2, "x y a b c"),  # 3-grams: xya yab abc  -> shares abc
            (3, "p q"),  # shorter than n: no rows
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_coverage(docs, n=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 3 and out[1]["n_shared"] == 1
    assert out[2]["n_grams"] == 3 and out[2]["n_shared"] == 1
    assert abs(out[1]["coverage"] - 0.3333) < 1e-9


def test_ngram_coverage_repeated_span_within_one_doc_not_shared(spark):
    # A doc repeating its own n-gram is NOT "shared" — coverage measures
    # cross-document duplication only.
    docs = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    [row] = ngram_coverage(docs, n=3).collect()
    assert row["n_shared"] == 0


# ---------------------------------------------------------------------------
# plan_source_mixture
# ---------------------------------------------------------------------------


def test_mixture_plan_budget_and_epochs(spark):
    per = spark.createDataFrame(
        [("big", 900), ("small", 100)], "source string, n_tokens long"
    )
    # equal weights, half-corpus budget (500) -> 250 tokens per source:
    # 'big' samples down (epochs < 1), 'small' must repeat 2.5x.
    out = {
        r["source"]: r
        for r in plan_source_mixture(
            per, F.lit(1.0), budget_frac=0.5
        ).collect()
    }
    assert out["big"]["target_tokens"] == 250
    assert out["small"]["target_tokens"] == 250
    assert abs(out["big"]["epochs"] - 0.2778) < 1e-9
    assert abs(out["small"]["epochs"] - 2.5) < 1e-9
    # planned yield caps at one epoch
    assert out["big"]["planned_tokens"] == 250
    assert out["small"]["planned_tokens"] == 100
    assert abs(out["big"]["weight"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# S1 leaderboard fetch (sources/fetch.py)
# ---------------------------------------------------------------------------


def test_fetch_leaderboard_unwraps_and_normalizes(spark):
    from clashroyale_datapipeline_agent_spark.sources.fetch import (
        fetch_leaderboard,
        leaderboard_path,
    )

    seen: list[str] = []

    def transport(path):
        seen.append(path)
        return {
            "items": [
                {"rank": 1, "tag": "abc", "name": "A", "trophies": 9000},
                {"rank": 2, "tag": "#DEF", "name": "B", "trophies": 8500},
            ]
        }

    out = fetch_leaderboard(spark, transport, limit=2).collect()
    assert seen == [leaderboard_path(limit=2)]
    assert [r["tag"] for r in out] == ["#ABC", "#DEF"]  # normalized
    assert out[0]["rank"] == 1 and out[1]["trophies"] == 8500


def test_fetch_leaderboard_empty_response_is_empty_df(spark):
    from clashroyale_datapipeline_agent_spark.sources.fetch import fetch_leaderboard

    out = fetch_leaderboard(spark, lambda p: {}, limit=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "rank",
        "tag",
        "name",
        "trophies",
    ]

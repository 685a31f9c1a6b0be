"""Invariant tests for the round-3 session additions: winnowing,
PageRank, deterministic HLL, BoW cosine pairs, table profiling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clashroyale_datapipeline_agent_spark.operators.dedup import winnow_fingerprints
from clashroyale_datapipeline_agent_spark.operators.graph import pagerank
from clashroyale_datapipeline_agent_spark.operators.profile import profile_table
from clashroyale_datapipeline_agent_spark.operators.sketches import hll_estimate
from clashroyale_datapipeline_agent_spark.operators.text import cosine_pairs

K, W = 8, 6


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestWinnowing:
    def test_guarantee_shared_substring_surfaces(self, spark):
        # Winnowing guarantee: a shared substring of length >= k + w - 1
        # produces at least one shared fingerprint, wherever it sits.
        core = "abcdefghijklm"  # exactly k + w - 1 = 13 chars
        docs = _docs(
            spark,
            [(1, "XXXX" + core + "YYYYYYYY"), (2, "ZZZZZZZZZZZZ" + core)],
        )
        fps = winnow_fingerprints(docs, k=K, w=W)
        a = {r.fp for r in fps.filter(F.col("id") == 1).collect()}
        b = {r.fp for r in fps.filter(F.col("id") == 2).collect()}
        assert a & b, "13-char shared substring must share a fingerprint"

    def test_disjoint_alphabets_share_nothing(self, spark):
        docs = _docs(spark, [(1, "aaaabbbbccccdddd"), (2, "qqqqrrrrsssstttt")])
        fps = winnow_fingerprints(docs, k=K, w=W)
        a = {r.fp for r in fps.filter(F.col("id") == 1).collect()}
        b = {r.fp for r in fps.filter(F.col("id") == 2).collect()}
        assert not (a & b)

    def test_short_doc_yields_no_rows(self, spark):
        docs = _docs(spark, [(1, "tiny")])
        assert winnow_fingerprints(docs, k=K, w=W).count() == 0

    def test_fingerprints_are_gram_hashes(self, spark):
        # Every fingerprint of a doc must be the md5 of one of its
        # actual k-grams (window-min never invents values).
        text = "the quick brown fox jumps"
        docs = _docs(spark, [(1, text)])
        fps = {r.fp for r in winnow_fingerprints(docs, k=K, w=W).collect()}
        import hashlib

        grams = {
            hashlib.md5(text[i : i + K].encode()).hexdigest()
            for i in range(len(text) - K + 1)
        }
        assert fps <= grams and fps


class TestPageRank:
    def test_rank_mass_conserved_on_regular_graph(self, spark):
        # Undirected 4-cycle: symmetric, so every node keeps rank 1.0
        # exactly (each round: 0.15 + 0.85 * (2 * (1/2)) = 1.0).
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], ["src", "dst"]
        )
        ranks = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
        assert ranks == {1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0}

    def test_hub_outranks_leaves(self, spark):
        # Star graph: hub 0 linked to leaves 1..5 (both directions).
        pairs = [(0, i) for i in range(1, 6)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs], ["src", "dst"]
        )
        ranks = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
        assert ranks[0] > max(ranks[i] for i in range(1, 6))
        # total rank mass stays ~n for a graph with no dangling nodes
        assert math.isclose(sum(ranks.values()), 6.0, rel_tol=1e-9)


class TestHll:
    def test_estimate_within_hll_error_bound(self, spark):
        n = 5000
        df = spark.range(n).select(
            F.lit("g").alias("grp"), F.col("id").alias("v")
        )
        row = hll_estimate(df, "grp", "v").collect()[0]
        # m=256 → standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma.
        assert abs(row.hll_estimate - n) / n < 0.26
        assert row.n_buckets_used <= 256

    def test_duplicates_do_not_move_the_sketch(self, spark):
        base = spark.range(1000).select(
            F.lit("g").alias("grp"), F.col("id").alias("v")
        )
        doubled = base.unionAll(base)
        a = hll_estimate(base, "grp", "v").collect()[0]
        b = hll_estimate(doubled, "grp", "v").collect()[0]
        assert a.reg_sum == b.reg_sum and a.hll_estimate == b.hll_estimate


class TestCosinePairs:
    def test_exact_cosine_on_known_vectors(self, spark):
        # doc1: a a b ; doc2: a b b  → tf vectors (2,1) and (1,2) over
        # {a, b}; cosine = (2+2) / (sqrt(5)*sqrt(5)) = 0.8
        docs = _docs(spark, [(1, "a a b"), (2, "a b b")])
        rows = cosine_pairs(docs, max_df=10, min_df=2).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.id_a, r.id_b, r.dot) == (1, 2, 4)
        assert math.isclose(r.cosine, 0.8, rel_tol=1e-12)

    def test_df_ceiling_prunes_common_terms(self, spark):
        # 'the' appears in all 3 docs; with max_df=2 only 'rare' pairs.
        docs = _docs(
            spark, [(1, "the rare"), (2, "the rare"), (3, "the other")]
        )
        rows = cosine_pairs(docs, max_df=2, min_df=2).collect()
        assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


class TestProfile:
    def test_profile_counts_and_ranges(self, spark):
        schema = StructType(
            [
                StructField("s", StringType()),
                StructField("x", DoubleType()),
                StructField("k", LongType()),
            ]
        )
        df = spark.createDataFrame(
            [("b", 1.5, 10), (None, 2.5, 10), ("a", None, 30)], schema
        )
        prof = {r.column: r for r in profile_table(df).collect()}
        assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
        assert prof["s"].min_str == "a" and prof["s"].max_str == "b"
        assert prof["s"].min_num is None
        assert prof["x"].n_nulls == 1
        assert prof["x"].min_num == 1.5 and prof["x"].max_num == 2.5
        assert prof["k"].n_distinct == 2 and prof["k"].max_num == 30.0
        assert prof["k"].min_str is None
        assert all(r.n_rows == 3 for r in prof.values())

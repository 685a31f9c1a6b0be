"""connected_components semantics (operators/graph.py)."""

from __future__ import annotations

import pytest

from clashroyale_datapipeline_agent_spark.operators.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"] for r in connected_components(df, **kw).collect()
    }


def test_chain_triangle_and_pair(spark):
    # chain 0-1-...-9 (diameter forces multiple propagation rounds),
    # triangle 20-21-22, isolated pair 30-31
    edges = [(i, i + 1) for i in range(9)]
    edges += [(20, 21), (21, 22), (20, 22), (30, 31)]
    got = _components(spark, edges)
    assert {got[i] for i in range(10)} == {0}
    assert got[20] == got[21] == got[22] == 20
    assert got[30] == got[31] == 30


def test_transitive_closure_beyond_greedy_pairs(spark):
    # A~B and B~C but A,C never paired: one cluster, labeled by min id
    got = _components(spark, [(5, 9), (9, 2)])
    assert got == {2: 2, 5: 2, 9: 2}


def test_nonconvergence_raises(spark):
    # the first two rounds are plain one-hop hash-min, so a 30-chain
    # cannot converge in max_iter=2 regardless of the path-compression
    # rounds that would follow
    with pytest.raises(RuntimeError):
        _components(spark, [(i, i + 1) for i in range(30)], max_iter=2)


def test_long_chain_converges_in_log_rounds(spark):
    # 200-node chain: plain hash-min needs ~200 rounds; the escalated
    # two-hop + pointer-jump rounds cover exponentially growing distance
    # (d -> 2d + 4), so the default max_iter=20 must suffice and every
    # node must land on the chain minimum
    got = _components(spark, [(i, i + 1) for i in range(199)])
    assert got == {i: 0 for i in range(200)}


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.operators.graph import (
        leakage_safe_split,
    )

    docs = spark.range(0, 2_000).select(F.col("id").alias("doc_id"))
    # chains of 3 at every multiple of 10: {10k, 10k+1, 10k+2}
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 2_000, 10)]
        + [(i + 1, i + 2) for i in range(0, 2_000, 10)],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(docs, edges).cache()
    rows = out.collect()
    assert len(rows) == 2_000
    # every cluster is entirely inside one split — no train/test leakage
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_cluster.values())
    # chained docs share their chain-min cluster
    by_id = {r["doc_id"]: r for r in rows}
    for i in range(0, 2_000, 10):
        assert by_id[i]["cluster"] == by_id[i + 1]["cluster"] == by_id[i + 2]["cluster"] == i
        assert by_id[i]["split"] == by_id[i + 1]["split"] == by_id[i + 2]["split"]
    # all three splits are populated at this size
    assert {r["split"] for r in rows} == {"train", "val", "test"}


def test_pagerank_includes_sink_only_nodes(spark):
    # Directed star into a sink: a -> c, b -> c. Node c has no out-edges
    # but must appear with outdeg 0 and collect mass: after round 1,
    # rank(c) = 0.15 + 0.85 * (1/1 + 1/1) = 1.85; a and b (no in-edges)
    # sit at the 0.15 floor. Simplified form: dangling mass absorbed.
    from clashroyale_datapipeline_agent_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    out = {r.node: r for r in pagerank(edges, iterations=1).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["c"].outdeg == 0
    assert abs(out["c"].rank - 1.85) < 1e-9
    assert abs(out["a"].rank - 0.15) < 1e-9
    assert abs(out["b"].rank - 0.15) < 1e-9


def test_pagerank_mass_conserved_without_sinks(spark):
    # On a sink-free graph (a 3-cycle) the simplified form conserves
    # total mass: sum(rank) == n at every round.
    from clashroyale_datapipeline_agent_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    rows = pagerank(edges, iterations=4).collect()
    assert abs(sum(r.rank for r in rows) - 3.0) < 1e-9


def test_triangle_counts_hand_fixture(spark):
    """One triangle {1,2,3} plus a tail 3-4-5; duplicates, reversed
    edges, and a self-loop must normalize away; K4 on {10..13} gives 4
    triangles with every node in 3."""
    from clashroyale_datapipeline_agent_spark.operators.graph import (
        triangle_counts,
    )

    edges = [(1, 2), (2, 3), (1, 3), (2, 1), (3, 1), (3, 4), (4, 5), (4, 4)]
    k4 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(edges + k4, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3, 13: 3}


def test_kcore_peel_hand_graph(spark):
    """K4 plus a pendant path: the 2-core strips the path, the K4
    survives 3-core peeling intact; fixpoint mode stabilizes."""
    from clashroyale_datapipeline_agent_spark.operators.graph import kcore_peel

    # K4 on 0-3, path 3-10-11 (degrees 1-2), duplicate + reversed noise
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 10), (10, 11), (11, 10), (10, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    trail = kcore_peel(df, 3)
    core_nodes, core_edges = trail[-1]
    assert {r.node for r in core_nodes.collect()} == {0, 1, 2, 3}
    assert core_edges.count() == 6  # K4 edge count, dedup'd and normalized

    # k=2: the path's pendant tip (11) peels first, then 10
    trail2 = kcore_peel(df, 2)
    assert {r.node for r in trail2[-1][0].collect()} == {0, 1, 2, 3}

    # fixed rounds: exactly that many trail entries, converged or not
    assert len(kcore_peel(df, 3, rounds=2)) == 2


def test_kcore_query_monotone(spark):
    from clashroyale_datapipeline_agent_spark.plans.estimator_queries import (
        graph_kcore_peel_rounds,
    )
    from tests.conftest import SF_DIR

    rows = graph_kcore_peel_rounds(spark, SF_DIR).collect()
    assert [r.round for r in rows] == [1, 2, 3]
    # peeling never grows the graph
    assert rows[0].n_nodes >= rows[1].n_nodes >= rows[2].n_nodes
    assert rows[0].n_edges >= rows[1].n_edges >= rows[2].n_edges


def _persisted_rdd_ids(spark) -> set[int]:
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_cc_releases_superseded_round_checkpoints(spark):
    # A 60-node chain needs ~6 rounds (2 one-hop + escalated); each
    # round creates one localCheckpoint. Superseded rounds must be
    # unpersisted as the loop advances (guide §5) — the persisted-RDD
    # census may grow only by O(1) (sym + the final round's labels),
    # never by O(rounds).
    before = _persisted_rdd_ids(spark)
    got = _components(spark, [(i, i + 1) for i in range(59)])
    assert got == {i: 0 for i in range(60)}
    leaked = _persisted_rdd_ids(spark) - before
    assert len(leaked) <= 3, f"cc leaked {len(leaked)} persisted RDDs"


def test_pagerank_releases_superseded_checkpoints(spark):
    from clashroyale_datapipeline_agent_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    before = _persisted_rdd_ids(spark)
    # 12 rounds / checkpoint_every=2 -> 5 mid-loop checkpoints; only
    # the newest may stay persisted (plus the e/ed edge materializations)
    rows = pagerank(edges, iterations=12, checkpoint_every=2).collect()
    assert abs(sum(r.rank for r in rows) - 3.0) < 1e-9
    leaked = _persisted_rdd_ids(spark) - before
    assert len(leaked) <= 3, f"pagerank leaked {len(leaked)} persisted RDDs"

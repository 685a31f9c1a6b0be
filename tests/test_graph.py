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
    with pytest.raises(RuntimeError):
        _components(spark, [(i, i + 1) for i in range(30)], max_iter=2)


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

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

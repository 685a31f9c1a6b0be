"""Sequence-packing invariants (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.packing import pack_sequences


def _docs(spark):
    # token counts 1..40 over 500 docs, deterministic
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 40 + 1).alias("n_tokens")
    )


def test_pack_invariants(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, budget=64, num_partitions=8).cache()
    rows = packed.collect()

    # every doc exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(500))
    # pack_tokens is the true sum of its members, and within budget
    # (no doc here exceeds the budget, so no singleton overflow packs)
    by_pack: dict[str, list] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        fill = members[0]["pack_tokens"]
        assert all(m["pack_tokens"] == fill for m in members)
        assert sum(m["n_tokens"] for m in members) == fill
        assert fill <= 64, pid
    # greedy fill is reasonably tight: mean fill above half budget
    fills = [m[0]["pack_tokens"] for m in by_pack.values()]
    assert sum(fills) / len(fills) > 32

    # deterministic for a fixed partition count
    again = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(docs, budget=64, num_partitions=8).collect()
    )
    assert again == sorted((r["doc_id"], r["pack_id"]) for r in rows)


def test_pack_oversized_doc_gets_singleton(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 999), (3, 10)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(docs, budget=64, num_partitions=1).collect()
    packs = {r["doc_id"]: r["pack_id"] for r in rows}
    assert packs[2] not in {packs[1], packs[3]}
    big = [r for r in rows if r["doc_id"] == 2][0]
    assert big["pack_tokens"] == 999


def test_pack_grouped_deterministic_and_partition_independent(spark):
    from clashroyale_datapipeline_agent_spark.operators.packing import (
        pack_sequences_grouped,
    )
    import pyspark.sql.functions as F

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 50 + 1).alias("n_tokens"),
        (F.col("id") % 4).alias("grp"),
    )
    base = sorted(
        (r["doc_id"], r["pack_id"], r["pack_tokens"])
        for r in pack_sequences_grouped(docs, budget=64).collect()
    )
    # every doc exactly once
    assert len(base) == 200 and len({d for d, _, _ in base}) == 200
    # layout is a pure function of the data: unchanged under repartition
    again = sorted(
        (r["doc_id"], r["pack_id"], r["pack_tokens"])
        for r in pack_sequences_grouped(docs.repartition(13), budget=64).collect()
    )
    assert again == base
    # fills respect the budget (token counts here never exceed it)
    assert all(t <= 64 for _, _, t in base)

"""Sequence packing — greedy first-fit batching of documents into fixed
token budgets (the training-data step after length bucketing: concat short
docs so padded batches waste little compute).

Packing is inherently sequential (each decision depends on the running
fill), so it cannot be a relational expression: this is one of the few
justified ``mapInPandas`` boundaries in the engine (alongside multimodal
decode and batched LLM classify). The parallel scheme is partition-local
packing: repartition by a deterministic key, sort within partitions, pack
each partition independently. Pack ids are (partition, local index) pairs;
cross-partition packing would serialize the whole dataset for a ~1/2-doc
per-partition tail loss, which is the wrong trade at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each doc to a pack of at most ``budget`` total tokens.

    Greedy first-fit over docs sorted by ``id_col`` within hash
    partitions of ``id_col`` — deterministic for a fixed partition count.
    Docs larger than ``budget`` get a singleton pack (truncation is the
    caller's policy). Returns (id_col, tokens_col, pack_id string,
    pack_tokens = the pack's total AFTER packing completes).
    """
    n = num_partitions or docs.sparkSession.sparkContext.defaultParallelism

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # stream batches; only the OPEN pack's rows are buffered (a pack's
        # total is known only when it closes), so memory is O(pack), not
        # O(partition)
        open_ids: list = []
        open_toks: list[int] = []
        cur_idx, cur_fill = 0, 0

        def close(idx: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    id_col: open_ids,
                    tokens_col: open_toks,
                    "pack_id": [f"{pid}-{idx}"] * len(open_ids),
                    "pack_tokens": [cur_fill] * len(open_ids),
                }
            )

        for b in batches:
            for doc, t in zip(b[id_col].tolist(), b[tokens_col].tolist()):
                t = int(t)
                if cur_fill > 0 and cur_fill + t > budget:
                    yield close(cur_idx)
                    open_ids, open_toks = [], []
                    cur_idx, cur_fill = cur_idx + 1, 0
                open_ids.append(doc)
                open_toks.append(t)
                cur_fill += t
        if open_ids:
            yield close(cur_idx)

    prepared = (
        docs.select(id_col, tokens_col)
        .repartition(n, id_col)
        .sortWithinPartitions(id_col)
    )
    return prepared.mapInPandas(
        pack, f"{id_col} long, {tokens_col} long, pack_id string, pack_tokens long"
    )


def pack_sequences_grouped(
    docs: DataFrame,
    *,
    budget: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_col: str = "grp",
) -> DataFrame:
    """Deterministic packing variant: pack WITHIN explicit groups.

    Same greedy first-fit as :func:`pack_sequences`, but the packing unit
    is a user-supplied group key (e.g. ``doc_id % G``) instead of the
    physical partition, and docs are sorted by ``id_col`` within the
    group — so the layout is a pure function of the DATA, independent of
    partition count or engine. Pack ids are ``"{group}-{idx}"``. This is
    the oracle-checkable form (an engine-independent layout a SQL twin can
    recompute); the partition-local form remains the 100 TB default since
    it avoids the groupBy shuffle when input partitioning already suits.
    Groups must fit in executor memory (``applyInPandas`` materializes one
    group per call) — pick G so corpus/G is batch-sized.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        g = pdf[group_col].iloc[0]
        ids: list = []
        toks: list[int] = []
        pids: list[str] = []
        pack_idx, fill = 0, 0
        for doc, t in zip(pdf[id_col], pdf[tokens_col]):
            t = int(t)
            if fill > 0 and fill + t > budget:
                pack_idx, fill = pack_idx + 1, 0
            ids.append(doc)
            toks.append(t)
            pids.append(f"{g}-{pack_idx}")
            fill += t
        out = pd.DataFrame({id_col: ids, tokens_col: toks, "pack_id": pids})
        out["pack_tokens"] = out.groupby("pack_id")[tokens_col].transform("sum")
        return out

    return docs.groupBy(group_col).applyInPandas(
        pack, f"{id_col} long, {tokens_col} long, pack_id string, pack_tokens long"
    )

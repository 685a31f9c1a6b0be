"""File sinks (SURVEY.md §2.1 S4) — schema-preserving writers.

The reference writes pretty-printed JSON dimension files
(``/root/reference/getcards.py:55-89``, ``update_cardsdata.py:32-57``).
Engine-side equivalents plus the scale-relevant staging writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S4 — JSON lines sink (dimension-maintenance jobs)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Partitioned parquet sink. Partition columns should be low-cardinality
    scan predicates (e.g. date, lang) so partition pruning applies."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink — the shuffle-elimination path for
    repeated joins/windows on the same key (SCALE.md: battle store bucketed
    by player_tag makes per-player top-k and joins shuffle-free)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table, format="parquet")

"""Incremental Phase-0 aggregation via ``foreachBatch`` (SURVEY.md §2.10,
§4.2 U4): replace the reference's recompute-everything-per-loop
(``meta_workflow.py:359-375``) with counter maintenance.

Each micro-batch contributes per-archetype counter DELTAS (a few rows);
the merge reads the previous compact state, sums, and writes a new
version — O(|archetypes|) work per batch regardless of history size. With
Delta/Iceberg the versioning collapses to a MERGE INTO; on plain parquet we
keep an explicit version chain (write-new → marker-commit → repoint; the
marker is the commit point, so a crash at any step either replays the merge
against the old version or completes the repoint — never double-applies).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTER_SCHEMA = "deck_type string, games bigint, wins bigint, losses bigint, draws bigint"


class IncrementalCounterStore:
    """Versioned compact counter table on plain parquet."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _version_file(self) -> Path:
        return self.root / "_VERSION"

    def current_version(self) -> int:
        vf = self._version_file()
        return int(vf.read_text()) if vf.exists() else -1

    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            return self.spark.createDataFrame([], COUNTER_SCHEMA)
        return self.spark.read.schema(COUNTER_SCHEMA).parquet(
            str(self.root / f"v{v}")
        )

    def merge_deltas(self, deltas: DataFrame, batch_id: int) -> None:
        """Sum deltas into the state; idempotent per batch_id.

        The *marker* (recording the target version) is the commit point,
        written BEFORE the ``_VERSION`` repoint. Crash cases on replay:
        data written but no marker → old version still current, the merge
        recomputes and overwrites; marker written but ``_VERSION`` stale →
        the replay completes the repoint and skips the merge. Either way
        deltas apply exactly once.
        """
        applied = self.root / "_applied"
        applied.mkdir(exist_ok=True)
        marker = applied / str(batch_id)
        if marker.exists():
            committed = int(marker.read_text())
            if self.current_version() < committed:
                self._version_file().write_text(str(committed))
            return
        merged = (
            self.read()
            .unionByName(deltas)
            .groupBy("deck_type")
            .agg(
                F.sum("games").cast("bigint").alias("games"),
                F.sum("wins").cast("bigint").alias("wins"),
                F.sum("losses").cast("bigint").alias("losses"),
                F.sum("draws").cast("bigint").alias("draws"),
            )
        )
        nxt = self.current_version() + 1
        merged.write.mode("overwrite").parquet(str(self.root / f"v{nxt}"))
        marker.write_text(str(nxt))
        self._version_file().write_text(str(nxt))


def participant_counter_deltas(battles: DataFrame) -> DataFrame:
    """Per-archetype counter deltas for one (micro-)batch of normalized
    battles — the participant doubling + counter agg, batch-local."""
    from clashroyale_datapipeline_agent_spark.operators.meta import (
        build_participant_table,
    )

    parts = build_participant_table(battles)
    r = F.col("result")
    return parts.groupBy("deck_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("games"),
        F.sum(F.when(r == "win", 1).otherwise(0)).cast("bigint").alias("wins"),
        F.sum(F.when(r == "loss", 1).otherwise(0)).cast("bigint").alias("losses"),
        F.sum(F.when(~r.isin("win", "loss"), 1).otherwise(0)).cast("bigint").alias("draws"),
    )


def start_incremental_meta_counters(
    battles_stream: DataFrame,
    store: IncrementalCounterStore,
    checkpoint: str,
):
    """Attach the incremental maintenance to a normalized-battle stream.

    ``foreachBatch`` gives exactly-once per batch id together with the
    store's idempotence marker. Returns the started query
    (``availableNow`` so tests drain deterministically).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        deltas = participant_counter_deltas(batch_df)
        store.merge_deltas(deltas, batch_id)

    return (
        battles_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

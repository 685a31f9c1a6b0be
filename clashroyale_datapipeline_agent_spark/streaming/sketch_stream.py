"""Streaming sketch maintenance — heavy hitters over an unbounded stream.

Composes the deterministic count-min sketch (`operators/sketches.py`)
with the ``foreachBatch`` exactly-once merge discipline of
`streaming/incremental.py`: each micro-batch contributes its own
counter matrix (≤ DEPTH·WIDTH rows however large the batch), and the
merge SUMS counters into a versioned compact store. CMS state is
sum-mergeable exactly as HLL registers are max-mergeable — which is why
a 100 TB/day stream can keep per-hour sketch partitions and answer
top-k/frequency queries over any window by summing kilobytes, never
replaying events.

Crash semantics are inherited from the marker-commit protocol
(`incremental.py:merge_deltas` — marker written before the version
repoint, so a replayed batch either recomputes against the old version
or completes the repoint; deltas apply exactly once).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.sketches import cms_counters

CMS_STORE_SCHEMA = "row_id int, bucket int, cnt bigint"


class CmsCounterStore:
    """Versioned (row_id, bucket, cnt) sketch store on plain parquet.

    Same write-new → marker-commit → repoint chain as
    ``IncrementalCounterStore``; merge is a SUM per (row_id, bucket) —
    the CMS merge operator.
    """

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
            return self.spark.createDataFrame([], CMS_STORE_SCHEMA)
        return self.spark.read.schema(CMS_STORE_SCHEMA).parquet(
            str(self.root / f"v{v}")
        )

    def merge_deltas(self, deltas: DataFrame, batch_id: int) -> None:
        applied = self.root / "_applied"
        applied.mkdir(exist_ok=True)
        marker = applied / str(batch_id)
        target = self.current_version() + 1
        if marker.exists():
            # batch already merged; at most the repoint is outstanding
            committed = int(marker.read_text())
            if self.current_version() < committed:
                self._version_file().write_text(str(committed))
            return
        merged = (
            self.read()
            .unionByName(deltas)
            .groupBy("row_id", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
        merged.write.mode("overwrite").parquet(str(self.root / f"v{target}"))
        marker.write_text(str(target))
        self._version_file().write_text(str(target))


def start_streaming_cms(
    events: DataFrame,
    store: CmsCounterStore,
    value_col: str,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain a CMS over a stream: per batch, sketch the batch
    (map-side explode + partial agg → ≤ DEPTH·WIDTH delta rows) and
    sum-merge into the store. Heavy-hitter estimates at any moment come
    from ``cms_estimate(store.read(), candidates, ...)`` without
    touching a single historical event."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        deltas = cms_counters(batch_df, value_col).select(
            F.col("row_id").cast("int"),
            F.col("bucket").cast("int"),
            F.col("cnt").cast("bigint"),
        )
        store.merge_deltas(deltas, batch_id)

    writer = events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

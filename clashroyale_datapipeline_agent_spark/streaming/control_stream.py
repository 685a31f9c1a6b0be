"""Streaming EWMA control monitor — the continuous twin of
``plans/control_queries.events_ewma_control_chart``.

The batch query reads the whole history and charts it; this monitor
maintains the day-grain sufficient statistics (d, n, sq) as a
versioned parquet store, folds every micro-batch in (counts and
cent-sums are mergeable, so partial days accumulate correctly across
batches), and logs the chart reading for each batch's newest day. The
readout calls ``control_queries.ewma_readout`` — the SAME epilogue the
batch query runs — so stream and batch readings are equal by
construction once the same data has flowed through.

State is calendar-bounded (one row per day) however long the stream
runs; per-batch work is one partial-agg shuffle to day grain plus a
days-sized epilogue. Replay safety reuses the marker-commit chain of
``incremental.py``/``drift_stream.py``: the marker is written before
the version repoint, so a Structured Streaming replay of a processed
batch never double-merges. The reading log itself is at-least-once
(the append precedes the marker), so ``readings()`` deduplicates by
batch_id — safe because a pre-marker replay recomputes the identical
row from the unchanged store version.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans.control_queries import (
    ewma_readout,
)

#: (d, n, sq) day-grain sufficient statistics
DAY_STORE_SCHEMA = "d date, n bigint, sq bigint"
#: (batch_id, day, n_events, daily_mean, ewma, is_alarm) reading log
CONTROL_LOG_SCHEMA = (
    "batch_id bigint, day date, n_events bigint, daily_mean double,"
    " ewma double, is_alarm boolean"
)


def day_batch_agg(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-batch day-grain (d, n, sq) — the identical cents
    quantization the batch chart uses, so merged state is the batch
    query's input bit-for-bit."""
    return (
        df.select(
            F.to_date("ts").alias("d"),
            F.round(F.col(value_col) * 100).cast("bigint").alias("vq"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vq").alias("sq"),
        )
    )


class ControlMonitorStore:
    """Versioned day-grain store + chart-reading log on plain parquet."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _version_file(self) -> Path:
        return self.root / "_VERSION"

    def current_version(self) -> int:
        vf = self._version_file()
        return int(vf.read_text()) if vf.exists() else -1

    def daily(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            return self.spark.createDataFrame([], DAY_STORE_SCHEMA)
        return self.spark.read.schema(DAY_STORE_SCHEMA).parquet(
            str(self.root / f"v{v}")
        )

    def readings(self) -> DataFrame:
        log = self.root / "control_log"
        if not log.exists():
            return self.spark.createDataFrame([], CONTROL_LOG_SCHEMA)
        # A crash between the log append and the marker commit makes the
        # replayed batch re-append its reading; the replay recomputes from
        # the SAME store version (the repoint happens after the marker), so
        # the duplicate row is bit-identical and batch_id dedup is exact.
        return (
            self.spark.read.schema(CONTROL_LOG_SCHEMA)
            .parquet(str(log))
            .dropDuplicates(["batch_id"])
        )

    def chart(self) -> DataFrame:
        """The full control chart over accumulated state — equals the
        batch query's output once the same events have streamed in."""
        return ewma_readout(self.daily())

    def merge_and_read(self, batch_daily: DataFrame, batch_id: int) -> None:
        """Fold the batch's day-grain stats into the store, then log
        the chart reading for the batch's newest day. Marker-committed:
        a replayed batch is a no-op on both store and log."""
        applied = self.root / "_applied"
        applied.mkdir(exist_ok=True)
        marker = applied / str(batch_id)
        target = self.current_version() + 1
        if marker.exists():
            committed = int(marker.read_text())
            if self.current_version() < committed:
                self._version_file().write_text(str(committed))
            return
        batch_daily = batch_daily.localCheckpoint(eager=True)
        merged = (
            self.daily()
            .unionByName(batch_daily)
            .groupBy("d")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("sq").cast("bigint").alias("sq"),
            )
        ).localCheckpoint(eager=True)
        newest = batch_daily.agg(F.max("d").alias("mx")).collect()[0]["mx"]
        if newest is not None:
            reading = (
                ewma_readout(merged)
                .where(F.col("day") == F.lit(newest))
                .select(
                    F.lit(batch_id).cast("bigint").alias("batch_id"),
                    "day",
                    "n_events",
                    "daily_mean",
                    "ewma",
                    "is_alarm",
                )
            )
            reading.write.mode("append").parquet(
                str(self.root / "control_log")
            )
        merged.write.mode("overwrite").parquet(str(self.root / f"v{target}"))
        marker.write_text(str(target))
        self._version_file().write_text(str(target))


def start_streaming_control(
    events: DataFrame,
    store: ControlMonitorStore,
    *,
    value_col: str = "value",
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous EWMA control gate: per micro-batch, aggregate to day
    grain (one partial-agg shuffle), fold into the store, log the
    newest day's chart reading. ``store.readings()`` is the alarm time
    series; ``store.chart()`` replays the full batch chart on demand."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        store.merge_and_read(day_batch_agg(batch_df, value_col), batch_id)

    writer = events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

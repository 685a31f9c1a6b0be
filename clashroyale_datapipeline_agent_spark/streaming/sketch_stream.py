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


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter store (deterministic-bound sibling of the CMS)
# ---------------------------------------------------------------------------

#: counter rows; a NULL key row per bucket carries the accumulated
#: decrement mass (the bucket's underestimate bound)
MG_STORE_SCHEMA = "bucket string, key bigint, cnt bigint"

#: counters kept per bucket (the MG memory dial, matching the batch
#: query ``events_mg_heavy_hitters``'s top-5)
MG_K = 5


def mg_batch_counts(df: DataFrame, value_col: str) -> DataFrame:
    """Per-batch exact (bucket, key) counts — 16 md5 buckets, same
    bucketing as ``plans/resolution_queries.events_mg_heavy_hitters``
    so stream and batch summaries are comparable."""
    return (
        df.select(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 1).alias(
                "bucket"
            ),
            F.col(value_col).cast("bigint").alias("key"),
        )
        .groupBy("bucket", "key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def mg_reduce(counts: DataFrame, k: int = MG_K) -> tuple[DataFrame, DataFrame]:
    """The Misra-Gries decrement in closed form over counted state:
    per bucket keep the top-k counts minus the (k+1)-th largest
    (ties → smaller key wins, deterministic), and report the per-bucket
    decrement ``t`` — the mass every survivor gave up and every dropped
    key is bounded by. Returns (kept_counters, per_bucket_decrement).

    MG summaries are mergeable (Agarwal et al., PODS'12): pointwise-sum
    two summaries then reduce back to k counters; the underestimate
    bounds ADD, which is what the store's error row accumulates."""
    from pyspark.sql import Window as W

    rk = counts.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("bucket").orderBy(F.desc("cnt"), F.asc("key"))
        ),
    )
    thresh = rk.groupBy("bucket").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("cnt"))), F.lit(0)
        )
        .cast("bigint")
        .alias("t")
    )
    kept = (
        rk.join(thresh, "bucket")
        .filter((F.col("rn") <= k) & (F.col("cnt") > F.col("t")))
        .select(
            "bucket", "key", (F.col("cnt") - F.col("t")).cast("bigint").alias("cnt")
        )
    )
    return kept, thresh


class MgCounterStore:
    """Versioned Misra-Gries summary store on plain parquet: ≤ k counter
    rows plus one NULL-key error row per bucket — O(buckets·k) state
    however many keys the stream has seen. Same write-new →
    marker-commit → repoint chain as :class:`CmsCounterStore`, so batch
    replays apply exactly once.

    Contract (the deterministic MG guarantee, additive across merges):
    for every key, ``est ≤ exact`` and ``exact − est ≤ err(bucket)``;
    a key absent from the summary has ``exact ≤ err(bucket)``. The
    error row makes the bound REPORTED, not assumed — the streaming
    mirror of the batch query's measured-underestimate column."""

    def __init__(self, spark: SparkSession, root: str, k: int = MG_K) -> None:
        self.spark = spark
        self.root = Path(root)
        self.k = k
        self.root.mkdir(parents=True, exist_ok=True)

    def _version_file(self) -> Path:
        return self.root / "_VERSION"

    def current_version(self) -> int:
        vf = self._version_file()
        return int(vf.read_text()) if vf.exists() else -1

    def _read_all(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            return self.spark.createDataFrame([], MG_STORE_SCHEMA)
        return self.spark.read.schema(MG_STORE_SCHEMA).parquet(
            str(self.root / f"v{v}")
        )

    def read(self) -> DataFrame:
        """Counter rows only (bucket, key, est)."""
        return self._read_all().filter(F.col("key").isNotNull())

    def errors(self) -> DataFrame:
        """Per-bucket accumulated underestimate bound (bucket, err)."""
        return self._read_all().filter(F.col("key").isNull()).select(
            "bucket", F.col("cnt").alias("err")
        )

    def merge_deltas(self, deltas: DataFrame, batch_id: int) -> None:
        applied = self.root / "_applied"
        applied.mkdir(exist_ok=True)
        marker = applied / str(batch_id)
        target = self.current_version() + 1
        if marker.exists():
            committed = int(marker.read_text())
            if self.current_version() < committed:
                self._version_file().write_text(str(committed))
            return
        merged = (
            self.read()
            .unionByName(deltas)
            .groupBy("bucket", "key")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
        kept, thresh = mg_reduce(merged, self.k)
        err = (
            self.errors()
            .unionByName(thresh.select("bucket", F.col("t").alias("err")))
            .groupBy("bucket")
            .agg(F.sum("err").cast("bigint").alias("cnt"))
            .select("bucket", F.lit(None).cast("bigint").alias("key"), "cnt")
        )
        out = kept.unionByName(err)
        out.write.mode("overwrite").parquet(str(self.root / f"v{target}"))
        marker.write_text(str(target))
        self._version_file().write_text(str(target))


def start_streaming_mg(
    events: DataFrame,
    store: MgCounterStore,
    value_col: str,
    *,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain a Misra-Gries heavy-hitter summary over a stream: per
    micro-batch, count the batch exactly (one partial-agg shuffle to
    (bucket, key) grain), then summary-merge into the bounded store —
    the deterministic-underestimate twin of :func:`start_streaming_cms`
    and the streaming twin of the batch query
    ``events_mg_heavy_hitters``. Top-k-with-bound queries read
    O(buckets·k) rows however long the stream has run."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        store.merge_deltas(mg_batch_counts(batch_df, value_col), batch_id)

    writer = events.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

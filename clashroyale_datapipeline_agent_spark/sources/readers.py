"""Sources: schema-pinned readers (SURVEY.md §2.1).

The reference's sources are REST fetches landed into Python lists
(``/root/reference/src/api/players.py:6-23``, ``src/api/battles.py:20-44``)
and a JSON dimension file loaded at import time
(``src/analytics/deck_type.py:8-16``). Spark-first equivalents:

- REST fan-out belongs OUTSIDE the engine: land responses as JSONL, then
  ``spark.read.json(path, schema=...)``. At 100 TB the fetcher tier writes
  partitioned files; the engine never blocks on HTTP.
- The card dimension is a 121-row DataFrame we always broadcast.
- The synthetic star schema is parquet read with explicit schemas so column
  pruning + predicate pushdown reach the scan (``PushedFilters`` in explain).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clashroyale_datapipeline_agent_spark import schemas

_DATA_DIR = Path(__file__).resolve().parents[1] / "data"
CARD_METADATA_PATH = _DATA_DIR / "card_metadata.json"


def load_star_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table with its pinned schema.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects outright) and plain TIMESTAMP(MICROS). The footer is
    sniffed per file (a driver-side metadata read, no data scan): the
    nanos form is read as raw longs
    (``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable) and
    converted with integer division (``div 1000``: a double division
    would lose precision on 19-digit nano values and round instead of
    truncate, diverging from DuckDB's ns->us truncation); the micros
    form reads straight into the pinned TimestampType schema. Assuming
    one encoding corrupts the time axis 1000× when the other shows up —
    exactly what a round-3 fixture regeneration did.
    """
    if name not in schemas.STAR_SCHEMA:
        raise KeyError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_is_nanos(path):
        # session default lives in session.get_spark; this fallback only
        # fires under a vanilla SparkSession (e.g. the driver's smoke
        # harness), where the runtime-settable flag is still required to
        # read TIMESTAMP(NANOS) at all
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = StructType(
            [
                StructField("event_id", LongType(), True),
                StructField("ts", LongType(), True),
                StructField("user_id", LongType(), True),
                StructField("event_type", StringType(), True),
                StructField("value", DoubleType(), True),
                StructField("props", StringType(), True),
            ]
        )
        return (
            spark.read.schema(raw_schema)
            .parquet(path)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.schema(schemas.STAR_SCHEMA[name]).parquet(path)


def _events_ts_is_nanos(path: str) -> bool:
    """True when the parquet footer stores ``ts`` as TIMESTAMP(NANOS).

    Footer-only pyarrow read (no row groups touched). Unreadable or
    directory-shaped inputs fall back to the micros path — the pinned
    TimestampType schema read fails loudly there, while the nanos path
    would silently mis-scale.
    """
    try:
        import pyarrow.parquet as pq

        return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"
    except Exception:
        return False


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """Guarded repartition for compute-heavy work over small scans.

    A parquet file with one row group arrives as ONE input split however
    small ``maxPartitionBytes`` is, serializing per-row-heavy operators
    (classification cascades, shingle explodes) on a single core locally.
    Only when the scan yields fewer than half the session's cores do we pay
    one round-robin exchange; at cluster scale a fact scan has thousands of
    splits and this is a no-op (no exchange inserted — the unconditional
    form was a round-1 VERDICT finding)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)


def spread_for_codec(df: DataFrame, *, fanout: int = 8) -> DataFrame:
    """Partitioning for Arrow codec stage inputs (``mapInPandas``
    synthesize/decode legs): scale parallelism with DATA VOLUME, not
    the core count.

    :func:`spread_if_narrow` pins small scans to ``defaultParallelism``,
    which is right for JVM-side text crunching but wrong for the Python
    codec boundary: each extra partition costs a Python-runner round
    trip (worker checkout, Arrow stream setup, per-task scheduling),
    measured locally at ~13 ms per partition per chained stage — at
    sf0.1 a 32-way codec leg spends more on the boundary than on
    decoding (round-14: 0.67 s at 32 partitions vs 0.26 s at 1 for the
    same work), which is exactly the 8-vs-32-core inversion the r13
    scaling block flagged. The scan's size-based split count (one split
    per ``maxPartitionBytes``) IS the data-volume signal, and per-row
    codec work is roughly an order of magnitude heavier than scanning,
    so the stage wants ``fanout``× the scan's splits — capped at the
    session's parallelism, and a no-op once the input already has that
    many splits (any real fact-table scan). 100 TB: splits ≫ cores →
    unchanged; the sf0.1 fixtures: 1 split → ``fanout`` partitions at
    EVERY core count, so per-core timing is flat instead of inverted.
    """
    sc = df.sparkSession.sparkContext
    n = df.rdd.getNumPartitions()
    target = min(sc.defaultParallelism, max(1, n * fanout))
    if n >= target:
        return df
    return df.repartition(target)


def load_star_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    wanted = names or tuple(schemas.STAR_SCHEMA)
    return {n: load_star_table(spark, sf_dir, n) for n in wanted}


def load_card_metadata(spark: SparkSession, path: str | Path | None = None) -> DataFrame:
    """121-row card dimension (fixture copy of the reference's
    ``src/data/card_metadata.json``; see FIXTURES.md §A2).

    Loaded via the driver (tiny file) into a schema-pinned DataFrame; join
    sides wrap it in ``F.broadcast``. Null elixir (1 card) stays null.
    """
    rows = load_card_metadata_rows(path)
    return spark.createDataFrame(rows, schema=schemas.CARD_METADATA)


def load_card_metadata_rows(path: str | Path | None = None) -> list[dict]:
    """Plain-Python card rows (used by the classify oracle + map literal)."""
    p = Path(path) if path is not None else CARD_METADATA_PATH
    with p.open("r", encoding="utf-8") as f:
        raw = json.load(f)
    return [
        {
            "id": int(c["id"]),
            "name": c["name"],
            "maxLevel": c.get("maxLevel"),
            "elixir": c.get("elixir"),
            "is_big_tank": bool(c.get("is_big_tank", False)),
            "is_bait_piece": bool(c.get("is_bait_piece", False)),
            "is_bridge_spam_piece": bool(c.get("is_bridge_spam_piece", False)),
        }
        for c in raw
    ]


def read_raw_battles_json(spark: SparkSession, path: str) -> DataFrame:
    """Scan landed battlelog JSONL with the explicit raw-battle schema.

    Extra API fields are pruned by the schema (never materialized); malformed
    rows come back null-filled rather than failing the scan (PERMISSIVE).
    """
    return spark.read.schema(schemas.RAW_BATTLE).json(path)

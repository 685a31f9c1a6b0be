"""S1/S2 — distributed battlelog ingestion with an injectable transport.

Reference parity (semantics only, re-expressed Spark-first):

- ``src/api/battles.py:20-44`` — URL shape ``/players/%23TAG/battlelog``,
  list-or-wrapped ``{"items": [...]}`` response tolerance;
- ``src/api/battles.py:6-17`` — tag normalization (strip, uppercase,
  ensure leading ``#``);
- ``src/api/cr_client.py:24-46`` — a non-200 response is an error for
  that request (raised by the transport);
- ``src/workflows/meta_workflow.py:325-341`` — per-player fetch
  tolerance: one player's failure never aborts the batch.

The reference fetches sequentially on one thread; here the tag list is a
DataFrame fanned out over executors via ``mapInPandas``, so a 300-tag
leaderboard pull or a 10M-tag backfill use the same operator — the
partition count is the concurrency dial, and per-partition sequential
requests give a natural per-executor rate bound. The sandbox has no
network, so the HTTP layer is INJECTED: ``transport(path) -> parsed
JSON`` (list or wrapped dict). Tests use deterministic fakes; a real
deployment passes a requests/httpx-backed callable (it must be
picklable — a top-level function or a small class instance).

Output is the LANDED shape: one row per battle as a raw JSON string
plus per-tag status rows. Keeping the payload opaque at the fetch
boundary (land-then-scan) means the fetch stage never needs the battle
schema — parsing happens JVM-side via ``from_json`` in
:func:`parse_battlelogs`, where Catalyst prunes unused fields.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from clashroyale_datapipeline_agent_spark import schemas

#: One row per fetched battle (plus one status row per empty/failed tag).
FETCHED_BATTLE = StructType(
    [
        StructField("player_tag", StringType(), True),  # normalized
        StructField("ok", BooleanType(), True),
        StructField("error", StringType(), True),
        StructField("battle_json", StringType(), True),  # NULL on status rows
    ]
)

Transport = Callable[[str], Any]


def normalize_player_tag(tag: str) -> str:
    """F5/S2 tag normalization (``battles.py:6-17``): strip, uppercase,
    ensure a leading ``#``."""
    cleaned = (tag or "").strip().upper()
    if not cleaned.startswith("#"):
        cleaned = "#" + cleaned
    return cleaned


def battlelog_path(tag: str) -> str:
    """API path for a (normalized) tag — ``#`` encoded as ``%23``
    (``battles.py:33-35``)."""
    return f"/players/{normalize_player_tag(tag).replace('#', '%23', 1)}/battlelog"


def _unwrap(data: Any) -> list[dict]:
    """List-or-wrapped response tolerance (``battles.py:38-43``)."""
    if isinstance(data, list):
        return data
    if data is None:
        return []
    return data.get("items", [])


def fetch_battlelogs(
    spark: SparkSession,
    tags: DataFrame | list[str],
    transport: Transport,
    *,
    tag_col: str = "tag",
    partitions: int | None = None,
    max_retries: int = 0,
    backoff_s: float = 1.0,
    sleeper: Callable[[float], None] | None = None,
) -> DataFrame:
    """Fan the battlelog fetch out over executors.

    ``tags`` is a DataFrame with ``tag_col`` (or a plain list, turned
    into one). The frame is repartitioned to ``partitions`` (default:
    the session's default parallelism) so requests spread across the
    cluster; within a partition requests run sequentially — the
    partition count IS the global concurrency.

    ``transport(path)`` returns the parsed JSON for an API path and
    raises on failure (the reference's ``cr_get`` contract). Transient
    failures retry up to ``max_retries`` times with linear backoff
    (``backoff_s * attempt``, via the injectable ``sleeper`` so tests
    don't sleep); a tag that still fails yields an ``ok=false`` status
    row — never an aborted batch.

    Returns the :data:`FETCHED_BATTLE` shape. NOTE: downstream
    consumers that trigger multiple actions should ``localCheckpoint``
    the result first, or every action re-fires the HTTP fan-out.
    """
    if not isinstance(tags, DataFrame):
        tags = spark.createDataFrame([(t,) for t in tags], f"{tag_col} string")
    n_parts = partitions or spark.sparkContext.defaultParallelism
    spread = tags.select(F.col(tag_col).cast("string").alias(tag_col)).repartition(
        n_parts
    )
    do_sleep = sleeper if sleeper is not None else __import__("time").sleep

    def _fetch_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple[str, bool, str | None, str | None]] = []
            for tag in pdf[tag_col]:
                norm = normalize_player_tag(tag)
                path = battlelog_path(norm)
                err: str | None = None
                battles: list[dict] | None = None
                for attempt in range(max_retries + 1):
                    try:
                        battles = _unwrap(transport(path))
                        err = None
                        break
                    except Exception as exc:  # per-tag tolerance
                        err = f"{type(exc).__name__}: {exc}"[:500]
                        if attempt < max_retries:
                            do_sleep(backoff_s * (attempt + 1))
                if battles is None:
                    rows.append((norm, False, err, None))
                elif not battles:
                    rows.append((norm, True, None, None))
                else:
                    rows.extend(
                        (norm, True, None, json.dumps(b)) for b in battles
                    )
            yield pd.DataFrame(
                rows, columns=["player_tag", "ok", "error", "battle_json"]
            )

    return spread.mapInPandas(_fetch_partition, schema=FETCHED_BATTLE)


def parse_battlelogs(fetched: DataFrame) -> DataFrame:
    """Landed JSON → RAW_BATTLE rows, JVM-side.

    ``from_json`` with the explicit schema (S5) — no Python in the
    parse path, and Catalyst prunes struct fields the downstream plan
    never touches. The battlelog payload does not say whose log it is
    (the API implies it by URL); the fetch row's ``player_tag`` wins
    over any tag embedded in the JSON, mirroring the reference's
    attach-after-fetch (``meta_workflow.py:329-336``).
    """
    b = F.from_json("battle_json", schemas.RAW_BATTLE)
    passthrough = [f.name for f in schemas.RAW_BATTLE.fields if f.name != "player_tag"]
    return (
        fetched.filter(F.col("battle_json").isNotNull())
        .select(b.alias("b"), "player_tag")
        .select(
            *[F.col(f"b.{c}").alias(c) for c in passthrough],
            F.coalesce(F.col("player_tag"), F.col("b.player_tag")).alias(
                "player_tag"
            ),
        )
    )


def fetch_status(fetched: DataFrame) -> DataFrame:
    """Per-tag outcome: ``(player_tag, ok, error)`` — one row per tag.

    Bounded by the tag batch size; the meta loop collects it to mark
    tags fetched (J3's anti-join pool lives driver-side in the
    reference too, ``meta_workflow.py:320-341``).
    """
    return (
        fetched.groupBy("player_tag")
        .agg(
            F.max("ok").alias("ok"),
            F.max("error").alias("error"),
        )
    )


def land_battlelogs_jsonl(fetched: DataFrame, path: str) -> None:
    """S4 land-then-scan: persist raw battle JSON lines under ``path``.

    One text line per battle — the durable raw zone. Re-reading through
    :func:`read_landed_battlelogs` replays ingestion without the API.
    """
    (
        fetched.filter(F.col("battle_json").isNotNull())
        .select("battle_json")
        .write.mode("append")
        .text(path)
    )


def read_landed_battlelogs(spark: SparkSession, path: str) -> DataFrame:
    """Scan a landed JSONL raw zone back into RAW_BATTLE rows."""
    raw = spark.read.text(path).withColumnRenamed("value", "battle_json")
    b = F.from_json("battle_json", schemas.RAW_BATTLE)
    return raw.select(b.alias("b")).select("b.*")


def stream_landed_battlelogs(spark: SparkSession, path: str) -> DataFrame:
    """§2.10 × S2: the landed raw zone as a STREAMING source.

    ``readStream.text`` over the JSONL directory — Structured
    Streaming's file source tracks seen files per micro-batch, so each
    fetch round's landing is ingested exactly once. Parsing is the same
    JVM-side ``from_json`` as the batch scan; downstream this composes
    with the incremental meta-counter maintenance
    (``streaming/incremental.py``) for a fetch → land → stream →
    maintain pipeline whose store provably equals the batch recompute
    (pinned in ``tests/test_fetch.py``).
    """
    raw = spark.readStream.text(path).withColumnRenamed("value", "battle_json")
    b = F.from_json("battle_json", schemas.RAW_BATTLE)
    return raw.select(b.alias("b")).select("b.*")


LEADERBOARD_GLOBAL_ID = 170000005  # global trophy ladder (cr_client.py:58)


def leaderboard_path(
    leaderboard_id: int = LEADERBOARD_GLOBAL_ID, limit: int = 300
) -> str:
    """API path for the ladder leaderboard —
    ``GET /leaderboard/{id}?limit=N`` (``cr_client.py:51-62``)."""
    return f"/leaderboard/{leaderboard_id}?limit={limit}"


def fetch_leaderboard(
    spark: SparkSession,
    transport: Transport,
    *,
    limit: int = 300,
    leaderboard_id: int = LEADERBOARD_GLOBAL_ID,
) -> DataFrame:
    """S1 — leaderboard scan as an explicit-schema DataFrame.

    ONE request (the leaderboard endpoint caps at ~1000 rows), so unlike
    the battlelog fan-out this stays a driver-side fetch by design —
    distributing a single HTTP call buys nothing. Response tolerance
    mirrors ``players.py:6-23``: unwrap ``items`` (empty/missing →
    empty DataFrame, never a raised batch), normalize tags, keep the
    (rank, tag, name, trophies) projection of
    :data:`schemas.LEADERBOARD_PLAYER`. The result is the tag-pool input
    to :func:`fetch_battlelogs` / ``MetaDatasetBuilder``.
    """
    items = _unwrap(transport(leaderboard_path(leaderboard_id, limit)))
    rows = [
        (
            int(p["rank"]) if p.get("rank") is not None else None,
            normalize_player_tag(p["tag"]) if p.get("tag") else None,
            p.get("name"),
            int(p["trophies"]) if p.get("trophies") is not None else None,
        )
        for p in items
    ]
    return spark.createDataFrame(rows, schemas.LEADERBOARD_PLAYER)

"""Distributed S2 battlelog fetcher (sources/fetch.py): fan-out shape,
response tolerance, retry semantics, landed-JSONL roundtrip, and the
meta-loop wiring (plans/pipeline.py)."""

from __future__ import annotations

import hashlib
import sys

from pyspark.sql import functions as F

# The mock transports below are module-level functions; Spark's Python
# workers can't import the tests package, so force by-value pickling for
# this module (the same reason production transports must be picklable).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from clashroyale_datapipeline_agent_spark.fixtures.battles import (
    generate_raw_battles,
)
from clashroyale_datapipeline_agent_spark.sources import fetch as FX


def _tag_of(path: str) -> str:
    # '/players/%23ABC/battlelog' -> '#ABC'
    return path.split("/players/")[1].split("/battlelog")[0].replace("%23", "#")


def _scripted_transport(path: str):
    """Deterministic battlelog per tag (md5-seeded — NOT hash(), which is
    per-process randomized and would diverge across executors)."""
    tag = _tag_of(path)
    seed = int(hashlib.md5(tag.encode()).hexdigest()[:6], 16) % 1000
    battles = generate_raw_battles(n_players=1, battles_per_player=5, seed=seed)
    # exercise BOTH response shapes the reference tolerates
    if seed % 2 == 0:
        return battles
    return {"items": battles}


def test_tag_normalization_and_path():
    assert FX.normalize_player_tag("  ab12 ") == "#AB12"
    assert FX.normalize_player_tag("#yz") == "#YZ"
    assert FX.battlelog_path("ab12") == "/players/%23AB12/battlelog"


def test_fan_out_spreads_tags_across_partitions(spark):
    tags = [f"#T{i:03d}" for i in range(16)]
    fetched = FX.fetch_battlelogs(spark, tags, _scripted_transport, partitions=8)
    parts = (
        fetched.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.countDistinct("player_tag").alias("n_tags"))
        .collect()
    )
    # 16 tags spread over 8 partitions: the plan has 8 tasks and the
    # work genuinely fans out (round-robin placement from a tiny local
    # relation isn't perfectly even — what matters is parallelism)
    assert fetched.rdd.getNumPartitions() == 8
    assert len(parts) >= 4
    assert sum(r.n_tags for r in parts) == 16
    # both wrapped and bare list responses produced battles
    n = fetched.filter("battle_json is not null").count()
    assert n == 16 * 5


def test_per_tag_error_tolerance_and_status(spark):
    def transport(path):
        if _tag_of(path) == "#BAD":
            raise RuntimeError("Clash Royale API error 503: maintenance")
        return _scripted_transport(path)

    fetched = FX.fetch_battlelogs(
        spark, ["#GOOD1", "#BAD", "#GOOD2"], transport, partitions=2
    )
    status = {r.player_tag: r for r in FX.fetch_status(fetched).collect()}
    assert status["#BAD"].ok is False
    assert "503" in status["#BAD"].error
    assert status["#GOOD1"].ok and status["#GOOD2"].ok
    # the failed tag contributes no battle rows; the others are intact
    assert fetched.filter(
        (F.col("player_tag") == "#BAD") & F.col("battle_json").isNotNull()
    ).count() == 0
    assert fetched.filter("battle_json is not null").count() == 10


def test_empty_battlelog_yields_ok_status_only(spark):
    fetched = FX.fetch_battlelogs(
        spark, ["#EMPTY"], lambda path: [], partitions=1
    )
    rows = fetched.collect()
    assert len(rows) == 1
    assert rows[0].ok is True and rows[0].battle_json is None


def test_retry_recovers_transient_failures(spark):
    calls: dict[str, int] = {}

    def flaky(path):
        # fails twice per path, then succeeds; per-task closure state is
        # coherent because the whole batch runs in ONE partition
        calls[path] = calls.get(path, 0) + 1
        if calls[path] <= 2:
            raise RuntimeError("Clash Royale API error 429: rate limited")
        return _scripted_transport(path)

    ok = FX.fetch_battlelogs(
        spark,
        ["#R1", "#R2"],
        flaky,
        partitions=1,
        max_retries=2,
        sleeper=lambda s: None,
    )
    st = {r.player_tag: r.ok for r in FX.fetch_status(ok).collect()}
    assert st == {"#R1": True, "#R2": True}

    calls.clear()
    no_retry = FX.fetch_battlelogs(
        spark, ["#R1"], flaky, partitions=1, max_retries=0
    )
    assert FX.fetch_status(no_retry).collect()[0].ok is False


def test_parse_attaches_fetch_tag_over_embedded(spark):
    battle = generate_raw_battles(n_players=1, battles_per_player=1, seed=3)[0]
    battle["player_tag"] = "#EMBEDDED"
    fetched = FX.fetch_battlelogs(
        spark, ["#fetched "], lambda p: [battle], partitions=1
    )
    parsed = FX.parse_battlelogs(fetched).collect()
    assert len(parsed) == 1
    # the fetch row's (normalized) tag wins — the log's owner is defined
    # by the URL, not the payload (meta_workflow.py:329-336)
    assert parsed[0].player_tag == "#FETCHED"
    assert parsed[0].battleTime == battle["battleTime"]


def test_land_and_read_jsonl_roundtrip(spark, tmp_path):
    tags = ["#L1", "#L2", "#L3"]
    fetched = FX.fetch_battlelogs(spark, tags, _scripted_transport, partitions=2)
    fetched = fetched.localCheckpoint(eager=True)
    dest = str(tmp_path / "raw_zone")
    FX.land_battlelogs_jsonl(fetched, dest)
    back = FX.read_landed_battlelogs(spark, dest)
    assert back.count() == fetched.filter("battle_json is not null").count()
    # schema is the RAW_BATTLE shape, parseable end-to-end
    assert {"battleTime", "type", "gameMode", "team", "opponent"} <= set(
        back.columns
    )


def test_meta_loop_runs_on_distributed_fetch(spark, tmp_path):
    from clashroyale_datapipeline_agent_spark.plans.pipeline import (
        MetaDatasetBuilder,
    )

    def transport(path):
        tag = _tag_of(path)
        if tag.endswith("13"):  # one permanently failing player
            raise RuntimeError("Clash Royale API error 404: notFound")
        return _scripted_transport(path)

    players = [{"tag": f"#PLAYER{i:03d}"} for i in range(40)]
    b = MetaDatasetBuilder(
        spark,
        None,
        str(tmp_path / "staging"),
        transport=transport,
        fetch_partitions=4,
        min_total_battles=30,
        min_games_per_type=0,
        max_loops=3,
        initial_sample=20,
        increment_sample=10,
        seed=11,
        bucket_table=None,
    )
    catalog = b.run(players)
    assert catalog["battles"].count() >= 30
    # failed tag is NOT marked fetched (stays resample-able); succeeded are
    assert "#PLAYER013" not in b.fetched_tags
    assert len(b.fetched_tags) >= 19


def test_landed_stream_incremental_equals_batch(spark, tmp_path):
    """fetch -> land JSONL -> STREAM the raw zone -> incremental counter
    maintenance across two landings == one batch recompute over
    everything landed (the S2 x §2.10 composition)."""
    from clashroyale_datapipeline_agent_spark.operators.normalize import (
        filter_and_normalize_ranked_1v1,
    )
    from clashroyale_datapipeline_agent_spark.streaming.incremental import (
        IncrementalCounterStore,
        participant_counter_deltas,
        start_incremental_meta_counters,
    )

    dest = str(tmp_path / "raw_zone")
    store = IncrementalCounterStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = FX.stream_landed_battlelogs(spark, dest)
        q = start_incremental_meta_counters(
            filter_and_normalize_ranked_1v1(stream), store, ckpt
        )
        q.awaitTermination(120)

    f1 = FX.fetch_battlelogs(
        spark, ["#S1", "#S2"], _scripted_transport, partitions=2
    ).localCheckpoint(eager=True)
    FX.land_battlelogs_jsonl(f1, dest)
    drain()
    v_after_first = store.current_version()

    f2 = FX.fetch_battlelogs(
        spark, ["#S3"], _scripted_transport, partitions=1
    ).localCheckpoint(eager=True)
    FX.land_battlelogs_jsonl(f2, dest)
    drain()
    # the second drain saw ONLY the new files (exactly-once file source)
    assert store.current_version() > v_after_first

    batch = filter_and_normalize_ranked_1v1(
        FX.read_landed_battlelogs(spark, dest)
    )
    expected = {
        r.deck_type: (r.games, r.wins, r.losses, r.draws)
        for r in participant_counter_deltas(batch).collect()
    }
    got = {
        r.deck_type: (r.games, r.wins, r.losses, r.draws)
        for r in store.read().collect()
    }
    assert got == expected and expected  # non-trivial and identical

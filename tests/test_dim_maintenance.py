"""J2 elixir-backfill job (parity: ``update_cardsdata.py:36-52``)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.dim_maintenance import (
    backfill_elixir,
    load_cards_raw,
    run_elixir_backfill,
)
from clashroyale_datapipeline_agent_spark.sources.readers import (
    load_card_metadata,
    load_card_metadata_rows,
)


def _reference_backfill() -> dict[str, int | None]:
    """The reference script's semantics, straight from the fixture files:
    elixir = raw elixirCost when the name matches (None included)."""
    raw = json.load(
        open(
            "/root/repo/clashroyale_datapipeline_agent_spark/data/cards_raw.json",
            encoding="utf-8",
        )
    )
    lookup = {c["name"]: c.get("elixirCost") for c in raw}
    return {
        m["name"]: lookup.get(m["name"], m["elixir"])
        for m in load_card_metadata_rows()
    }


def test_backfill_matches_reference_semantics(spark):
    out = backfill_elixir(load_card_metadata(spark), load_cards_raw(spark))
    got = {r["name"]: r["elixir"] for r in out.collect()}
    assert got == _reference_backfill()
    # all 121 fixture cards match the raw dump (reference prints updated=121)
    statuses = {r["backfill_status"] for r in out.collect()}
    assert statuses == {"updated"}
    # Mirror: matched but raw has no elixirCost -> verbatim null overwrite
    mirror = out.filter(F.col("name") == "Mirror").collect()[0]
    assert mirror["elixir"] is None and mirror["backfill_status"] == "updated"


def test_backfill_missing_keeps_old_elixir(spark):
    meta = load_card_metadata(spark)
    raw = load_cards_raw(spark).filter(F.col("name") != "Knight")
    out = backfill_elixir(meta, raw)
    knight = out.filter(F.col("name") == "Knight").collect()[0]
    old = {m["name"]: m["elixir"] for m in load_card_metadata_rows()}
    assert knight["backfill_status"] == "missing"
    assert knight["elixir"] == old["Knight"]


def test_backfill_plan_broadcasts(spark):
    out = backfill_elixir(load_card_metadata(spark), load_cards_raw(spark))
    plan = spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_run_elixir_backfill_job(spark, tmp_path):
    report = run_elixir_backfill(spark, out_path=str(tmp_path / "dim"))
    assert report == {"updated": 121, "missing": []}
    back = spark.read.json(str(tmp_path / "dim"))
    assert back.count() == 121
    got = {r["name"]: r["elixir"] for r in back.collect()}
    assert got == _reference_backfill()

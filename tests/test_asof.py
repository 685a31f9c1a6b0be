"""as_of_join semantics on a hand-computed fixture (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.asof import as_of_join


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),  # view at 09:50 matches
            (1, "2024-01-01 09:00:00", 101),  # no prior view
            (2, "2024-01-01 10:00:00", 102),  # tie: view at exactly 10:00 matches
            (3, "2024-01-01 10:00:00", 103),  # user with no views at all
        ],
        "user_id int, ts string, purchase_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:50:00", 900),
            (1, "2024-01-01 09:30:00", 901),  # older view, must lose to 09:50
            (2, "2024-01-01 10:00:00", 902),
            (2, "2024-01-01 11:00:00", 903),  # future view, must not match
        ],
        "user_id int, ts string, view_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_as_of_join_inner_picks_latest_at_or_before(spark):
    left, right = _mk(spark)
    got = {
        r["purchase_id"]: r["view_id"]
        for r in as_of_join(left, right, key="user_id").collect()
    }
    assert got == {100: 900, 102: 902}


def test_as_of_join_left_keeps_unmatched(spark):
    left, right = _mk(spark)
    got = {
        r["purchase_id"]: r["view_id"]
        for r in as_of_join(left, right, key="user_id", inner=False).collect()
    }
    assert got == {100: 900, 101: None, 102: 902, 103: None}

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


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Differential check vs pandas.merge_asof (backward,
    allow_exact_matches=True — the same >= convention) on a seeded random
    fixture with ties, sparse keys, and unmatched rows."""
    import random

    import pandas as pd

    rng = random.Random(7)
    lrows = [
        (rng.randrange(6), rng.randrange(0, 10_000) * 1_000_000, i)
        for i in range(300)
    ]
    rrows_raw = {
        (u := rng.randrange(6), rng.randrange(0, 10_000) * 1_000_000): 1
        for _ in range(200)
    }
    rrows = [(u, ts, 1000 + j) for j, (u, ts) in enumerate(sorted(rrows_raw))]

    left = spark.createDataFrame(
        [(u, ts, i) for u, ts, i in lrows], "user_id int, ts_us long, lid int"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    right = spark.createDataFrame(
        [(u, ts, v) for u, ts, v in rrows], "user_id int, ts_us long, rid int"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")

    got = {
        r["lid"]: r["rid"]
        for r in as_of_join(left, right, key="user_id", inner=False).collect()
    }

    lp = pd.DataFrame(
        [(u, pd.Timestamp(ts, unit="us"), i) for u, ts, i in lrows],
        columns=["user_id", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(u, pd.Timestamp(ts, unit="us"), v) for u, ts, v in rrows],
        columns=["user_id", "ts", "rid"],
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want and len(got) == 300


def test_as_of_join_null_values_come_from_one_right_row(spark):
    """A matching right row whose value columns are NULL must be carried
    AS-IS — not 'looked through' to an older row (DuckDB/pandas ASOF
    semantics: the match is on time, values come from the matched row)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100)],
        "user_id int, ts string, purchase_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 7, "old"),
            (1, "2024-01-01 09:50:00", None, None),  # latest row, all-null values
        ],
        "user_id int, ts string, view_id int, tag string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = as_of_join(left, right, key="user_id").collect()
    # inner: the left row DID match (the 09:50 row) and must survive,
    # carrying that row's NULL values — not 7/"old" from 09:00.
    assert len(rows) == 1
    assert rows[0]["view_id"] is None and rows[0]["tag"] is None


def test_as_of_join_forward_and_tolerance_match_pandas(spark):
    """Differential vs pandas.merge_asof for direction='forward' and for
    tolerance in BOTH directions, on the same seeded random fixture as
    the backward check."""
    import random

    import pandas as pd

    rng = random.Random(13)
    lrows = [
        (rng.randrange(6), rng.randrange(0, 10_000) * 1_000_000, i)
        for i in range(300)
    ]
    rrows_raw = {
        (rng.randrange(6), rng.randrange(0, 10_000) * 1_000_000): 1
        for _ in range(200)
    }
    rrows = [(u, ts, 1000 + j) for j, (u, ts) in enumerate(sorted(rrows_raw))]

    left = spark.createDataFrame(
        [(u, ts, i) for u, ts, i in lrows], "user_id int, ts_us long, lid int"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    right = spark.createDataFrame(
        [(u, ts, v) for u, ts, v in rrows], "user_id int, ts_us long, rid int"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")

    lp = pd.DataFrame(
        [(u, pd.Timestamp(ts, unit="us"), i) for u, ts, i in lrows],
        columns=["user_id", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(u, pd.Timestamp(ts, unit="us"), v) for u, ts, v in rrows],
        columns=["user_id", "ts", "rid"],
    ).sort_values("ts", kind="stable")

    cases = [
        ({"direction": "forward"}, {"direction": "forward"}),
        (
            {"direction": "forward", "tolerance": "1 hour"},
            {"direction": "forward", "tolerance": pd.Timedelta(hours=1)},
        ),
        (
            {"direction": "backward", "tolerance": "1 hour"},
            {"direction": "backward", "tolerance": pd.Timedelta(hours=1)},
        ),
    ]
    for spark_kw, pd_kw in cases:
        got = {
            r["lid"]: r["rid"]
            for r in as_of_join(
                left, right, key="user_id", inner=False, **spark_kw
            ).collect()
        }
        merged = pd.merge_asof(
            lp, rp, on="ts", by="user_id", allow_exact_matches=True, **pd_kw
        )
        want = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
        assert got == want and len(got) == 300, spark_kw

"""Skew-handling operators (100 TB target; SCALE.md).

AQE's skew-join splitting handles most cases at runtime. These helpers are
for the two shapes AQE does NOT fix:

- **skewed aggregation**: one hot grouping key overloads a single reducer.
  ``salted_counter_agg`` spreads each key over ``salt`` subkeys (two-stage
  agg: partial by (key, salt), final by key). Because the counter pattern
  is commutative sums, the re-aggregation is exact.
- **skewed broadcast-side-too-big join**: ``salted_join`` replicates the
  small side ``salt`` times and salts the big side's key, so one hot key's
  rows land on ``salt`` different reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_counter_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    ``agg_exprs`` maps output column -> one of {"count", "sum:<col>"}.
    Stage 1 groups by (keys + random salt) — hot keys split across ``salt``
    reducers; stage 2 sums the tiny partials by key. Only sums/counts are
    offered because only commutative-monoid aggregates re-combine exactly.
    """
    stage1_aggs = []
    stage2_aggs = []
    for out, spec in agg_exprs.items():
        if spec == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(out))
        elif spec.startswith("sum:"):
            stage1_aggs.append(F.sum(spec[4:]).alias(out))
        else:
            raise ValueError(f"unsupported agg {spec!r}")
        stage2_aggs.append(F.sum(out).alias(out))
    salted = df.withColumn("_salt", (F.rand() * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*key_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side.

    Each big row gets a random salt in [0, salt); the small side is
    exploded ``salt``× with every salt value, so (key, salt) pairs match
    exactly once. Network cost: small side × salt (bounded by construction);
    win: the hot key's rows spread over ``salt`` reducers instead of one.

    Only ``inner`` and ``left`` are supported: for right/full outer joins
    every *unmatched* small-side row survives once per replica, multiplying
    unmatched rows ``salt``× in the output.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full outer would emit each unmatched small-side row "
            f"{salt} times (one per salt replica)"
        )
    big_s = big.withColumn("_salt", (F.rand() * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")

"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the columns of the most recent right row of the
same key with ``right.ts <= left.ts`` (backward as-of). The classic uses
are point-in-time feature lookup (latest profile/price as of an event) and
conversion attribution (most recent view before a purchase).

Spark-first design: instead of a per-key merge join in Python, the two
sides are UNIONED with a side marker and the right columns are carried
forward with ``last(col, ignorenulls=True)`` over a (key, ts)-ordered
running window — ONE shuffle on the key, one in-partition sort, no UDF,
no state. At 100 TB this is the plan you want: the same shape as any
windowed aggregation over the key, and AQE handles key skew.

Cross-engine: DuckDB has a native ``ASOF JOIN``; the oracle query pairs
this operator against it directly (``events_asof_attribution``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    inner: bool = True,
) -> DataFrame:
    """Backward as-of join: left rows pick up ``right_cols`` from the
    latest right row with the same ``key`` and ``right.ts <= left.ts``.

    ``right_cols`` are the right-side value columns to carry (they must
    not clash with left column names; pre-alias on the right if needed).
    Right rows should be unique per (key, ts) — pre-aggregate otherwise,
    or the carried row among equal timestamps is the last in sort order.
    ``inner=False`` keeps left rows with no prior right row (nulls),
    matching ``ASOF LEFT JOIN``.

    Ordering puts right rows BEFORE left rows at equal timestamps
    (``_side`` 0 < 1), so a right row at exactly ``left.ts`` matches —
    the ``>=`` convention of DuckDB/pandas ``merge_asof``.
    """
    rcols = right_cols or [c for c in right.columns if c not in (key, ts_col)]
    l = left.withColumn("_side", F.lit(1))
    # The carried payload is ONE struct, built on the right side BEFORE the
    # union: left rows then hold a genuinely NULL struct (a struct OF nulls
    # built post-union would be non-null and break both properties below).
    # Carrying the struct — not each column independently — guarantees all
    # carried values come from the SAME right row even when some value
    # columns are NULL, and makes struct-nullness the correct "matched"
    # marker for inner semantics (DuckDB ASOF JOIN / pandas merge_asof).
    r = right.select(
        F.col(key), F.col(ts_col), F.struct(*rcols).alias("_rstruct")
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts_col), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in u.columns if c != "_rstruct"],
        F.last("_rstruct", ignorenulls=True).over(w).alias("_rstruct"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if inner:
        out = out.filter(F.col("_rstruct").isNotNull())
    return out.select(
        *[c for c in out.columns if c != "_rstruct"],
        *[F.col(f"_rstruct.{c}").alias(c) for c in rcols],
    )

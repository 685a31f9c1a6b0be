"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the columns of the most recent right row of the
same key with ``right.ts <= left.ts`` (backward as-of, the default) or the
earliest right row with ``right.ts >= left.ts`` (forward). The classic
uses are point-in-time feature lookup (latest profile/price as of an
event) and conversion attribution (most recent view before a purchase).

Spark-first design: instead of a per-key merge join in Python, the two
sides are UNIONED with a side marker and the right columns are carried
with ``last``/``first(col, ignorenulls=True)`` over a (key, ts)-ordered
running window — ONE shuffle on the key, one in-partition sort, no UDF,
no state. At 100 TB this is the plan you want: the same shape as any
windowed aggregation over the key, and AQE handles key skew.

Cross-engine: DuckDB has a native ``ASOF JOIN``; the oracle query pairs
this operator against it directly (``events_asof_attribution``). The
``direction``/``tolerance`` parameters mirror ``pandas.merge_asof`` and
are differentially tested against it (``tests/test_asof.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Interval strings accepted for ``tolerance``: one or more
#: ``<number> <unit>`` terms (``30 minutes``, ``1 day 2 hours``).
_TOLERANCE_RE = re.compile(
    r"^\s*\d+\s+[A-Za-z]+(\s+\d+\s+[A-Za-z]+)*\s*$"
)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    inner: bool = True,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: left rows pick up ``right_cols`` from the matched
    right row of the same ``key``.

    ``direction='backward'`` (default) matches the LATEST right row with
    ``right.ts <= left.ts``; ``'forward'`` matches the EARLIEST right row
    with ``right.ts >= left.ts`` — both include exact-timestamp matches
    (the ``allow_exact_matches=True`` convention of DuckDB ASOF JOIN and
    ``pandas.merge_asof``). ``tolerance`` (an SQL interval string like
    ``'30 minutes'``) voids matches farther than that from the left
    timestamp, exactly like merge_asof's ``tolerance``.

    ``right_cols`` are the right-side value columns to carry (they must
    not clash with left column names; pre-alias on the right if needed).
    Right rows should be unique per (key, ts) — pre-aggregate otherwise,
    or the carried row among equal timestamps is the last in sort order.
    ``inner=False`` keeps left rows with no match (nulls), matching
    ``ASOF LEFT JOIN``.
    """
    if tolerance is not None and not _TOLERANCE_RE.match(tolerance):
        # validated up front: the string is interpolated into F.expr(),
        # so anything else would surface as an opaque AnalysisException
        # deep in the plan (or smuggle arbitrary SQL into it)
        raise ValueError(
            "tolerance must look like '<n> <unit>' (e.g. '30 minutes', "
            f"'1 day 2 hours'), got {tolerance!r}"
        )
    rcols = right_cols or [c for c in right.columns if c not in (key, ts_col)]
    l = left.withColumn("_side", F.lit(1))
    # The carried payload is ONE struct, built on the right side BEFORE the
    # union: left rows then hold a genuinely NULL struct (a struct OF nulls
    # built post-union would be non-null and break both properties below).
    # Carrying the struct — not each column independently — guarantees all
    # carried values come from the SAME right row even when some value
    # columns are NULL, and makes struct-nullness the correct "matched"
    # marker for inner semantics (DuckDB ASOF JOIN / pandas merge_asof).
    # The matched right timestamp rides along as ``_rts`` so tolerance can
    # compare against it without a second pass over the right side.
    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.struct(F.col(ts_col).alias("_rts"), *rcols).alias("_rstruct"),
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal timestamps
        # (``_side`` 0 < 1), so an exact-ts right row is inside the
        # preceding-inclusive frame.
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts_col), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried_expr = F.last("_rstruct", ignorenulls=True).over(w)
    elif direction == "forward":
        # mirror image: left rows sort BEFORE right rows at equal
        # timestamps, so an exact-ts right row is inside the
        # following-inclusive frame.
        w = (
            Window.partitionBy(key)
            .orderBy(F.asc(ts_col), F.desc("_side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried_expr = F.first("_rstruct", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carried = u.select(
        *[c for c in u.columns if c != "_rstruct"],
        carried_expr.alias("_rstruct"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        gap_ok = (
            (F.col(ts_col) - F.col("_rstruct._rts")) <= tol
            if direction == "backward"
            else (F.col("_rstruct._rts") - F.col(ts_col)) <= tol
        )
        out = out.withColumn("_rstruct", F.when(gap_ok, F.col("_rstruct")))
    if inner:
        out = out.filter(F.col("_rstruct").isNotNull())
    return out.select(
        *[c for c in out.columns if c != "_rstruct"],
        *[F.col(f"_rstruct.{c}").alias(c) for c in rcols],
    )

"""Single-scan table profiling — the data-quality audit operator.

Every ingestion pipeline fronts its tables with a profile pass: per
column, how many nulls, how many distinct values, and the value range.
The naive form is one scan per column; at 100 TB that is |columns|
full-table reads. This operator computes EVERY column's statistics in
ONE scan — a single aggregate row holding |columns|×4 measures — then
melts that row into per-column records with an explode over a literal
struct array (driver-side schema work only, zero extra data movement).

Type policy keeps the output engine-portable: numeric and timestamp
columns report min/max on a numeric axis (timestamps via
``unix_micros`` — integer microseconds, no tz/format ambiguity),
string columns report lexicographic min/max in dedicated string
columns. No value is ever cast number→string (double formatting is
engine-specific; numbers stay numbers).

Parity: reference has no profiler; nearest behavior is the ad-hoc
pandas inspection inside `src/analytics/meta_analytics.py` /
`user_analytics.py` — this is the scale-shaped replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType, TimestampType


def profile_table(df: DataFrame) -> DataFrame:
    """Per-column profile in one scan.

    Returns (column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per input column, ordered by column
    name. ``n_distinct`` is exact (null excluded). Unsupported types
    (arrays, structs, binary) still get null/distinct counts with null
    ranges.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_rows")]
    for f in df.schema.fields:
        c, safe = F.col(f.name), f.name
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint").alias(f"_nn_{safe}")
        )
        aggs.append(F.count_distinct(c).cast("bigint").alias(f"_nd_{safe}"))
        if isinstance(f.dataType, TimestampType):
            num = F.unix_micros(c).cast("double")
        elif isinstance(f.dataType, NumericType):
            num = c.cast("double")
        else:
            num = F.lit(None).cast("double")
        s = c if isinstance(f.dataType, StringType) else F.lit(None).cast("string")
        aggs.append(F.min(num).alias(f"_mn_{safe}"))
        aggs.append(F.max(num).alias(f"_mx_{safe}"))
        aggs.append(F.min(s).alias(f"_ms_{safe}"))
        aggs.append(F.max(s).alias(f"_xs_{safe}"))
    one = df.agg(*aggs)
    records = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nn_{f.name}").alias("n_nulls"),
                F.col(f"_nd_{f.name}").alias("n_distinct"),
                F.col(f"_mn_{f.name}").alias("min_num"),
                F.col(f"_mx_{f.name}").alias("max_num"),
                F.col(f"_ms_{f.name}").alias("min_str"),
                F.col(f"_xs_{f.name}").alias("max_str"),
            )
            for f in df.schema.fields
        ]
    )
    return (
        one.select(F.explode(records).alias("r"))
        .select("r.*")
        .orderBy("column")
    )


def check_constraints(
    df: DataFrame, checks: list[tuple[str, F.Column, F.Column]]
) -> DataFrame:
    """Deequ-style data-quality constraint suite in ONE scan.

    ``checks`` is a list of (name, observed, passed) where ``observed``
    is an aggregate expression (the measured value, as double) and
    ``passed`` an aggregate boolean predicate over the same scan. All
    constraints evaluate inside a single wide aggregate row — one table
    read regardless of how many constraints are declared (the naive
    form is one scan per constraint; at 100 TB that is |checks|
    full-table reads) — then melt to (check, observed, passed) records
    via the same literal-struct explode as :func:`profile_table`.
    """
    aggs = []
    for name, observed, passed in checks:
        aggs.append(observed.cast("double").alias(f"_o_{name}"))
        aggs.append(passed.alias(f"_p_{name}"))
    one = df.agg(*aggs)
    records = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"_o_{name}").alias("observed"),
                F.col(f"_p_{name}").alias("passed"),
            )
            for name, _, _ in checks
        ]
    )
    return (
        one.select(F.explode(records).alias("r"))
        .select("r.*")
        .orderBy("check")
    )

"""Data-layout operators: Z-order (Morton) clustering + zone maps.

At 100 TB, scan cost is decided before the query runs — by how rows
were laid out into files. Engines skip a file when its zone map (per
file min/max of each column) excludes the predicate range; a layout
clustered on ONE column prunes only that column's predicates, while a
Z-order (bit-interleaved) layout preserves locality in BOTH dimensions
at once. Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort orders are
exactly this; here it is an explicit operator whose pruning effect is
*measured* relationally (and cross-engine checkable — the interleave is
pure integer shift/mask arithmetic both engines compute identically).

``z_value`` interleaves the low ``bits`` bits of two non-negative ints:
bit i of x lands at position 2i, bit i of y at 2i+1. ``zone_maps``
buckets rows by a layout key's rank-free range (key·n_buckets /
key_space) and aggregates per-bucket min/max — a simulated file layout
+ its zone maps, entirely in DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton-interleave two non-negative int columns (low ``bits`` each).

    Σ_i ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1) — shift/mask/multiply
    only, no UDF, identical arithmetic in any engine with ``>>``/``&``.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(x.cast("long"), i).bitwiseAND(1) * (1 << (2 * i)))
        terms.append(
            F.shiftright(y.cast("long"), i).bitwiseAND(1) * (1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zone_maps(
    df: DataFrame,
    layout_key: Column,
    key_space: int,
    n_buckets: int,
    cols: dict[str, Column],
) -> DataFrame:
    """Simulate writing ``df`` ordered by ``layout_key`` into
    ``n_buckets`` equal key-range files and collect each file's zone map.

    Bucket = key·n_buckets div key_space (range partitioning by the
    layout key — what a sorted write produces), then one aggregate per
    bucket with min/max for every tracked column. Output: (bucket,
    n_rows, min_<c>, max_<c>...). No sort and no window — the bucket id
    is closed-form, so the whole simulation is one shuffle of
    (bucket, tracked cols) pairs.
    """
    b = (layout_key * n_buckets / F.lit(key_space)).cast("long").alias("bucket")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name in cols:
        aggs.append(F.min(name).alias(f"min_{name}"))
        aggs.append(F.max(name).alias(f"max_{name}"))
    return (
        df.select(b, *[c.alias(name) for name, c in cols.items()])
        .groupBy("bucket")
        .agg(*aggs)
    )

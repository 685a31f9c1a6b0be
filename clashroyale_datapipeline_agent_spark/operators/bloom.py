"""Deterministic Bloom filter — the runtime-filter / semi-join pruning
primitive, built from md5 expressions so a DuckDB oracle can replay it
bit-for-bit (same discipline as `sketches.py`).

Geometry: K=4 salted hash functions over an M=16384-position bit space.
``md5('<salt>:' || key)`` → first 4 hex digits → position in [0, 65536)
masked to M by integer modulo. The "filter" is relational: the DISTINCT
set of set-bit positions (≤ M rows, usually far fewer) — broadcast to
the probe side, where a key passes iff ALL K of its positions are set.

Why it matters at 100 TB: a semi-join against a selective dimension
normally shuffles the fact table on the join key. The Bloom form
broadcasts kilobytes of bit positions instead, filters the fact rows
map-side (no fact shuffle), and only the surviving sliver — true
matches plus a bounded false-positive fraction — reaches the exact
join. This is what engines do internally as "runtime filters" /
DPP-style pruning; here it is an explicit, checkable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"
BLOOM_K = 4
BLOOM_M = 16384


def bloom_position(value: Column, salt: int) -> Column:
    """Bit position in [0, BLOOM_M) for one salted hash of ``value``.

    First 4 hex digits of the salted md5 as a base-16 integer, modulo M
    — pure string/arithmetic expressions, replayable verbatim in DuckDB.
    """
    h = F.md5(F.concat(F.lit(f"{salt}:"), value.cast("string")))
    d = lambda i: F.instr(F.lit(HEX), F.substring(h, i, 1)) - 1  # noqa: E731
    v = d(1) * 4096 + d(2) * 256 + d(3) * 16 + d(4)
    return v % BLOOM_M


def _positions(df: DataFrame, key_col: str, k: int) -> DataFrame:
    return df.select(
        "*",
        F.explode(
            F.array(*[bloom_position(F.col(key_col), j) for j in range(k)])
        ).alias("_pos"),
    )


def bloom_build(df: DataFrame, key_col: str, k: int = BLOOM_K) -> DataFrame:
    """Build the filter: DISTINCT set-bit positions of every key.

    The distinct's partial aggregation collapses each partition to
    ≤ BLOOM_M rows before the exchange — the shuffle moves filter-sized
    state, not key-sized state.
    """
    return _positions(df.select(key_col), key_col, k).select("_pos").distinct()


def bloom_probe(
    probe: DataFrame, bits: DataFrame, key_col: str, k: int = BLOOM_K
) -> DataFrame:
    """Keep probe rows whose K positions are ALL set — map-side.

    ``bits`` (≤ BLOOM_M rows) is broadcast and the K membership tests
    are K chained broadcast LEFT SEMI joins — zero shuffles of the
    probe side, no row-identity assumptions (duplicate probe rows pass
    or fail independently). Result ⊇ true matches (Bloom filters have
    no false negatives); the false-positive slice is bounded by the
    usual (1 - e^(-kn/m))^k envelope.
    """
    out = probe
    for j in range(k):
        out = out.withColumn("_pos", bloom_position(F.col(key_col), j)).join(
            F.broadcast(bits), "_pos", "left_semi"
        )
    return out.drop("_pos")

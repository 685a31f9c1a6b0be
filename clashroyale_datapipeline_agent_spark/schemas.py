"""Explicit StructTypes for every table the engine touches (SURVEY.md §1.3).

The reference keeps schemas implicit (docstrings + defensive ``.get``:
``/root/reference/src/analytics/battle_filters.py:56-63``,
``meta_standardize.py:42-49``, ``user_analytics.py:183-191``). Here they are
declared once, enforced by Spark, and shared by readers, fixture generators
and tests. Explicit schemas also keep parquet scans prunable — inference
would read footers (or whole JSON files) on every plan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Domain: Clash Royale battle pipeline
# ---------------------------------------------------------------------------

#: One card inside a raw battlelog participant (only ``name`` is consumed —
#: ``battle_filters.py:76-86``; extra API fields are allowed and pruned).
CARD_IN_BATTLE = StructType([StructField("name", StringType(), True)])

#: One side of a raw battle (``team[0]`` / ``opponent[0]``,
#: ``battle_filters.py:65-89``).
PARTICIPANT_RAW = StructType(
    [
        StructField("tag", StringType(), True),
        StructField("name", StringType(), True),
        StructField("crowns", IntegerType(), True),
        StructField("cards", ArrayType(CARD_IN_BATTLE), True),
    ]
)

#: Raw battlelog entry (CR API shape; the minimum fields the engine reads —
#: FIXTURES.md §A1, ``battle_filters.py:10-97``).
RAW_BATTLE = StructType(
    [
        StructField("battleTime", StringType(), True),
        StructField("type", StringType(), True),
        StructField(
            "gameMode",
            StructType(
                [
                    StructField("id", LongType(), True),
                    StructField("name", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("team", ArrayType(PARTICIPANT_RAW), True),
        StructField("opponent", ArrayType(PARTICIPANT_RAW), True),
        # carried for the meta loop (which player's log this entry came from)
        StructField("player_tag", StringType(), True),
    ]
)

#: CR battleTime format, e.g. ``"20251212T093015.000Z"``
#: (``battle_filters.py:92``). The reference keeps it an opaque string and
#: relies on API ordering; we parse to TimestampType at the normalization
#: boundary so "most recent 10" is an explicit time-ordered top-k.
BATTLE_TIME_FORMAT = "yyyyMMdd'T'HHmmss.SSSX"

#: Normalized battle fact row (``battle_filters.py:56-63`` plus parsed
#: timestamp and the accumulating player_tag).
NORMALIZED_BATTLE = StructType(
    [
        StructField("battle_time", StringType(), True),
        StructField("battle_ts", TimestampType(), True),
        StructField("result", StringType(), True),  # win|loss|draw
        StructField("my_cards", ArrayType(StringType()), True),
        StructField("opp_cards", ArrayType(StringType()), True),
        StructField("mode_name", StringType(), True),
        StructField("player_tag", StringType(), True),
    ]
)

#: Card dimension row (``/root/reference/getcards.py:74-86``; 121 rows).
CARD_METADATA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), False),
        StructField("maxLevel", IntegerType(), True),
        StructField("elixir", IntegerType(), True),  # 1 null in real data
        StructField("is_big_tank", BooleanType(), True),
        StructField("is_bait_piece", BooleanType(), True),
        StructField("is_bridge_spam_piece", BooleanType(), True),
    ]
)

#: Participant-level meta row — two rows per battle, POV-flipped
#: (``meta_standardize.py:43-49``).
PARTICIPANT_ROW = StructType(
    [
        StructField("battle_time", StringType(), True),
        StructField("player_tag", StringType(), True),
        StructField("role", StringType(), False),  # "my" | "opp"
        StructField("deck_type", StringType(), True),
        StructField("result", StringType(), True),
        StructField("is_win", BooleanType(), True),
        StructField("mode_name", StringType(), True),
    ]
)

#: Leaderboard player (``players.py:6-23``; extra fields ignored).
LEADERBOARD_PLAYER = StructType(
    [
        StructField("rank", IntegerType(), True),
        StructField("tag", StringType(), True),
        StructField("name", StringType(), True),
        StructField("trophies", IntegerType(), True),
    ]
)

#: The six archetypes (``deck_type.py:26-31``); classification cascade order.
ARCHETYPES = ["Siege", "Bait", "Cycle", "Bridge Spam", "Beatdown", "Hybrid"]

#: Archetypes that must each reach MIN_GAMES_PER_TYPE in the Phase-0 stopping
#: rule (Hybrid exempt — ``meta_workflow.py:40-49``).
REQUIRED_ARCHETYPES = ["Siege", "Bait", "Cycle", "Bridge Spam", "Beatdown"]

#: Ranked-1v1 gameMode.id whitelist (``battle_filters.py:4-7``).
RANKED_1V1_MODE_IDS = [72000006, 72000464]

# ---------------------------------------------------------------------------
# Synthetic star schema (driver-generated, TESTDATA.md) — declared so scans
# never pay schema inference and tests can assert reader output exactly.
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

STAR_SCHEMA: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Multimodal (beyond-parity; BASELINE.json north star)
# ---------------------------------------------------------------------------

#: Opaque media payload + typed metadata. Decode runs behind mapInPandas;
#: partition/batch plumbing is real even where codecs are stubbed.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

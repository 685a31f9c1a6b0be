"""Battle-domain queries in the driver catalog (SURVEY.md §2 parity proof).

The reference's domain operators run on nested battle logs, which the
DuckDB oracle can't load (its views are fixed to the star schema). To put
the domain semantics — above all F1 deck classification, the top fidelity
risk — under the driver's cross-engine gate anyway, these queries derive a
deterministic battle-shaped dataset FROM the star tables with pure integer
arithmetic, identically in both engines:

    deck(o_orderkey) = [ card_names[(o_orderkey*7 + k*13) % 121] , k=0..7 ]
    result(o)        = status -> win/loss/draw

The Spark side runs the REAL production operators (``classify_deck_col``,
counter aggregations, POV flips); the oracle SQL re-implements the
classifier cascade independently (card dimension embedded as a VALUES
list, flags as IN lists) straight from the reference semantics
(``/root/reference/src/analytics/deck_type.py:38-152``). A hash match means
the production classifier agrees with an independent transcription on
~15k synthetic decks — on top of the pytest property tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.functions.cards import (
    classify_deck_col,
)
from clashroyale_datapipeline_agent_spark.operators.battle_aggs import counter_aggs
from clashroyale_datapipeline_agent_spark.plans.star_queries import _t, register
from clashroyale_datapipeline_agent_spark.sources.readers import (
    load_card_metadata_rows,
)

_ROWS = load_card_metadata_rows()
_NAMES = [r["name"] for r in _ROWS]  # fixture order = stable index base


def _names_array():
    return F.array(*[F.lit(n) for n in _NAMES])


def _deck_col(key, mult: int, offset: int):
    """8-card deck from an integer key (duplicates possible — the classifier
    counts per instance, and the SQL twin does the same)."""
    names = _names_array()
    return F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda k: F.element_at(
            names, (F.pmod(key * mult + k * 13 + offset, F.lit(121)) + 1).cast("int")
        ),
    )




def _spread(df):
    """Classification is compute-heavy per row; a single small parquet file
    arrives as ONE partition locally, serializing the whole query. Spread to
    the session's parallelism first — at cluster scale inputs are already
    multi-partition and AQE coalesces, so this is a no-op there; on one file
    it buys full-core classify throughput for a trivial row shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)

def _result_col():
    return (
        F.when(F.col("o_orderstatus") == "F", "win")
        .when(F.col("o_orderstatus") == "O", "loss")
        .otherwise("draw")
    )


def _cards_values_sql() -> str:
    rows = []
    for i, r in enumerate(_ROWS):
        name = r["name"].replace("'", "''")
        elixir = "NULL" if r["elixir"] is None else str(r["elixir"])
        rows.append(
            f"({i}, '{name}', {elixir}, {str(bool(r['is_bait_piece'])).upper()}, "
            f"{str(bool(r['is_bridge_spam_piece'])).upper()}, {str(bool(r['is_big_tank'])).upper()})"
        )
    return ",\n          ".join(rows)


def _decks_sql(mult: int, offset: int, deck_alias: str) -> str:
    """SQL CTE fragment: one row per (o_orderkey, card name) for an 8-slot
    deck derived by the shared arithmetic."""
    return f"""
        SELECT o.o_orderkey,
               c.name, c.elixir, c.is_bait, c.is_spam, c.is_tank
        FROM orders o
        JOIN (SELECT UNNEST(generate_series(0, 7)) AS k) slots ON TRUE
        JOIN cards c
          ON c.idx = CAST((o.o_orderkey * {mult} + slots.k * 13 + {offset}) % 121 AS INTEGER)
    """


def _classify_sql(deck_rel: str) -> str:
    """Classifier cascade as SQL over per-deck feature aggregates —
    independent transcription of ``deck_type.py:85-152`` (divide-by-8 avg,
    4-cheapest cycle cost, no-elixir defaults 3.0/12.0, priority order)."""
    return f"""
        SELECT o_orderkey,
               CASE
                 WHEN has_xbow OR has_mortar THEN 'Siege'
                 WHEN bait_pieces >= 3 THEN 'Bait'
                 WHEN four_cycle <= 9 THEN 'Cycle'
                 WHEN spam_count >= 2 THEN 'Bridge Spam'
                 WHEN tank_count >= 1 AND avg_elixir >= 3.5 THEN 'Beatdown'
                 ELSE 'Hybrid'
               END AS deck_type
        FROM (
            SELECT o_orderkey,
                   BOOL_OR(name = 'X-Bow')  AS has_xbow,
                   BOOL_OR(name = 'Mortar') AS has_mortar,
                   SUM(CASE WHEN is_bait THEN 1 ELSE 0 END) AS bait_pieces,
                   SUM(CASE WHEN is_spam THEN 1 ELSE 0 END) AS spam_count,
                   SUM(CASE WHEN is_tank THEN 1 ELSE 0 END) AS tank_count,
                   CASE WHEN COUNT(elixir) = 0 THEN 3.0
                        ELSE SUM(elixir) / 8.0 END          AS avg_elixir,
                   CASE WHEN COUNT(elixir) = 0 THEN 12.0
                        ELSE CAST(list_sum(list_sort(list(elixir) FILTER (elixir IS NOT NULL))[1:4]) AS DOUBLE)
                   END                                      AS four_cycle
            FROM {deck_rel} d
            GROUP BY o_orderkey
        )
    """


@register(
    "cr_classify_archetype_counts",
    f"""
    WITH cards(idx, name, elixir, is_bait, is_spam, is_tank) AS (
        VALUES
          {_cards_values_sql()}
    ),
    deck_cards AS ({_decks_sql(7, 0, 'my')}),
    classified AS ({_classify_sql('deck_cards')}),
    labeled AS (
        SELECT c.deck_type,
               CASE WHEN o.o_orderstatus = 'F' THEN 'win'
                    WHEN o.o_orderstatus = 'O' THEN 'loss'
                    ELSE 'draw' END AS result
        FROM classified c JOIN orders o ON c.o_orderkey = o.o_orderkey
    )
    SELECT deck_type,
           CAST(COUNT(*) AS BIGINT) AS games,
           CAST(SUM(CASE WHEN result = 'win'  THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           CAST(SUM(CASE WHEN result = 'loss' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
           CAST(SUM(CASE WHEN result NOT IN ('win','loss') THEN 1 ELSE 0 END) AS BIGINT) AS draws,
           ROUND(SUM(CASE WHEN result = 'win' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS win_rate
    FROM labeled
    GROUP BY deck_type
    """,
)
def cr_classify_archetype_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + A5 cross-engine: the production ``classify_deck_col`` over ~15k
    deterministic decks, counter-aggregated per archetype, vs an independent
    SQL transcription of the classifier cascade."""
    o = _spread(_t(spark, sf_dir, "orders"))
    decks = o.select(
        _deck_col(F.col("o_orderkey"), 7, 0).alias("my_cards"),
        _result_col().alias("result"),
    )
    typed = decks.select(
        classify_deck_col(F.col("my_cards")).alias("deck_type"), "result"
    )
    out = typed.groupBy("deck_type").agg(*counter_aggs())
    return out.select(
        "deck_type",
        F.col("games").cast("bigint"),
        F.col("wins").cast("bigint"),
        F.col("losses").cast("bigint"),
        F.col("draws").cast("bigint"),
        F.round("win_rate", 4).alias("win_rate"),
    )


@register(
    "cr_symmetric_matchup_matrix",
    f"""
    WITH cards(idx, name, elixir, is_bait, is_spam, is_tank) AS (
        VALUES
          {_cards_values_sql()}
    ),
    my_cards_rel AS ({_decks_sql(7, 0, 'my')}),
    opp_cards_rel AS ({_decks_sql(11, 5, 'opp')}),
    my_types AS ({_classify_sql('my_cards_rel')}),
    opp_types AS ({_classify_sql('opp_cards_rel')}),
    battles AS (
        SELECT m.deck_type AS my_type, p.deck_type AS opp_type,
               CASE WHEN o.o_orderstatus = 'F' THEN 'win'
                    WHEN o.o_orderstatus = 'O' THEN 'loss'
                    ELSE 'draw' END AS result
        FROM orders o
        JOIN my_types m  ON m.o_orderkey = o.o_orderkey
        JOIN opp_types p ON p.o_orderkey = o.o_orderkey
    ),
    doubled AS (
        SELECT my_type AS deck_type, opp_type, result FROM battles
        UNION ALL
        SELECT opp_type AS deck_type, my_type AS opp_type,
               CASE WHEN result = 'win' THEN 'loss'
                    WHEN result = 'loss' THEN 'win' ELSE result END AS result
        FROM battles
    )
    SELECT deck_type, opp_type,
           CAST(COUNT(*) AS BIGINT) AS games,
           CAST(SUM(CASE WHEN result = 'win'  THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           CAST(SUM(CASE WHEN result = 'loss' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
           CAST(SUM(CASE WHEN result NOT IN ('win','loss') THEN 1 ELSE 0 END) AS BIGINT) AS draws,
           ROUND(SUM(CASE WHEN result = 'win' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS win_rate
    FROM doubled
    GROUP BY deck_type, opp_type
    """,
)
def cr_symmetric_matchup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cross-engine on the derived battle set: REAL production operator
    (``compute_symmetric_matchups`` — classify both sides, POV-double,
    counter-agg) vs the independent SQL pipeline."""
    from clashroyale_datapipeline_agent_spark.operators.meta import (
        compute_symmetric_matchups,
    )

    o = _spread(_t(spark, sf_dir, "orders"))
    battles = o.select(
        _deck_col(F.col("o_orderkey"), 7, 0).alias("my_cards"),
        _deck_col(F.col("o_orderkey"), 11, 5).alias("opp_cards"),
        _result_col().alias("result"),
    )
    out = compute_symmetric_matchups(battles)
    return out.select(
        "deck_type",
        "opp_type",
        F.col("games").cast("bigint"),
        F.col("wins").cast("bigint"),
        F.col("losses").cast("bigint"),
        F.col("draws").cast("bigint"),
        F.round("win_rate", 4).alias("win_rate"),
    )


@register(
    "cr_exact_deck_grouping",
    f"""
    WITH cards(idx, name, elixir, is_bait, is_spam, is_tank) AS (
        VALUES
          {_cards_values_sql()}
    ),
    deck_cards AS ({_decks_sql(3, 2, 'my')}),
    decks AS (
        SELECT o_orderkey,
               md5(array_to_string(list_sort(list(name)), '|')) AS deck_key
        FROM deck_cards
        GROUP BY o_orderkey
    ),
    labeled AS (
        SELECT d.deck_key,
               CASE WHEN o.o_orderstatus = 'F' THEN 'win'
                    WHEN o.o_orderstatus = 'O' THEN 'loss'
                    ELSE 'draw' END AS result
        FROM decks d JOIN orders o ON d.o_orderkey = o.o_orderkey
    )
    SELECT deck_key,
           CAST(COUNT(*) AS BIGINT) AS games,
           CAST(SUM(CASE WHEN result = 'win' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           ROUND(SUM(CASE WHEN result = 'win' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS win_rate
    FROM labeled
    GROUP BY deck_key
    HAVING COUNT(*) >= 3
    """,
)
def cr_exact_deck_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 cross-engine: exact-deck grouping on the sorted card list
    (md5-of-joined-names as the engine-comparable key) + HAVING threshold.
    NB: the multiplier 3 shares a factor with 121's step so decks repeat —
    giving groups with games >= 3 to survive the HAVING."""
    o = _spread(_t(spark, sf_dir, "orders"))
    decks = o.select(
        F.md5(
            F.concat_ws("|", F.array_sort(_deck_col(F.col("o_orderkey"), 3, 2)))
        ).alias("deck_key"),
        _result_col().alias("result"),
    )
    games = F.count(F.lit(1))
    wins = F.sum(F.when(F.col("result") == "win", 1).otherwise(0))
    from clashroyale_datapipeline_agent_spark.functions.common import win_rate

    return (
        decks.groupBy("deck_key")
        .agg(
            games.cast("bigint").alias("games"),
            wins.cast("bigint").alias("wins"),
            F.round(win_rate(wins, games), 4).alias("win_rate"),
        )
        .filter(F.col("games") >= 3)
    )


@register(
    "cr_user_matchup_summary",
    f"""
    WITH cards(idx, name, elixir, is_bait, is_spam, is_tank) AS (
        VALUES
          {_cards_values_sql()}
    ),
    my_cards_rel AS ({_decks_sql(7, 0, 'my')}),
    opp_cards_rel AS ({_decks_sql(11, 5, 'opp')}),
    my_types AS ({_classify_sql('my_cards_rel')}),
    opp_types AS ({_classify_sql('opp_cards_rel')}),
    matchups AS (
        SELECT m.deck_type AS my_deck_type, p.deck_type AS opp_deck_type,
               CASE WHEN o.o_orderstatus = 'F' THEN 'win'
                    WHEN o.o_orderstatus = 'O' THEN 'loss'
                    ELSE 'draw' END AS result
        FROM orders o
        JOIN my_types m  ON m.o_orderkey = o.o_orderkey
        JOIN opp_types p ON p.o_orderkey = o.o_orderkey
    ),
    agg AS (
        SELECT my_deck_type, opp_deck_type,
               COUNT(*) AS games,
               SUM(CASE WHEN result = 'win'  THEN 1 ELSE 0 END) AS wins,
               SUM(CASE WHEN result = 'loss' THEN 1 ELSE 0 END) AS losses,
               SUM(CASE WHEN result NOT IN ('win','loss') THEN 1 ELSE 0 END) AS draws,
               SUM(CASE WHEN result = 'win' THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS win_rate
        FROM matchups
        GROUP BY my_deck_type, opp_deck_type
        HAVING COUNT(*) >= 10
    )
    SELECT my_deck_type, opp_deck_type,
           CAST(games AS BIGINT)  AS games,
           CAST(wins AS BIGINT)   AS wins,
           CAST(losses AS BIGINT) AS losses,
           CAST(draws AS BIGINT)  AS draws,
           ROUND(win_rate, 4)     AS win_rate,
           CASE WHEN win_rate >= 0.55 THEN 'favored'
                WHEN win_rate <= 0.45 THEN 'unfavored'
                ELSE 'even' END   AS advantage_label
    FROM agg
    """,
)
def cr_user_matchup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 + A13 + P9 cross-engine: the production user matchup-matrix
    operator (classify both sides, counter-agg, HAVING min 10) flattened
    with advantage labels via the production ``build_matchup_summary``
    rename path."""
    from clashroyale_datapipeline_agent_spark.functions.common import advantage_label
    from clashroyale_datapipeline_agent_spark.operators.battle_aggs import (
        compute_deck_type_matchups,
        with_deck_types,
    )

    o = _spread(_t(spark, sf_dir, "orders"))
    battles = o.select(
        _deck_col(F.col("o_orderkey"), 7, 0).alias("my_cards"),
        _deck_col(F.col("o_orderkey"), 11, 5).alias("opp_cards"),
        _result_col().alias("result"),
    )
    mm = compute_deck_type_matchups(with_deck_types(battles), min_games=10)
    return mm.select(
        "my_deck_type",
        "opp_deck_type",
        F.col("games").cast("bigint"),
        F.col("wins").cast("bigint"),
        F.col("losses").cast("bigint"),
        F.col("draws").cast("bigint"),
        F.round("win_rate", 4).alias("win_rate"),
        advantage_label(F.col("win_rate")).alias("advantage_label"),
    )


@register(
    "cr_user_deck_summary_reagg",
    f"""
    WITH cards(idx, name, elixir, is_bait, is_spam, is_tank) AS (
        VALUES
          {_cards_values_sql()}
    ),
    my_cards_rel AS ({_decks_sql(7, 0, 'my')}),
    opp_cards_rel AS ({_decks_sql(11, 5, 'opp')}),
    my_types AS ({_classify_sql('my_cards_rel')}),
    opp_types AS ({_classify_sql('opp_cards_rel')}),
    matchups AS (
        SELECT m.deck_type AS my_deck_type, p.deck_type AS opp_deck_type,
               CASE WHEN o.o_orderstatus = 'F' THEN 'win'
                    WHEN o.o_orderstatus = 'O' THEN 'loss'
                    ELSE 'draw' END AS result
        FROM orders o
        JOIN my_types m  ON m.o_orderkey = o.o_orderkey
        JOIN opp_types p ON p.o_orderkey = o.o_orderkey
    ),
    cell AS (
        SELECT my_deck_type, opp_deck_type,
               COUNT(*) AS games,
               SUM(CASE WHEN result = 'win'  THEN 1 ELSE 0 END) AS wins,
               SUM(CASE WHEN result = 'loss' THEN 1 ELSE 0 END) AS losses,
               SUM(CASE WHEN result NOT IN ('win','loss') THEN 1 ELSE 0 END) AS draws
        FROM matchups GROUP BY my_deck_type, opp_deck_type
    ),
    reagg AS (
        SELECT my_deck_type AS deck_type,
               SUM(games) AS games, SUM(wins) AS wins,
               SUM(losses) AS losses, SUM(draws) AS draws
        FROM cell GROUP BY my_deck_type
    )
    SELECT deck_type,
           CAST(games AS BIGINT) AS games,
           ROUND(games * 1.0 / SUM(games) OVER (), 4) AS user_share,
           CAST(wins AS BIGINT) AS wins,
           CAST(losses AS BIGINT) AS losses,
           CAST(draws AS BIGINT) AS draws,
           ROUND(CASE WHEN games > 0 THEN wins * 1.0 / games ELSE 0.0 END, 4) AS win_rate,
           games >= 20 AS sample_ok
    FROM reagg
    """,
)
def cr_user_deck_summary_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 + J5 cross-engine: the production re-aggregation of the matchup
    matrix over opponents (summed counters, share window, sample_ok flag)."""
    from clashroyale_datapipeline_agent_spark.operators.battle_aggs import (
        compute_deck_type_matchups,
        with_deck_types,
    )
    from clashroyale_datapipeline_agent_spark.operators.meta import (
        build_user_deck_summary,
    )

    o = _spread(_t(spark, sf_dir, "orders"))
    battles = o.select(
        _deck_col(F.col("o_orderkey"), 7, 0).alias("my_cards"),
        _deck_col(F.col("o_orderkey"), 11, 5).alias("opp_cards"),
        _result_col().alias("result"),
    )
    mm = compute_deck_type_matchups(with_deck_types(battles), min_games=1)
    out = build_user_deck_summary(mm, min_games_per_deck=20)
    return out.select(
        "deck_type",
        F.col("games").cast("bigint"),
        F.round("user_share", 4).alias("user_share"),
        F.col("wins").cast("bigint"),
        F.col("losses").cast("bigint"),
        F.col("draws").cast("bigint"),
        F.round("win_rate", 4).alias("win_rate"),
        "sample_ok",
    )

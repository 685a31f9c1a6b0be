"""Round-6 depth batch: entity-resolution, privacy-audit, and
evaluation-protocol queries.

The reference pipeline curates battle rows and never faces record
linkage, anonymity audits, or time-series evaluation splits; these are
beyond-parity surface a 100 TB training-data platform needs (house
rules from plans/star_queries.py apply: integer aggregates cast to
BIGINT, floats ROUNDed in both engines, total orders under every
LIMIT).

- ``dedup_sorted_neighborhood_topk`` — blocked sorted-neighborhood
  candidate generation (Hernandez & Stolfo 1995), the classic ER
  alternative to LSH banding: window-bounded fan-out instead of
  per-bucket quadratics.
- ``graph_label_propagation_rounds`` — deterministic synchronous LPA
  community detection over the doc-chain graph the k-core row uses,
  checked round-for-round by an unrolled SQL twin.
- ``customer_ldiversity_audit`` — the l-diversity companion to
  ``customer_kanonymity_audit``: k-anonymity bounds re-identification,
  l-diversity bounds attribute disclosure inside each QI group.
- ``part_fuzzy_match_blocked`` — blocked Levenshtein record linkage on
  the DISTINCT-name grain (pair fan-out bounded by name vocabulary,
  multiplicities re-applied as count products).
- ``events_rolling_origin_folds`` — rolling-origin (expanding-window)
  cross-validation folds with a warm-user leakage readout per fold.
- ``docs_zipf_slope_by_source`` — corpus-health Zipf fit; the Spark
  side demonstrates the deterministic ordered-float-reduction idiom
  (sort_array(collect_list) + F.aggregate) that removes partial-agg
  order from the float sum entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans.star_queries import _t, register

# house tokenizer, DuckDB side (≡ operators/text.tokens_col)
_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
    " x -> x != '')"
)


# ---------------------------------------------------------------------------
# entity resolution: sorted-neighborhood blocking
# ---------------------------------------------------------------------------

_SNM_SQL = f"""
    WITH base AS (
        SELECT doc_id AS id,
               list_distinct({_TOKS}) AS ts,
               substr(lower(trim(text)), 1, 24) AS sk,
               ({_TOKS})[1] AS blk
        FROM documents
    ), blk AS (
        SELECT id, ts, sk, blk FROM base
    ), led AS (
        SELECT id AS id_a, ts AS ts_a,
               lead(id, 1) OVER w AS id_b1, lead(ts, 1) OVER w AS ts_b1,
               lead(id, 2) OVER w AS id_b2, lead(ts, 2) OVER w AS ts_b2
        FROM blk
        WINDOW w AS (PARTITION BY blk ORDER BY sk, id)
    ), pairs AS (
        SELECT id_a, id_b1 AS id_b, ts_a, ts_b1 AS ts_b
        FROM led WHERE id_b1 IS NOT NULL
        UNION ALL
        SELECT id_a, id_b2, ts_a, ts_b2
        FROM led WHERE id_b2 IS NOT NULL
    ), canon AS (
        SELECT DISTINCT
               LEAST(id_a, id_b) AS id_a,
               GREATEST(id_a, id_b) AS id_b,
               ROUND(
                   CAST(len(list_intersect(ts_a, ts_b)) AS DOUBLE)
                   / (len(ts_a) + len(ts_b) - len(list_intersect(ts_a, ts_b))),
                   4
               ) AS jaccard
        FROM pairs
    )
    SELECT id_a, id_b, jaccard
    FROM canon
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 15
"""


@register("dedup_sorted_neighborhood_topk", _SNM_SQL)
def dedup_sorted_neighborhood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 sorted-neighborhood candidate pairs by exact token-set
    Jaccard (``operators/dedup.py:sorted_neighborhood_pairs``, window
    3). The ER contrast to the LSH rows: fan-out is (window-1) pairs
    per record BY CONSTRUCTION — a mega-cluster of m near-identical
    docs emits O(m·w) candidates where an uncapped LSH bucket emits
    O(m²) (the failure mode ``lsh_candidate_pairs`` needed a
    ``max_bucket`` divert for). Plan shape: one block-partitioned
    window sort (never a global single-partition window), lead()
    carrying the neighbor's token array so the Jaccard verify touches
    no second corpus scan, TakeOrderedAndProject for the top-k."""
    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return (
        sorted_neighborhood_pairs(d, window=3)
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# graph: synchronous label propagation (community detection)
# ---------------------------------------------------------------------------

def _lpa_sql() -> str:
    rounds = []
    prev = "l0"
    for i in (1, 2, 3):
        rounds.append(f"""
    c{i} AS (
        SELECT s.u AS id, l.label, COUNT(*) AS c
        FROM sym s JOIN {prev} l ON s.v = l.id
        GROUP BY s.u, l.label
    ), l{i} AS (
        SELECT id, label FROM (
            SELECT id, label,
                   row_number() OVER (
                       PARTITION BY id ORDER BY c DESC, label ASC
                   ) AS rn
            FROM c{i}
        ) WHERE rn = 1
    ), ch{i} AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM l{i} n
        JOIN {prev} o ON n.id = o.id AND n.label != o.label
    )""")
        prev = f"l{i}"
    selects = " UNION ALL ".join(
        f"SELECT {i} AS round, (SELECT n FROM ch{i}) AS n_changed,"
        f" (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM l{i}) AS n_labels"
        for i in (1, 2, 3)
    )
    return f"""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        UNION
        SELECT a.doc_id, b.doc_id
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 2
        UNION
        SELECT a.doc_id, b.doc_id
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 3 AND a.doc_id % 3 = 0
    ),
    sym AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    l0 AS (SELECT DISTINCT u AS id, u AS label FROM sym),{",".join(rounds)}
    SELECT * FROM ({selects}) ORDER BY round
    """


@register("graph_label_propagation_rounds", _lpa_sql())
def graph_label_propagation_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous label-propagation rounds
    (``operators/graph.py:label_propagation``) over the deterministic
    doc-chain graph shared with ``graph_kcore_peel_rounds``: per round,
    how many vertices changed label and how many communities remain.
    LPA is the cheap community detector that follows the k-core density
    filter in an interaction-graph pipeline; the deterministic
    (count DESC, label ASC) tie-break is what makes a fully unrolled
    SQL twin possible where the literature's randomized-order LPA is
    unverifiable. Iterative discipline as everywhere: per-round
    localCheckpoint, one dst-shuffle of the edge list per round."""
    from clashroyale_datapipeline_agent_spark.operators.graph import (
        label_propagation,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = d.alias("a"), d.alias("b")

    def chain(k: int, every_third: bool = False) -> DataFrame:
        cond = F.col("b.doc_id") == F.col("a.doc_id") + k
        if every_third:
            cond = cond & (F.col("a.doc_id") % 3 == 0)
        return a.join(b, cond).select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )

    edges = chain(1).unionAll(chain(2)).unionAll(chain(3, every_third=True))
    trail = label_propagation(edges, rounds=3)
    parts = []
    for i, (labels, changed) in enumerate(trail, start=1):
        parts.append(
            labels.agg(
                F.countDistinct("label").cast("bigint").alias("n_labels")
            ).select(
                F.lit(i).alias("round"),
                F.lit(changed).cast("bigint").alias("n_changed"),
                "n_labels",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# privacy: l-diversity audit
# ---------------------------------------------------------------------------

_LDIV_SQL = """
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS n,
               COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)) AS l
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT l AS l_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n) AS BIGINT) AS n_customers,
           CAST(MIN(n) AS BIGINT) AS min_group_size
    FROM g
    GROUP BY l
    ORDER BY l
"""


@register("customer_ldiversity_audit", _LDIV_SQL)
def customer_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity histogram over the quasi-identifier groups
    of ``customer_kanonymity_audit`` (nation × market segment), with
    the sensitive attribute bucketed to $1000 account-balance bands:
    for each l, how many QI groups expose exactly l distinct sensitive
    values and how many customers sit in them. k-anonymity alone
    permits a group where every member shares one balance band (full
    attribute disclosure); this is the audit that catches it. Two
    bounded hash aggs, no joins; the distinct-count shuffles at
    (QI, band) width."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
        ).alias("l"),
    )
    return (
        g.groupBy(F.col("l").alias("l_distinct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_customers"),
            F.min("n").cast("bigint").alias("min_group_size"),
        )
        .orderBy("l_distinct")
    )


# ---------------------------------------------------------------------------
# entity resolution: blocked Levenshtein linkage
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
    WITH names AS (
        SELECT p_name AS name, split_part(p_name, ' ', 2) AS noun,
               COUNT(*) AS n
        FROM part
        GROUP BY p_name, split_part(p_name, ' ', 2)
    ), pairs AS (
        SELECT a.noun, a.n AS na, b.n AS nb,
               levenshtein(a.name, b.name) AS dist
        FROM names a JOIN names b
          ON a.noun = b.noun AND a.name < b.name
    )
    SELECT noun,
           CAST(COUNT(*) AS BIGINT) AS n_name_pairs,
           CAST(SUM(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
           CAST(SUM(CASE WHEN dist <= 3 THEN na * nb ELSE 0 END) AS BIGINT)
               AS n_part_pairs,
           CAST(MIN(dist) AS BIGINT) AS min_dist
    FROM pairs
    GROUP BY noun
    ORDER BY noun
"""


@register("part_fuzzy_match_blocked", _FUZZY_SQL)
def part_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: within each block (the part-name
    noun), Levenshtein-compare DISTINCT names and count close pairs
    (edit distance ≤ 3), re-applying row multiplicities as count
    products. The grain is the point: linking distinct NAMES instead
    of rows bounds the pair join by the name vocabulary (|V|² per
    block) while the count-product recovers the row-level pair total —
    at 100 TB the name table is millions where the row table is
    trillions. ``F.levenshtein`` is JVM codegen (no UDF); blocking key
    granularity is the fan-out dial, same contract as the LSH band
    count."""
    p = _t(spark, sf_dir, "part")
    names = (
        p.select(
            F.col("p_name").alias("name"),
            F.get(F.split(F.col("p_name"), " "), 1).alias("noun"),
        )
        .groupBy("name", "noun")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(
        b,
        (F.col("a.noun") == F.col("b.noun")) & (F.col("a.name") < F.col("b.name")),
    ).select(
        F.col("a.noun").alias("noun"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
        F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
    )
    close = F.when(F.col("dist") <= 3, 1).otherwise(0)
    return (
        pairs.groupBy("noun")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_name_pairs"),
            F.sum(close).cast("bigint").alias("n_close"),
            F.sum(
                F.when(F.col("dist") <= 3, F.col("na") * F.col("nb")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_part_pairs"),
            F.min("dist").cast("bigint").alias("min_dist"),
        )
        .orderBy("noun")
    )


# ---------------------------------------------------------------------------
# evaluation protocol: rolling-origin CV folds
# ---------------------------------------------------------------------------

_ROLLING_SQL = """
    WITH b AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ), s AS (
        SELECT e.user_id,
               CAST(FLOOR(
                   (epoch_us(e.ts) - b.lo) * 5.0 / (b.hi - b.lo + 1)
               ) AS BIGINT) AS slice
        FROM events e, b
    ), us AS (
        SELECT DISTINCT user_id, slice FROM s
    ), mins AS (
        SELECT user_id, MIN(slice) AS ms FROM us GROUP BY user_id
    ), slice_counts AS (
        SELECT slice, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY slice
    ), agg AS (
        SELECT fold, n_train, n_test FROM (
            SELECT slice AS fold,
                   CAST(SUM(n) OVER (
                       ORDER BY slice
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n AS BIGINT) AS n_train,
                   n AS n_test
            FROM slice_counts
        ) WHERE fold BETWEEN 1 AND 4
    ), leak AS (
        SELECT u.slice AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_test_users,
               CAST(SUM(CASE WHEN m.ms < u.slice THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_warm_users
        FROM us u JOIN mins m USING (user_id)
        WHERE u.slice BETWEEN 1 AND 4
        GROUP BY u.slice
    )
    SELECT a.fold, a.n_train, a.n_test, l.n_test_users, l.n_warm_users
    FROM agg a JOIN leak l ON a.fold = l.fold
    ORDER BY a.fold
"""


@register("events_rolling_origin_folds", _ROLLING_SQL)
def events_rolling_origin_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation folds — the
    time-series counterpart of ``docs_leakage_safe_split_counts``: the
    event-time range splits into 5 equal slices; fold i trains on
    slices < i and tests on slice i. Per fold: train/test row counts,
    test-fold user count, and the WARM-user count (test users with
    train-period history) — the leakage readout that decides whether a
    per-user model is evaluating generalization or memorization. Slice
    assignment is closed-form integer-epoch arithmetic from the global
    (min, max) — a 1-row broadcast scalar combine, NOT a global-window
    ntile, so nothing funnels through one partition at 100 TB; the only
    unpartitioned window runs over the 5-row slice-count table (bounded
    by the fold constant, not the data)."""
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    s = ev.crossJoin(F.broadcast(b)).select(
        "user_id",
        F.floor(
            (F.unix_micros("ts") - F.col("lo"))
            * 5.0
            / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("bigint")
        .alias("slice"),
    )
    us = s.select("user_id", "slice").distinct()
    mins = us.groupBy("user_id").agg(F.min("slice").alias("ms"))
    slice_counts = s.groupBy("slice").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window as W

    cum = F.sum("n").over(
        W.orderBy("slice").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    agg = (
        slice_counts.select(
            F.col("slice").alias("fold"),
            (cum - F.col("n")).cast("bigint").alias("n_train"),
            F.col("n").alias("n_test"),
        )
        .filter(F.col("fold").between(1, 4))
    )
    leak = (
        us.join(mins, "user_id")
        .filter(F.col("slice").between(1, 4))
        .groupBy(F.col("slice").alias("fold"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test_users"),
            F.sum(F.when(F.col("ms") < F.col("slice"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_warm_users"),
        )
    )
    return agg.join(leak, "fold").orderBy("fold")


# ---------------------------------------------------------------------------
# corpus health: Zipf slope per source
# ---------------------------------------------------------------------------

_ZIPF_SQL = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS w FROM documents
    ), wc AS (
        SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w
    ), rk AS (
        SELECT source, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, w ASC
               ) AS r
        FROM wc
    ), top AS (
        SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        FROM rk WHERE r <= 100
    ), s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM top GROUP BY source
    )
    SELECT source, n AS n_words,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
    FROM s
    ORDER BY source
"""


@register("docs_zipf_slope_by_source", _ZIPF_SQL)
def docs_zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-law fit — OLS slope of ln(count) on ln(rank)
    over each source's top-100 words (rank ties broken alphabetically
    so both engines rank identically). Natural corpora sit near -1;
    template/boilerplate spam flattens the curve, so the slope is a
    cheap source-level quality gate next to ``docs_source_gini_balance``.

    Determinism note: the regression sums are floats over ln() values —
    the flake class the determinism memory flags — so the Spark side
    uses the ordered-reduction idiom: per source,
    sort_array(collect_list(struct(rank, x, y))) then one sequential
    F.aggregate, which removes partial-aggregation merge order from the
    sum entirely (the array is ≤100 elements per group — bounded, never
    a corpus-width collect). Cross-engine last-ulp noise vs DuckDB's
    plain SUM is absorbed by ROUND(…, 4)."""
    from clashroyale_datapipeline_agent_spark.plans.text_queries import _toks

    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select(
            "source",
            F.explode(_toks(F.lower(F.trim(F.col("text"))))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window as W

    rk = wc.select(
        "source",
        "c",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.desc("c"), F.asc("w")))
        .alias("r"),
    ).filter(F.col("r") <= 100)
    top = rk.select(
        "source",
        F.col("r").alias("r"),
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    arr = top.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("r", "x", "y"))).alias("pts")
    )
    zero = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    acc = F.aggregate(
        F.col("pts"),
        zero,
        lambda a, p: F.struct(
            (a.sx + p.x).alias("sx"),
            (a.sy + p.y).alias("sy"),
            (a.sxy + p.x * p.y).alias("sxy"),
            (a.sxx + p.x * p.x).alias("sxx"),
        ),
    )
    n = F.size("pts").cast("bigint")
    out = arr.select(
        "source",
        n.alias("n_words"),
        acc.alias("a"),
    ).select(
        "source",
        "n_words",
        F.round(
            (F.col("n_words") * F.col("a.sxy") - F.col("a.sx") * F.col("a.sy"))
            / (
                F.col("n_words") * F.col("a.sxx")
                - F.col("a.sx") * F.col("a.sx")
            ),
            4,
        ).alias("zipf_slope"),
    )
    return out.orderBy("source")

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
               CASE
                   WHEN len(ts_a) + len(ts_b)
                        - len(list_intersect(ts_a, ts_b)) > 0
                   THEN ROUND(
                       CAST(len(list_intersect(ts_a, ts_b)) AS DOUBLE)
                       / (len(ts_a) + len(ts_b)
                          - len(list_intersect(ts_a, ts_b))),
                       4
                   )
                   ELSE 0.0
               END AS jaccard
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
    plain SUM is absorbed by ROUND(…, 4).

    Tokenizer: ``operators/text.tokens_col`` (trim + split ``\\s+`` +
    drop empties) — the house tokenizer this module's ``_TOKS`` DuckDB
    twin mirrors. Do NOT use ``text_queries``'s literal-space splitter
    here: it diverges on tabs/newlines/space-runs (round-6 red gate,
    ``test_tokenization_parity.py``)."""
    from clashroyale_datapipeline_agent_spark.operators.text import tokens_col

    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select(
            "source",
            F.explode(tokens_col(F.lower(F.col("text")))).alias("w"),
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


# ---------------------------------------------------------------------------
# clustering quality: simplified silhouette per label
# ---------------------------------------------------------------------------

_SILHOUETTE_SQL = """
    WITH v AS (
        SELECT vec_id, label, embedding FROM embeddings
    ), dims AS (
        SELECT unnest(generate_series(1, 64)) AS i
    ), pe AS (
        SELECT vec_id, label, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
                   AS vq
        FROM v, dims
    ), cent AS (
        SELECT label AS clabel, i, SUM(vq) AS s, COUNT(*) AS n
        FROM pe GROUP BY label, i
    ), csum AS (
        SELECT clabel, SUM(CAST(s AS HUGEINT) * s) AS sc2, MIN(n) AS n
        FROM cent GROUP BY clabel
    ), vsum AS (
        SELECT vec_id, label AS own, SUM(vq * vq) AS sv2 FROM pe
        GROUP BY vec_id, label
    ), cross_t AS (
        SELECT pe.vec_id, c.clabel, SUM(CAST(pe.vq AS HUGEINT) * c.s) AS cr
        FROM pe JOIN cent c ON pe.i = c.i
        GROUP BY pe.vec_id, c.clabel
    ), d AS (
        SELECT v.vec_id, v.own, x.clabel,
               sqrt(GREATEST(
                   v.sv2 / 1e12
                   - 2.0 * x.cr / (s.n * 1e12)
                   + s.sc2 / (s.n * s.n * 1e12),
                   0.0
               )) AS dist
        FROM vsum v
        JOIN cross_t x ON v.vec_id = x.vec_id
        JOIN csum s ON x.clabel = s.clabel
    ), sil AS (
        SELECT vec_id, own,
               MAX(CASE WHEN clabel = own THEN dist END) AS a,
               MIN(CASE WHEN clabel != own THEN dist END) AS b
        FROM d GROUP BY vec_id, own
    ), s6 AS (
        SELECT own AS label,
               CASE WHEN GREATEST(a, b) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(ROUND(1000000.0 * (b - a) / GREATEST(a, b))
                              AS BIGINT)
               END AS s6
        FROM sil
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(SUM(s6) / (COUNT(*) * 1000000.0), 4) AS mean_silhouette
    FROM s6
    GROUP BY label
    ORDER BY label
"""


@register("embeddings_silhouette_by_label", _SILHOUETTE_SQL)
def embeddings_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (centroid-based; Hruschka et al. 2004) per
    label: a = distance to own-label centroid, b = nearest other-label
    centroid, s = (b-a)/max(a,b) — the clustering-quality readout that
    decides whether the label/cluster column is trustworthy enough to
    drive SemDeDup-style per-cluster dedup. Centroid distances replace
    the O(n²) pairwise silhouette, so cost is n_vecs × n_labels — the
    label count is the bounded dial.

    Determinism is the engineered part: element values integer-scale to
    1e-6 BIGINTs and EVERY aggregation is an exact sum — the squared
    distance expands as d² = Σv²/1e12 − 2·(v·S)/(n·1e12)
    + ΣS²/(n²·1e12) where Σv² is a BIGINT sum (vq² ≤ 4e12, never
    overflows) and v·S / ΣS² are DECIMAL sums of DECIMAL products:
    s = Σvq can reach n·2e6, so s² would wrap int64 silently (non-ANSI
    Spark) for clusters past ~10⁵ vectors. Computing the products as
    decimal(18,0)×decimal(18,0) → decimal(37,0) and summing to
    decimal(38,0) keeps exactness (hence order-freeness) to ~5e11
    vectors per label — DuckDB's HUGEINT sum is the 128-bit twin. The
    scale division happens exactly once, in double, on exact inputs;
    the per-label mean then sums integer-scaled silhouettes. No float
    partial-agg merge order anywhere, despite three layers of float
    math — and no per-vector array rebuild (the first version
    collect_list-ed 64 structs per (vec, centroid) for an ordered
    reduce; the expansion makes that whole stage a hash agg).

    Plan shape: one (label, dim) shuffle for centroids (bounded:
    labels × 64 rows), broadcast-hash-joined back on the dim key (an
    equi-join, not a cartesian) for the cross term, one (vec, label)
    reduce, one label rollup."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("val").cast("double") * 1000000.0)
        .cast("bigint")
        .alias("vq"),
    )
    cent = pe.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("vq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    s_dec = F.col("s").cast("decimal(18,0)")
    csum = cent.groupBy("clabel").agg(
        F.sum(s_dec * s_dec).alias("sc2"), F.min("n").alias("n")
    )
    vsum = pe.groupBy("vec_id", F.col("label").alias("own")).agg(
        F.sum(F.col("vq") * F.col("vq")).alias("sv2")
    )
    cross_t = (
        pe.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "clabel")
        .agg(F.sum(F.col("vq").cast("decimal(18,0)") * s_dec).alias("cr"))
    )
    d2 = (
        F.col("sv2") / 1e12
        - 2.0 * F.col("cr").cast("double") / (F.col("n") * 1e12)
        + F.col("sc2").cast("double") / (F.col("n") * F.col("n") * 1e12)
    )
    d = (
        vsum.join(cross_t, "vec_id")
        .join(F.broadcast(csum), "clabel")
        .select(
            "vec_id",
            "own",
            "clabel",
            F.sqrt(F.greatest(d2, F.lit(0.0))).alias("dist"),
        )
    )
    sil = d.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("clabel") == F.col("own"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("own"), F.col("dist"))).alias("b"),
    )
    s6 = sil.select(
        F.col("own").alias("label"),
        F.when(F.greatest("a", "b") == 0, F.lit(0))
        .otherwise(
            F.round(
                1000000.0 * (F.col("b") - F.col("a")) / F.greatest("a", "b")
            )
        )
        .cast("bigint")
        .alias("s6"),
    )
    return (
        s6.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum("s6") / (F.count(F.lit(1)) * 1000000.0), 4
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# sketches: relational Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

_MG_SQL = """
    WITH c AS (
        SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) AS bucket,
               user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), rk AS (
        SELECT bucket, user_id, c,
               row_number() OVER (
                   PARTITION BY bucket ORDER BY c DESC, user_id ASC
               ) AS rn
        FROM c
    ), thresh AS (
        SELECT bucket,
               COALESCE(MAX(CASE WHEN rn = 6 THEN c END), 0) AS t
        FROM rk GROUP BY bucket
    ), est AS (
        SELECT r.user_id, r.c - t.t AS est
        FROM rk r JOIN thresh t ON r.bucket = t.bucket
        WHERE r.rn <= 5 AND r.c > t.t
    ), exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_c
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, CAST(e.est AS BIGINT) AS est,
           x.exact_c,
           CAST(x.exact_c - e.est AS BIGINT) AS underestimate
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.est DESC, e.user_id ASC
    LIMIT 10
"""


@register("events_mg_heavy_hitters", _MG_SQL)
def events_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries / SpaceSaving-style heavy hitters as a RELATIONAL
    summary: users hash into 16 md5 buckets; each bucket keeps only its
    top-5 counts minus the 6th-largest (the MG decrement in closed
    form over a counted batch), giving the classic deterministic
    UNDERESTIMATE with per-bucket error ≤ n_bucket/6. The audit joins
    exact counts back so the error is measured, not assumed — the
    deterministic-bound sibling of the probabilistic CMS row
    (``cms_user_topk_estimate``).

    Scale: summary state is buckets × k entries regardless of key
    cardinality — the shape that survives when the key domain (users,
    n-grams) outgrows memory: one (bucket, key) count shuffle, one
    bucket-partitioned window over ≤ per-bucket distinct keys, one
    broadcast-size result. At 100 TB buckets map to shuffle partitions
    and k is the memory dial."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    c = (
        ev.select(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).alias(
                "bucket"
            ),
            "user_id",
        )
        .groupBy("bucket", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    rk = c.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("bucket").orderBy(F.desc("c"), F.asc("user_id"))
        ),
    )
    thresh = rk.groupBy("bucket").agg(
        F.coalesce(F.max(F.when(F.col("rn") == 6, F.col("c"))), F.lit(0)).alias(
            "t"
        )
    )
    est = (
        rk.join(thresh, "bucket")
        .filter((F.col("rn") <= 5) & (F.col("c") > F.col("t")))
        .select("user_id", (F.col("c") - F.col("t")).cast("bigint").alias("est"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_c")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est",
            "exact_c",
            (F.col("exact_c") - F.col("est")).cast("bigint").alias("underestimate"),
        )
        .orderBy(F.desc("est"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# matched controls: sort-merge nearest-length pairing
# ---------------------------------------------------------------------------

_MATCHED_SQL = """
    WITH pool AS (
        SELECT doc_id, n_chars, source,
               CAST(n_chars // 128 AS BIGINT) AS bucket,
               (source = 'src1') AS is_ctl
        FROM documents
        WHERE source IN ('src0', 'src1')
    ), w AS (
        SELECT doc_id, n_chars, source, is_ctl,
               last_value(CASE WHEN is_ctl THEN doc_id END IGNORE NULLS)
                   OVER prev AS prev_id,
               last_value(CASE WHEN is_ctl THEN n_chars END IGNORE NULLS)
                   OVER prev AS prev_chars,
               first_value(CASE WHEN is_ctl THEN doc_id END IGNORE NULLS)
                   OVER nxt AS next_id,
               first_value(CASE WHEN is_ctl THEN n_chars END IGNORE NULLS)
                   OVER nxt AS next_chars
        FROM pool
        WINDOW prev AS (
            PARTITION BY bucket ORDER BY n_chars, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), nxt AS (
            PARTITION BY bucket ORDER BY n_chars, doc_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
        )
    ), m AS (
        SELECT doc_id, n_chars,
               CASE
                   WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
                   WHEN next_id IS NULL THEN prev_id
                   WHEN prev_id IS NULL THEN next_id
                   WHEN n_chars - prev_chars <= next_chars - n_chars
                       THEN prev_id
                   ELSE next_id
               END AS ctl_id,
               CASE
                   WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
                   WHEN next_id IS NULL THEN n_chars - prev_chars
                   WHEN prev_id IS NULL THEN next_chars - n_chars
                   WHEN n_chars - prev_chars <= next_chars - n_chars
                       THEN n_chars - prev_chars
                   ELSE next_chars - n_chars
               END AS gap
        FROM w WHERE NOT is_ctl
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           CAST(COUNT(ctl_id) AS BIGINT) AS n_matched,
           CAST(COUNT(*) - COUNT(ctl_id) AS BIGINT) AS n_unmatched,
           CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap,
           CAST(COUNT(DISTINCT ctl_id) AS BIGINT) AS n_distinct_controls
    FROM m
"""


@register("docs_length_matched_pairs", _MATCHED_SQL)
def docs_length_matched_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-control selection on one covariate (document length):
    every src0 doc pairs with its nearest-length src1 doc — the
    matched-sampling step behind controlled A/B corpus evaluations
    ("does source X docs of the SAME length score worse?"). Greedy
    1-NN on a sorted axis needs only the last-control-before and
    first-control-after each treated row, so the whole match is ONE
    block-partitioned window pass over the union — no pair join, no
    k-NN index. Matching is with replacement (a control can serve many
    treated docs; n_distinct_controls reports the reuse).

    Scale: partition by coarse length bucket (the dial; misses only at
    bucket boundaries, the same trade as the sorted-neighborhood
    blocks), sort within bucket — one range shuffle. Ties break on
    doc_id and equal gaps prefer the earlier control, so both engines
    pick identical partners."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    pool = d.filter(F.col("source").isin("src0", "src1")).select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") / 128).cast("bigint").alias("bucket"),
        (F.col("source") == "src1").alias("is_ctl"),
    )
    order = [F.col("n_chars").asc(), F.col("doc_id").asc()]
    prev_w = (
        W.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    next_w = (
        W.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(1, W.unboundedFollowing)
    )
    ctl = lambda col: F.when(F.col("is_ctl"), F.col(col))  # noqa: E731
    w = pool.select(
        "doc_id",
        "n_chars",
        "is_ctl",
        F.last(ctl("doc_id"), ignorenulls=True).over(prev_w).alias("prev_id"),
        F.last(ctl("n_chars"), ignorenulls=True).over(prev_w).alias("prev_chars"),
        F.first(ctl("doc_id"), ignorenulls=True).over(next_w).alias("next_id"),
        F.first(ctl("n_chars"), ignorenulls=True).over(next_w).alias("next_chars"),
    ).filter(~F.col("is_ctl"))
    prev_gap = F.col("n_chars") - F.col("prev_chars")
    next_gap = F.col("next_chars") - F.col("n_chars")
    both_null = F.col("prev_id").isNull() & F.col("next_id").isNull()
    use_prev = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (prev_gap <= next_gap)
    )
    m = w.select(
        F.when(both_null, F.lit(None))
        .when(use_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("ctl_id"),
        F.when(both_null, F.lit(None))
        .when(use_prev, prev_gap)
        .otherwise(next_gap)
        .alias("gap"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated"),
        F.count("ctl_id").cast("bigint").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("ctl_id")).cast("bigint").alias("n_unmatched"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("bigint").alias("sum_gap"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("bigint").alias("max_gap"),
        F.countDistinct("ctl_id").cast("bigint").alias("n_distinct_controls"),
    )


# ---------------------------------------------------------------------------
# feature hashing: collision audit at candidate dimensionalities
# ---------------------------------------------------------------------------

_HEXP = "'0123456789abcdef'"

_FHASH_SQL = f"""
    WITH toks AS (
        SELECT {_TOKS} AS ts FROM documents
    ), bi AS (
        SELECT DISTINCT pair[1] || ' ' || pair[2] AS g
        FROM (
            SELECT unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS pair
            FROM toks WHERE len(ts) >= 2
        )
    ), h AS (
        SELECT g,
               (strpos({_HEXP}, substr(md5(g), 1, 1)) - 1) * 256
               + (strpos({_HEXP}, substr(md5(g), 2, 1)) - 1) * 16
               + (strpos({_HEXP}, substr(md5(g), 3, 1)) - 1) AS h12
        FROM bi
    ), g AS (
        SELECT d.dim,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS n_features,
               CAST(COUNT(DISTINCT h12 % d.dim) AS BIGINT) AS n_buckets_used
        FROM h CROSS JOIN (SELECT unnest([256, 1024, 4096]) AS dim) d
        GROUP BY d.dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n_features, n_buckets_used,
           ROUND(1.0 - CAST(n_buckets_used AS DOUBLE) / n_features, 4)
               AS collision_frac
    FROM g
    ORDER BY dim
"""


@register("docs_feature_hash_collisions", _FHASH_SQL)
def docs_feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick dimensionality audit: distinct word-bigram features
    hash (md5, first 12 bits — replayable cross-engine) into candidate
    vectorizer widths 256/1024/4096; collision_frac = 1 - buckets/features
    is the capacity readout that picks the hashing-vectorizer width
    before training a linear quality classifier over the corpus.

    Scale: ONE distinct-feature shuffle (vocabulary-bounded — the corpus
    row count never reaches the audit), then a 3-way explode of the dim
    grid on the already-distinct feature table; everything downstream of
    the distinct is bounded by vocabulary × |grid|. Exact integers plus
    one rounded ratio of exact integers."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != ""
        ).alias("ts")
    )
    n = F.size("ts")
    bi = (
        toks.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, n - 1).alias("w1"),
                    F.slice("ts", 2, n - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(
            F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("g")
        )
        .distinct()
    )
    h = bi.select(
        "g",
        F.conv(F.substring(F.md5("g"), 1, 3), 16, 10)
        .cast("bigint")
        .alias("h12"),
    )
    grid = h.select(
        "g", "h12", F.explode(F.array(F.lit(256), F.lit(1024), F.lit(4096))).alias("dim")
    )
    g = grid.groupBy("dim").agg(
        F.countDistinct("g").cast("bigint").alias("n_features"),
        F.countDistinct(F.col("h12") % F.col("dim"))
        .cast("bigint")
        .alias("n_buckets_used"),
    )
    return g.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n_features",
        "n_buckets_used",
        F.round(
            1.0 - F.col("n_buckets_used").cast("double") / F.col("n_features"), 4
        ).alias("collision_frac"),
    ).orderBy("dim")

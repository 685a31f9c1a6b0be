"""Round-7 wave: distribution-drift tests, data-quality forensics, and
the privacy-audit completion (k-anonymity → l-diversity → t-closeness).

A 100 TB training-data pipeline is a *process*, and these queries are the
process-control instruments: two-sample tests for "did this cohort's
distribution move" (KS), sequential changepoint detection for "when did
the feed drift" (CUSUM), digit-law forensics for "is this numeric column
synthetic/tampered" (Benford), corpus drift at the source grain
(Jensen-Shannon divergence), LM-based fluency scoring at the source
grain (add-one bigram surprisal), and the third leg of the privacy-audit
stool (t-closeness over the same QI groups k-anonymity and l-diversity
use).

House determinism discipline (the flake class is float SUM/AVG under
partial-aggregation merge order — see SCALE.md "Float-ROUND ledger"):

- cross-row float sums are either (a) exact integer/decimal sums of
  integer-scaled terms (JSD, surprisal, t-closeness, KS numerator), or
  (b) sequential WINDOW running sums over a BOUNDED ordered frame
  (CUSUM's 30-day series, Benford's 9 digits, KS's 50 bins) — window
  running aggregates evaluate in frame order in both engines, so they
  are order-fixed by construction, unlike groupBy sums;
- every division happens once, on exact inputs (IEEE division is
  correctly rounded, hence identical cross-engine);
- ln/log10 may differ in the last ulp between libm and the JVM; every
  ln-consuming term is integer-scaled with ≥5 orders of headroom before
  its exact sum, so a 1-ulp input wiggle cannot move the scaled int.

No reference counterpart: the reference pipeline
(``/root/reference/src``) has no statistical process control at all —
these exist for the 100 TB curation story, not parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.text import tokens_col
from clashroyale_datapipeline_agent_spark.plans.star_queries import _t, register

#: house tokenizer, DuckDB side (≡ operators/text.tokens_col — regex \s+,
#: NOT text_queries._toks_space's literal space)
_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
    " x -> x != '')"
)


# ---------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov (binned) between event cohorts
# ---------------------------------------------------------------------------

_KS_SQL = """
    WITH binned AS (
        SELECT LEAST(CAST(FLOOR(GREATEST(value, 0.0) / 10.0) AS BIGINT), 49)
                   AS bin,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ), cum AS (
        SELECT bin,
               SUM(na) OVER (ORDER BY bin) AS ca,
               SUM(nb) OVER (ORDER BY bin) AS cb,
               SUM(na) OVER () AS tot_a,
               SUM(nb) OVER () AS tot_b
        FROM binned
    ), stat AS (
        SELECT MAX(tot_a) AS n_a, MAX(tot_b) AS n_b,
               MAX(ABS(CAST(ca AS HUGEINT) * tot_b
                       - CAST(cb AS HUGEINT) * tot_a)) AS num
        FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6)
               AS ks_stat,
           ROUND(1.358 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b)), 6)
               AS ks_crit_05,
           CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)
               > 1.358 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b))
               AS reject_h0
    FROM stat
"""


@register("events_ks_binned_two_sample", _KS_SQL)
def events_ks_binned_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the ``purchase`` and
    ``click`` value distributions, on a FIXED 50-bin grid (width-10
    bins, top-clamped): KS = sup |F̂_a − F̂_b| evaluated at bin edges.
    The binning is the scale move — exact KS needs a global sort of
    both samples, while binned KS is one hash agg over the scan plus a
    50-row epilogue, and the bin grid bounds the understatement of the
    sup (sup over a coarser partition is a lower bound; the audit's
    drift alarm stays one-sided).

    Determinism: per-bin counts are exact ints; the CDFs come from a
    running window sum over ≤50 ordered rows (sequential, order-fixed
    in both engines — explicitly NOT a groupBy float sum); the sup is
    maximized on the exact integer cross product |ca·Nb − cb·Na| (as
    decimal/HUGEINT so ~1e12-row cohorts cannot wrap int64) and
    divided by Na·Nb exactly once. The single-partition window is
    bounded at 50 rows BY CONSTRUCTION (post-aggregation grain), not
    corpus-width. Rejection threshold is the asymptotic two-sided
    α=0.05 critical value c(α)·sqrt((n_a+n_b)/(n_a·n_b)), c=1.358."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    binned = e.groupBy(
        F.least(
            F.floor(F.greatest(F.col("value"), F.lit(0.0)) / 10.0).cast("bigint"),
            F.lit(49).cast("bigint"),
        ).alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    w_run = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = binned.select(
        "bin",
        F.sum("na").over(w_run).alias("ca"),
        F.sum("nb").over(w_run).alias("cb"),
        F.sum("na").over(w_all).alias("tot_a"),
        F.sum("nb").over(w_all).alias("tot_b"),
    )
    stat = cum.agg(
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
        F.max(
            F.abs(
                F.col("ca").cast("decimal(18,0)")
                * F.col("tot_b").cast("decimal(18,0)")
                - F.col("cb").cast("decimal(18,0)")
                * F.col("tot_a").cast("decimal(18,0)")
            )
        ).alias("num"),
    )
    na_d = F.col("n_a").cast("double")
    ks = F.col("num").cast("double") / (na_d * F.col("n_b"))
    crit = 1.358 * F.sqrt((F.col("n_a") + F.col("n_b")) / (na_d * F.col("n_b")))
    return stat.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(ks, 6).alias("ks_stat"),
        F.round(crit, 6).alias("ks_crit_05"),
        (ks > crit).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over daily event volumes
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), stats AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY event_type
    ), z AS (
        SELECT d.event_type, d.day, s.n,
               CASE WHEN s.n * s.sxx - s.sx * s.sx > 0
                    THEN (d.x - CAST(s.sx AS DOUBLE) / s.n)
                         / sqrt((CAST(s.n AS DOUBLE) * s.sxx
                                 - CAST(s.sx AS DOUBLE) * s.sx)
                                / (CAST(s.n AS DOUBLE) * s.n))
                    ELSE 0.0
               END - 0.5 AS zk
        FROM daily d JOIN stats s USING (event_type)
    ), cumz AS (
        SELECT event_type, day, n,
               SUM(zk) OVER (PARTITION BY event_type ORDER BY day) AS c
        FROM z
    ), cusum AS (
        SELECT event_type, day, n,
               c - LEAST(
                   0.0,
                   MIN(c) OVER (PARTITION BY event_type ORDER BY day)
               ) AS s
        FROM cumz
    ), ranked AS (
        SELECT event_type, day, n, s,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY s DESC, day ASC
               ) AS rn
        FROM cusum
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(s, 4) AS max_cusum, day AS peak_day,
           s > 5.0 AS drift_flag
    FROM ranked WHERE rn = 1
    ORDER BY event_type
"""


@register("events_cusum_drift", _CUSUM_SQL)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detector (Page 1954) over per-type
    daily event volumes: S_t = max(0, S_{t-1} + z_t − k) with slack
    k = 0.5 in standardized units, reported as max S_t and its argmax
    day — the sequential alarm that catches a feed whose volume drifts
    up slowly enough that per-day z-score alarms never fire
    (``events_zscore_anomalies`` is the pointwise companion).

    The recursion is solved in closed form so no iterative/stateful
    operator is needed: S_t = C_t − min(0, min_{j≤t} C_j) with
    C = running Σ(z−k) — two window passes per type over the bounded
    day series. Determinism: daily counts and their first two moments
    are exact integer sums; mean/std divide once; the running sums are
    sequential window aggregates in day order (order-fixed in both
    engines — the one float-sum form the flake class cannot touch);
    ties on max break to the earliest day. 100 TB shape: one
    (type, day) hash agg over the scan, then windows over
    types × days rows — sketch-sized."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / F.col("n")
    std = F.sqrt(
        (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        / (n_d * F.col("n"))
    )
    # a constant-volume feed has zero variance: define z = 0 (CUSUM
    # stays at 0, no drift) instead of dividing by zero — exact integer
    # predicate so both engines take the same branch
    var_pos = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) > 0
    z = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        (
            F.when(var_pos, (F.col("x") - mean) / std).otherwise(F.lit(0.0))
            - 0.5
        ).alias("zk"),
    )
    w_run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cumz = z.select(
        "event_type", "day", "n", F.sum("zk").over(w_run).alias("c")
    )
    cusum = cumz.select(
        "event_type",
        "day",
        "n",
        (F.col("c") - F.least(F.lit(0.0), F.min("c").over(w_run))).alias("s"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.desc("s"), F.asc("day")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.round("s", 4).alias("max_cusum"),
            F.col("day").alias("peak_day"),
            (F.col("s") > 5.0).alias("drift_flag"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensics over order totals
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
    WITH digits AS (
        SELECT unnest(generate_series(1, 9)) AS d
    ), prios AS (
        SELECT DISTINCT o_orderpriority FROM orders
    ), obs AS (
        SELECT o_orderpriority,
               CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_d
        FROM orders WHERE o_totalprice >= 1.0
        GROUP BY 1, 2
    ), spine AS (
        SELECT p.o_orderpriority, g.d, COALESCE(o.n_d, 0) AS n_d
        FROM prios p CROSS JOIN digits g
        LEFT JOIN obs o
          ON o.o_orderpriority = p.o_orderpriority AND o.d = g.d
    ), tot AS (
        SELECT o_orderpriority, CAST(SUM(n_d) AS BIGINT) AS n
        FROM spine GROUP BY o_orderpriority
    ), terms AS (
        SELECT s.o_orderpriority, s.d, s.n_d, t.n,
               t.n * (ln(1.0 + 1.0 / s.d) / ln(10.0)) AS expd,
               ABS(s.n_d - t.n * (ln(1.0 + 1.0 / s.d) / ln(10.0))) AS dev
        FROM spine s JOIN tot t USING (o_orderpriority)
    ), chi AS (
        SELECT o_orderpriority, d, n, dev,
               SUM((n_d - expd) * (n_d - expd) / expd) OVER (
                   PARTITION BY o_orderpriority ORDER BY d
               ) AS chi2_cum,
               row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY dev DESC, d ASC
               ) AS dev_rn
        FROM terms
    ), last AS (
        SELECT o_orderpriority, n, chi2_cum AS chi2 FROM chi WHERE d = 9
    ), worst AS (
        SELECT o_orderpriority, d AS max_dev_digit FROM chi WHERE dev_rn = 1
    )
    SELECT l.o_orderpriority, CAST(l.n AS BIGINT) AS n_orders,
           ROUND(l.chi2, 4) AS chi2,
           CAST(w.max_dev_digit AS BIGINT) AS max_dev_digit,
           l.chi2 > 15.507 AS benford_reject
    FROM last l JOIN worst w USING (o_orderpriority)
    ORDER BY l.o_orderpriority
"""


@register("orders_benford_audit", _BENFORD_SQL)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals per
    priority class: χ² of the observed digit histogram against
    p(d) = log₁₀(1 + 1/d), with the worst-deviating digit named. The
    data-quality forensic for synthetic/tampered/defaulted numeric
    columns — a feed whose amounts are generated uniform (as this
    fixture's are) or padded with a constant lights up instantly, which
    is exactly what a 100 TB ingest wants to know before training on a
    new source.

    Shape: one hash agg over the scan to (priority, digit) — 45 rows —
    then a zero-backfilled digit spine (the a8 idiom: absent digits
    MUST contribute their full expected mass to χ²). Determinism: the
    9-term χ² sum is a sequential window cumsum in digit order (taking
    the d=9 row), not a groupBy float sum; expected masses are
    identical cross-engine (same ln-quotient expression); the worst
    digit breaks ties toward the smaller digit. df=8 critical value
    15.507 at α=0.05."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    obs = o.groupBy(
        "o_orderpriority",
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    digits = spark.range(1, 10).select(F.col("id").alias("d"))
    prios = o.select("o_orderpriority").distinct()
    spine = (
        prios.crossJoin(F.broadcast(digits))
        .join(F.broadcast(obs), ["o_orderpriority", "d"], "left")
        .select(
            "o_orderpriority", "d", F.coalesce("n_d", F.lit(0)).alias("n_d")
        )
    )
    tot = spine.groupBy("o_orderpriority").agg(
        F.sum("n_d").cast("bigint").alias("n")
    )
    expd = F.col("n") * (F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0)))
    terms = spine.join(F.broadcast(tot), "o_orderpriority").select(
        "o_orderpriority",
        "d",
        "n_d",
        "n",
        expd.alias("expd"),
        F.abs(F.col("n_d") - expd).alias("dev"),
    )
    w_chi = Window.partitionBy("o_orderpriority").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_dev = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("dev"), F.asc("d")
    )
    chi = terms.select(
        "o_orderpriority",
        "d",
        "n",
        F.sum(
            (F.col("n_d") - F.col("expd"))
            * (F.col("n_d") - F.col("expd"))
            / F.col("expd")
        )
        .over(w_chi)
        .alias("chi2_cum"),
        F.row_number().over(w_dev).alias("dev_rn"),
    )
    last = chi.filter(F.col("d") == 9).select(
        "o_orderpriority", "n", F.col("chi2_cum").alias("chi2")
    )
    worst = chi.filter(F.col("dev_rn") == 1).select(
        "o_orderpriority", F.col("d").alias("max_dev_digit")
    )
    return (
        last.join(F.broadcast(worst), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round("chi2", 4).alias("chi2"),
            F.col("max_dev_digit").cast("bigint").alias("max_dev_digit"),
            (F.col("chi2") > 15.507).alias("benford_reject"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# privacy: t-closeness audit (completes k-anonymity / l-diversity)
# ---------------------------------------------------------------------------

_TCLOSE_SQL = """
    WITH bands AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_gb
        FROM customer GROUP BY 1, 2, 3
    ), grp AS (
        SELECT c_nationkey, c_mktsegment, CAST(SUM(n_gb) AS BIGINT) AS n_g
        FROM bands GROUP BY 1, 2
    ), bnd AS (
        SELECT band, CAST(SUM(n_gb) AS BIGINT) AS n_b FROM bands GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM bnd
    ), spine AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.n_g, b.band, b.n_b,
               COALESCE(x.n_gb, 0) AS n_gb
        FROM grp g CROSS JOIN bnd b
        LEFT JOIN bands x
          ON x.c_nationkey = g.c_nationkey
         AND x.c_mktsegment = g.c_mktsegment
         AND x.band = b.band
    ), tvd AS (
        SELECT c_nationkey, c_mktsegment, MAX(n_g) AS n_g,
               SUM(ABS(CAST(n_gb AS HUGEINT) * (SELECT n FROM tot)
                       - CAST(n_b AS HUGEINT) * n_g)) AS num
        FROM spine
        GROUP BY c_nationkey, c_mktsegment
    ), t AS (
        SELECT n_g,
               CAST(num AS DOUBLE)
                   / (2.0 * n_g * (SELECT n FROM tot)) AS tval,
               CAST(FLOOR(CAST(num AS DOUBLE) * 10.0
                          / (CAST(n_g AS DOUBLE) * (SELECT n FROM tot)))
                    AS BIGINT) AS bucket
        FROM tvd
    )
    SELECT ROUND(CAST(bucket AS DOUBLE) * 0.05, 2) AS t_bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_g) AS BIGINT) AS n_customers,
           ROUND(MAX(tval), 4) AS max_t
    FROM t
    GROUP BY bucket
    ORDER BY t_bucket_lo
"""


@register("customer_tcloseness_audit", _TCLOSE_SQL)
def customer_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness histogram over the same quasi-identifier groups as
    ``customer_kanonymity_audit`` / ``customer_ldiversity_audit``
    (nation × market segment; sensitive = $1000 balance band):
    t = total-variation distance between a group's sensitive-value
    distribution and the global one, bucketed in 0.05 bands. The third
    leg of the privacy stool — l-diversity counts distinct sensitive
    values but still leaks when a group's DISTRIBUTION is skewed far
    from the population (skewness attack); t-closeness is the audit
    that catches that.

    TVD over a categorical attribute = ½·Σ_b |p_g(b) − p(b)|, computed
    on the exact integer cross products |n_gb·N − N_b·n_g| (decimal/
    HUGEINT so 100 TB counts cannot wrap int64) and divided once —
    absent (group, band) cells are zero-backfilled via the bounded
    groups × bands spine because they still contribute |N_b·n_g|.
    The bucket index floors 20·t computed by one IEEE division of
    exact ints (correctly rounded, hence identical cross-engine).
    Everything post-scan is bands × groups ≤ a few thousand rows."""
    c = _t(spark, sf_dir, "customer")
    bands = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_gb"))
    grp = bands.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_gb").cast("bigint").alias("n_g")
    )
    bnd = bands.groupBy("band").agg(F.sum("n_gb").cast("bigint").alias("n_b"))
    tot = bnd.agg(F.sum("n_b").cast("bigint").alias("n"))
    spine = (
        grp.crossJoin(F.broadcast(bnd))
        .join(bands, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "band",
            "n_b",
            F.coalesce("n_gb", F.lit(0)).alias("n_gb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    tvd = spine.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("n_g").alias("n_g"),
        F.max("n").alias("n"),
        F.sum(
            F.abs(
                F.col("n_gb").cast("decimal(18,0)")
                * F.col("n").cast("decimal(18,0)")
                - F.col("n_b").cast("decimal(18,0)")
                * F.col("n_g").cast("decimal(18,0)")
            )
        ).alias("num"),
    )
    num_d = F.col("num").cast("double")
    tval = num_d / (2.0 * F.col("n_g") * F.col("n"))
    bucket = F.floor(
        num_d * 10.0 / (F.col("n_g").cast("double") * F.col("n"))
    ).cast("bigint")
    return (
        tvd.select(
            F.col("n_g"), tval.alias("tval"), bucket.alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n_g").cast("bigint").alias("n_customers"),
            F.round(F.max("tval"), 4).alias("max_t"),
        )
        .select(
            F.round(F.col("bucket") * 0.05, 2).alias("t_bucket_lo"),
            "n_groups",
            "n_customers",
            "max_t",
        )
        .orderBy("t_bucket_lo")
    )


# ---------------------------------------------------------------------------
# corpus drift: coarsened Jensen-Shannon divergence per source
# ---------------------------------------------------------------------------

_TOPV = 2000

_JSD_SQL = f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS w FROM documents
    ), corpus AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), top AS (
        SELECT w, c FROM corpus ORDER BY c DESC, w ASC LIMIT {_TOPV}
    ), totals AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_corpus,
               CAST((SELECT SUM(c) FROM top) AS BIGINT) AS n_top
        FROM corpus
    ), src_top AS (
        SELECT t.source, tp.w, CAST(COUNT(*) AS BIGINT) AS c_sw
        FROM tok t JOIN top tp ON t.w = tp.w
        GROUP BY t.source, tp.w
    ), src_tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM tok GROUP BY source
    ), cells AS (
        SELECT s.source, s.n_s,
               COALESCE(x.c_sw, 0) AS c_sw, tp.c AS c_w
        FROM src_tot s CROSS JOIN top tp
        LEFT JOIN src_top x ON x.source = s.source AND x.w = tp.w
        UNION ALL
        SELECT s.source, s.n_s,
               s.n_s - COALESCE((SELECT SUM(c_sw) FROM src_top x
                                 WHERE x.source = s.source), 0),
               (SELECT n_corpus - n_top FROM totals)
        FROM src_tot s
    ), terms AS (
        SELECT source, n_s,
               CAST(c_sw AS DOUBLE) / n_s AS p,
               CAST(c_w AS DOUBLE) / (SELECT n_corpus FROM totals) AS q
        FROM cells
    ), scaled AS (
        SELECT source, n_s,
               CAST(ROUND((
                   CASE WHEN p > 0
                        THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END
                   + CASE WHEN q > 0
                          THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END
               ) * 1000000000000.0) AS BIGINT) AS t
        FROM terms
    )
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           ROUND(0.5 * SUM(t) / 1000000000000.0, 6) AS jsd_vs_corpus
    FROM scaled
    GROUP BY source
    ORDER BY source
"""


@register("docs_js_divergence_by_source", _JSD_SQL)
def docs_js_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the whole-corpus distribution, over the top-2000
    corpus words with the tail coarsened into one OTHER bucket — the
    source-grain drift gauge next to ``docs_source_gini_balance``
    (volume balance) and ``docs_zipf_slope_by_source`` (shape): a
    source whose JSD jumps between snapshots changed its *content*,
    not just its volume. Coarsening is the scale move: JSD over a
    quotient partition is still a valid bounded divergence (0..ln 2),
    and the cell table is sources × 2001 instead of sources × |V|; the
    top-V spine broadcasts.

    Determinism: p and q are single IEEE divisions of exact counts;
    each cell's contribution p·ln(2p/(p+q)) + q·ln(2q/(p+q)) is
    integer-scaled to 1e-12 quanta BEFORE the per-source sum, so the
    sum is exact BIGINT and merge-order-free, and a last-ulp ln()
    disagreement between libm and the JVM (≈1e-19 absolute) sits five
    orders below the quantum. Absent (source, word) cells contribute
    their q-side mass via the zero-backfilled spine (p=0 ⇒ p-term 0 by
    the limit). Tokenizer: ``tokens_col`` ≡ regex ``\\s+`` twin."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    )
    corpus = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = corpus.orderBy(F.desc("c"), F.asc("w")).limit(_TOPV)
    totals = corpus.agg(F.sum("c").cast("bigint").alias("n_corpus")).crossJoin(
        top.agg(F.sum("c").cast("bigint").alias("n_top"))
    )
    src_top = (
        tok.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_sw"))
    )
    src_tot = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    head = (
        src_tot.crossJoin(F.broadcast(top))
        .join(src_top, ["source", "w"], "left")
        .select(
            "source",
            "n_s",
            F.coalesce("c_sw", F.lit(0)).alias("c_sw"),
            F.col("c").alias("c_w"),
        )
    )
    other = (
        src_tot.join(
            src_top.groupBy("source").agg(
                F.sum("c_sw").cast("bigint").alias("c_top_s")
            ),
            "source",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_s",
            (F.col("n_s") - F.coalesce("c_top_s", F.lit(0))).alias("c_sw"),
            (F.col("n_corpus") - F.col("n_top")).alias("c_w"),
        )
    )
    cells = head.unionByName(other).crossJoin(
        F.broadcast(totals.select("n_corpus"))
    )
    p = F.col("c_sw").cast("double") / F.col("n_s")
    q = F.col("c_w").cast("double") / F.col("n_corpus")
    contrib = F.when(p > 0, p * F.log(2.0 * p / (p + q))).otherwise(
        F.lit(0.0)
    ) + F.when(q > 0, q * F.log(2.0 * q / (p + q))).otherwise(F.lit(0.0))
    scaled = cells.select(
        "source",
        "n_s",
        F.round(contrib * 1000000000000.0).cast("bigint").alias("t"),
    )
    return (
        scaled.groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_tokens"),
            F.round(0.5 * F.sum("t") / 1000000000000.0, 6).alias(
                "jsd_vs_corpus"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# corpus fluency: add-one bigram LM surprisal per source
# ---------------------------------------------------------------------------

_BIGRAM_SQL = f"""
    WITH base AS (
        SELECT doc_id, source, {_TOKS} AS ts FROM documents
    ), big AS (
        SELECT source,
               unnest(ts[:len(ts) - 1]) AS w1,
               unnest(ts[2:]) AS w2
        FROM base WHERE len(ts) >= 2
    ), k AS (
        SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
        FROM big GROUP BY source, w1, w2
    ), c12 AS (
        SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c12 FROM k GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
    ), vocab AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
        FROM (SELECT unnest(ts) AS w FROM base)
    ), scored AS (
        SELECT k.source, k.k,
               CAST(ROUND((ln(CAST(c1.c1 + vocab.v AS DOUBLE))
                           - ln(CAST(c12.c12 + 1 AS DOUBLE)))
                          * 1000000000.0) AS BIGINT) AS s9
        FROM k
        JOIN c12 ON k.w1 = c12.w1 AND k.w2 = c12.w2
        JOIN c1 ON k.w1 = c1.w1
        CROSS JOIN vocab
    )
    SELECT source,
           CAST(SUM(k) AS BIGINT) AS n_bigrams,
           ROUND(SUM(k * s9) / (SUM(k) * 1000000000.0), 4) AS avg_surprisal,
           ROUND(exp(ROUND(SUM(k * s9) / (SUM(k) * 1000000000.0), 4)), 2)
               AS perplexity
    FROM scored
    GROUP BY source
    ORDER BY source
"""


@register("docs_bigram_lm_surprisal_by_source", _BIGRAM_SQL)
def docs_bigram_lm_surprisal_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean bigram surprisal (and perplexity) per source under an
    add-one-smoothed bigram LM trained on the corpus itself:
    −ln P(w₂|w₁) with P = (c(w₁w₂)+1)/(c(w₁)+|V|), c(w₁) counting
    bigram CONTEXTS so the conditional normalizes. The classic
    cheap-LM fluency gate (KenLM-style filtering): template spam
    scores near-zero surprisal, shuffled/garbled text scores near
    ln|V|, and both tails are what a curation pass trims. Companion to
    ``docs_unigram_logprob_topk`` (doc grain, unigram) — this one is
    source grain with real context.

    Scale shape: the scored grain is (source, w₁, w₂) DISTINCT bigrams
    with multiplicity k — bounded by vocabulary structure, far smaller
    than bigram instances — and the count tables c12/c1 derive from
    that same grain by re-aggregation, so the corpus is tokenized
    exactly once. |V| is a 1-row scalar broadcast. Determinism: the
    per-bigram surprisal is integer-scaled to 1e-9 quanta (ln inputs
    are exact ints, a cross-engine ulp sits 5+ orders below the
    quantum), multiplied by the exact multiplicity, and summed as
    BIGINT; both ROUNDs happen on exact-ratio doubles, and perplexity
    exponentiates the already-rounded mean so the two readouts can
    never disagree. Tokenizer: ``tokens_col`` ≡ regex ``\\s+`` twin."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", tokens_col(F.lower(F.col("text"))).alias("ts")
    )
    n = F.size("ts")
    big = base.filter(n >= 2).select(
        "source",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, n - 1),
                F.slice(F.col("ts"), 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("source", "bg.w1", "bg.w2")
    k = big.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    c12 = k.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = base.select(F.explode("ts").alias("w")).agg(
        F.countDistinct("w").cast("bigint").alias("v")
    )
    s9 = (
        F.round(
            (
                F.log((F.col("c1") + F.col("v")).cast("double"))
                - F.log((F.col("c12") + 1).cast("double"))
            )
            * 1000000000.0
        )
        .cast("bigint")
        .alias("s9")
    )
    scored = (
        k.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("source", "k", s9)
    )
    avg = F.round(
        F.sum(F.col("k").cast("decimal(18,0)") * F.col("s9")).cast(
            "double"
        )
        / (F.sum("k") * 1000000000.0),
        4,
    )  # decimal(38,0) sum: k*s9 reaches 1e22 at 100 TB, past int64
    return (
        scored.groupBy("source")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            avg.alias("avg_surprisal"),
        )
        .select(
            "source",
            "n_bigrams",
            "avg_surprisal",
            F.round(F.exp("avg_surprisal"), 2).alias("perplexity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# population stability index between time halves
# ---------------------------------------------------------------------------

_PSI_SQL = """
    WITH bounds AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us
        FROM events
    ), binned AS (
        SELECT event_type,
               LEAST(CAST(FLOOR(GREATEST(value, 0.0) / 50.0) AS BIGINT), 9)
                   AS bin,
               CAST(SUM(CASE WHEN epoch_us(ts) < (SELECT mid_us FROM bounds)
                             THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT mid_us FROM bounds)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM events GROUP BY 1, 2
    ), types AS (
        SELECT event_type, CAST(SUM(na) AS BIGINT) AS tot_a,
               CAST(SUM(nb) AS BIGINT) AS tot_b
        FROM binned GROUP BY event_type
    ), spine AS (
        SELECT t.event_type, t.tot_a, t.tot_b, g.bin,
               COALESCE(b.na, 0) AS na, COALESCE(b.nb, 0) AS nb
        FROM types t
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
        LEFT JOIN binned b ON b.event_type = t.event_type AND b.bin = g.bin
    ), terms AS (
        SELECT event_type, tot_a, tot_b,
               CAST(na + 1 AS DOUBLE) / (tot_a + 10) AS pa,
               CAST(nb + 1 AS DOUBLE) / (tot_b + 10) AS pb
        FROM spine
    ), scaled AS (
        SELECT event_type, tot_a, tot_b,
               CAST(ROUND((pa - pb) * ln(pa / pb) * 1000000000000.0)
                    AS BIGINT) AS t
        FROM terms
    )
    SELECT event_type,
           CAST(MAX(tot_a) AS BIGINT) AS n_first_half,
           CAST(MAX(tot_b) AS BIGINT) AS n_second_half,
           ROUND(SUM(t) / 1000000000000.0, 6) AS psi,
           SUM(t) / 1000000000000.0 > 0.2 AS drift_flag
    FROM scaled
    GROUP BY event_type
    ORDER BY event_type
"""


@register("events_psi_value_drift", _PSI_SQL)
def events_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the first and second time halves, per event type — the
    industry-standard "did the feature's distribution move" score
    (PSI < 0.1 stable, > 0.2 action), complementing the KS row: KS
    reads the worst single point of CDF divergence, PSI integrates
    divergence across all bins (it is a symmetrized KL). Fixed 10-bin
    width-50 grid; add-one smoothing per bin so empty cells contribute
    finitely (and the zero-backfilled spine makes them PRESENT — a bin
    that died between halves is precisely the signal).

    The time split is the midpoint of (min, max) epoch-microseconds —
    exact integer arithmetic off one scalar agg, no quantile pass.
    Determinism: smoothed p's are single IEEE divisions of exact ints;
    each bin's (pa−pb)·ln(pa/pb) term integer-scales to 1e-12 quanta
    before the exact per-type BIGINT sum (10 addends). 100 TB shape:
    one scalar pass for the bounds, one hash agg to (type, bin), a
    types × 10 spine epilogue."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2)
        )
        .cast("bigint")
        .alias("mid_us")
    )
    binned = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy(
            "event_type",
            F.least(
                F.floor(F.greatest(F.col("value"), F.lit(0.0)) / 50.0).cast(
                    "bigint"
                ),
                F.lit(9).cast("bigint"),
            ).alias("bin"),
        )
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("mid_us"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("na"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("mid_us"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("nb"),
        )
    )
    types = binned.groupBy("event_type").agg(
        F.sum("na").cast("bigint").alias("tot_a"),
        F.sum("nb").cast("bigint").alias("tot_b"),
    )
    bins = spark.range(0, 10).select(F.col("id").alias("bin"))
    spine = (
        types.crossJoin(F.broadcast(bins))
        .join(binned, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "tot_a",
            "tot_b",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    pa = (F.col("na") + 1).cast("double") / (F.col("tot_a") + 10)
    pb = (F.col("nb") + 1).cast("double") / (F.col("tot_b") + 10)
    scaled = spine.select(
        "event_type",
        "tot_a",
        "tot_b",
        F.round((pa - pb) * F.log(pa / pb) * 1000000000000.0)
        .cast("bigint")
        .alias("t"),
    )
    psi = F.sum("t") / 1000000000000.0
    return (
        scaled.groupBy("event_type")
        .agg(
            F.max("tot_a").cast("bigint").alias("n_first_half"),
            F.max("tot_b").cast("bigint").alias("n_second_half"),
            F.round(psi, 6).alias("psi"),
            (psi > 0.2).alias("drift_flag"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth per source
# ---------------------------------------------------------------------------

_HEAPS_SQL = f"""
    WITH base AS (
        SELECT doc_id, source, {_TOKS} AS ts,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS nd
        FROM documents
    ), dd AS (
        SELECT source, doc_id, ts,
               CAST(FLOOR((rk - 1) * 10.0 / nd) AS BIGINT) AS dec, nd
        FROM base
    ), tok AS (
        SELECT source, dec, unnest(ts) AS w FROM dd
    ), firstdec AS (
        SELECT source, w, MIN(dec) AS fd FROM tok GROUP BY source, w
    ), vnew AS (
        SELECT source, fd AS dec, CAST(COUNT(*) AS BIGINT) AS v_new
        FROM firstdec GROUP BY source, fd
    ), ntok AS (
        SELECT source, dec, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY source, dec
    ), grow AS (
        SELECT n.source, n.dec,
               SUM(n.n_tok) OVER w AS n_cum,
               SUM(COALESCE(v.v_new, 0)) OVER w AS v_cum
        FROM ntok n LEFT JOIN vnew v ON n.source = v.source AND n.dec = v.dec
        WINDOW w AS (PARTITION BY n.source ORDER BY n.dec)
    ), pts AS (
        SELECT source, ln(CAST(n_cum AS DOUBLE)) AS x,
               ln(CAST(v_cum AS DOUBLE)) AS y
        FROM grow WHERE n_cum > 0 AND v_cum > 0
    ), s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS np,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM pts GROUP BY source
    )
    SELECT source, np AS n_points,
           ROUND((np * sxy - sx * sy) / (np * sxx - sx * sx), 4) AS heaps_beta
    FROM s
    WHERE np >= 3
    ORDER BY source
"""


@register("docs_heaps_law_by_source", _HEAPS_SQL)
def docs_heaps_law_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit per source: vocabulary grows as V(n) ≈ K·n^β, so
    β is the OLS slope of ln V_cum on ln N_cum across 10 doc-order
    deciles. Natural text sits at β ≈ 0.4-0.6; β → 0 means the source
    stopped contributing new vocabulary (template/boilerplate feed,
    prime dedup target) and β ≈ 1 means near-random token soup — the
    growth-curve companion to the static `docs_zipf_slope_by_source`.

    Mechanics: deciles come from row_number within source over doc_id
    (one partitioned sort); each word's FIRST decile marks where it
    entered the vocabulary, so cumulative distinct-word counts need no
    per-prefix distinct pass — V_cum is a running sum of first-
    occurrence counts (the same trick `docs_exact_substring_coverage`
    uses for first-wins attribution). Running sums are per-source
    10-row sequential windows; the regression reuses the zipf idiom —
    the ≤10 (x, y) points fold in decile order via one sort_array +
    sequential F.aggregate, so no groupBy float sum exists on the
    Spark side, and ROUND(…, 4) absorbs cross-engine ulp noise vs
    DuckDB's plain 10-addend SUM. Sources with fewer than 3 growth
    points are excluded (a 2-point fit is exact and meaningless).
    Tokenizer: ``tokens_col`` ≡ regex ``\\s+`` twin."""
    d = _t(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source")
    base = d.select(
        "doc_id",
        "source",
        tokens_col(F.lower(F.col("text"))).alias("ts"),
        F.row_number().over(w_src.orderBy("doc_id")).alias("rk"),
        F.count(F.lit(1)).over(w_src).alias("nd"),
    )
    dd = base.select(
        "source",
        "ts",
        F.floor((F.col("rk") - 1) * 10.0 / F.col("nd"))
        .cast("bigint")
        .alias("dec"),
    )
    tok = dd.select("source", "dec", F.explode("ts").alias("w"))
    firstdec = tok.groupBy("source", "w").agg(F.min("dec").alias("fd"))
    vnew = firstdec.groupBy("source", F.col("fd").alias("dec")).agg(
        F.count(F.lit(1)).cast("bigint").alias("v_new")
    )
    ntok = tok.groupBy("source", "dec").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    w_run = Window.partitionBy("source").orderBy("dec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grow = (
        ntok.join(vnew, ["source", "dec"], "left")
        .select(
            "source",
            "dec",
            F.sum("n_tok").over(w_run).alias("n_cum"),
            F.sum(F.coalesce("v_new", F.lit(0))).over(w_run).alias("v_cum"),
        )
    )
    pts = grow.filter((F.col("n_cum") > 0) & (F.col("v_cum") > 0)).select(
        "source",
        "dec",
        F.log(F.col("n_cum").cast("double")).alias("x"),
        F.log(F.col("v_cum").cast("double")).alias("y"),
    )
    arr = pts.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("dec", "x", "y"))).alias("pts")
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
    np_ = F.size("pts").cast("bigint")
    return (
        arr.select("source", np_.alias("n_points"), acc.alias("a"))
        .filter(F.col("n_points") >= 3)
        .select(
            "source",
            "n_points",
            F.round(
                (
                    F.col("n_points") * F.col("a.sxy")
                    - F.col("a.sx") * F.col("a.sy")
                )
                / (
                    F.col("n_points") * F.col("a.sxx")
                    - F.col("a.sx") * F.col("a.sx")
                ),
                4,
            ).alias("heaps_beta"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U / AUC between event cohorts (binned, exact integers)
# ---------------------------------------------------------------------------

_MW_SQL = """
    WITH binned AS (
        SELECT LEAST(CAST(FLOOR(GREATEST(value, 0.0) / 10.0) AS BIGINT), 49)
                   AS bin,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ), cum AS (
        SELECT bin, na, nb,
               SUM(nb) OVER (ORDER BY bin) - nb AS cb_prev,
               SUM(na) OVER () AS tot_a,
               SUM(nb) OVER () AS tot_b
        FROM binned
    ), stat AS (
        SELECT MAX(tot_a) AS n_a, MAX(tot_b) AS n_b,
               SUM(CAST(na AS HUGEINT) * (2 * cb_prev + nb)) AS u2
        FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(u2 AS DOUBLE)
                 / (2.0 * CAST(n_a AS DOUBLE) * n_b), 6) AS auc,
           ROUND((CAST(u2 AS DOUBLE) / 2.0
                  - CAST(n_a AS DOUBLE) * n_b / 2.0)
                 / sqrt(CAST(n_a AS DOUBLE) * n_b
                        * (n_a + n_b + 1) / 12.0), 4) AS z_score,
           ABS((CAST(u2 AS DOUBLE) / 2.0
                - CAST(n_a AS DOUBLE) * n_b / 2.0)
               / sqrt(CAST(n_a AS DOUBLE) * n_b
                      * (n_a + n_b + 1) / 12.0)) > 1.96 AS reject_h0
    FROM stat
"""


@register("events_mannwhitney_auc", _MW_SQL)
def events_mannwhitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the ``purchase`` and ``click`` value
    distributions on the KS row's 50-bin grid, reported as the AUC
    P(a > b) + ½·P(a = b) — the rank-based effect size the KS row's
    sup-distance doesn't give (KS says "the distributions differ", AUC
    says "by how much, in which direction"). Within-bin ties take the
    standard ½ credit, which is exactly what the doubled-U identity
    2U = Σ_bins na_b·(2·cum_nb(<b) + nb_b) encodes — so U is computed
    ENTIRELY in exact integer arithmetic (decimal/HUGEINT products),
    and the only float ops are the final AUC division and the normal
    z-approximation. The z-score uses the no-tie-correction variance
    n_a·n_b·(n+1)/12 — conservative-adjacent on a binned grid and
    identical cross-engine.

    100 TB shape: identical to the KS row — one hash agg over the
    scan, a 50-row window epilogue, one scalar output."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    binned = e.groupBy(
        F.least(
            F.floor(F.greatest(F.col("value"), F.lit(0.0)) / 10.0).cast("bigint"),
            F.lit(49).cast("bigint"),
        ).alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    w_run = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = binned.select(
        "bin",
        "na",
        "nb",
        (F.sum("nb").over(w_run) - F.col("nb")).alias("cb_prev"),
        F.sum("na").over(w_all).alias("tot_a"),
        F.sum("nb").over(w_all).alias("tot_b"),
    )
    stat = cum.agg(
        F.max("tot_a").alias("n_a"),
        F.max("tot_b").alias("n_b"),
        F.sum(
            F.col("na").cast("decimal(18,0)")
            * (2 * F.col("cb_prev") + F.col("nb")).cast("decimal(18,0)")
        ).alias("u2"),
    )
    na_d = F.col("n_a").cast("double")
    u = F.col("u2").cast("double") / 2.0
    mean_u = na_d * F.col("n_b") / 2.0
    sd_u = F.sqrt(na_d * F.col("n_b") * (F.col("n_a") + F.col("n_b") + 1) / 12.0)
    z = (u - mean_u) / sd_u
    return stat.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(u / (na_d * F.col("n_b")), 6).alias("auc"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).alias("reject_h0"),
    )


# ---------------------------------------------------------------------------
# Daily-volume autocorrelation (seasonality / weekly cadence detector)
# ---------------------------------------------------------------------------

_ACF_SQL = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily
    ), lags AS (
        SELECT unnest(ARRAY[1, 7]) AS lag
    ), pairs AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy,
               CAST(SUM(a.x) AS BIGINT) AS sa,
               CAST(SUM(b.x) AS BIGINT) AS sb
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
        GROUP BY l.lag
    )
    SELECT p.lag,
           p.n_k AS n_pairs,
           ROUND(
               (CAST(t.n AS DOUBLE) * t.n * p.sxy
                - CAST(t.n AS DOUBLE) * t.sx * (p.sa + p.sb)
                + CAST(p.n_k AS DOUBLE) * t.sx * t.sx)
               / (CAST(t.n AS DOUBLE)
                  * (CAST(t.n AS DOUBLE) * t.sxx
                     - CAST(t.sx AS DOUBLE) * t.sx)),
               4
           ) AS autocorr
    FROM pairs p CROSS JOIN tot t
    ORDER BY p.lag
"""


@register("orders_daily_autocorr", _ACF_SQL)
def orders_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily order volume — the
    seasonality detector: lag-7 ≫ lag-1 means a weekly cadence, both
    near zero means arrival-independent volume (as this synthetic
    fixture's Poisson-ish generator should show), and a spike at lag-1
    means momentum/trend. The cadence answer feeds the CUSUM row: a
    strongly weekly series needs day-of-week-adjusted z's before
    changepoint detection means anything.

    Mechanics: lagged pairs come from a DATE-ARITHMETIC equi-join
    (day+k), not a window — no spine needed, gaps in the calendar just
    drop pairs (n_pairs is reported so the coverage is visible). The
    autocorrelation expands to exact integer moments:
    r_k = (n²·Σxy − n·Sx·(Sa+Sb) + n_k·Sx²) / (n·(n·Sxx − Sx²)),
    every product decimal/HUGEINT, one IEEE division. Post-scan state
    is calendar-bounded (days, not orders)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    parts = []
    for k in (1, 7):
        a, b = daily.alias("a"), daily.alias("b")
        pairs = a.join(
            b, F.col("b.day") == F.date_add(F.col("a.day"), k)
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_k"),
            F.sum(
                F.col("a.x").cast("decimal(18,0)")
                * F.col("b.x").cast("decimal(18,0)")
            ).alias("sxy"),
            F.sum("a.x").cast("bigint").alias("sa"),
            F.sum("b.x").cast("bigint").alias("sb"),
        )
        parts.append(pairs.select(F.lit(k).cast("bigint").alias("lag"), "*"))
    both = parts[0].unionByName(parts[1])
    n_d = F.col("n").cast("double")
    num = (
        n_d * F.col("n") * F.col("sxy").cast("double")
        - n_d * F.col("sx") * (F.col("sa") + F.col("sb"))
        + F.col("n_k").cast("double") * F.col("sx") * F.col("sx")
    )
    den = n_d * (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
    return (
        both.crossJoin(F.broadcast(tot))
        .select(
            "lag",
            F.col("n_k").alias("n_pairs"),
            F.round(num / den, 4).alias("autocorr"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Markov conditional entropy (journey predictability)
# ---------------------------------------------------------------------------

_MARKOV_H_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ), c AS (
        SELECT prev, event_type AS nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ), ci AS (
        SELECT prev, CAST(SUM(c) AS BIGINT) AS ci FROM c GROUP BY prev
    ), scaled AS (
        SELECT c.prev, ci.ci,
               CAST(ROUND(
                   (CAST(c.c AS DOUBLE) / ci.ci)
                   * ln(CAST(ci.ci AS DOUBLE) / c.c)
                   * 1000000000000.0
               ) AS BIGINT) AS t
        FROM c JOIN ci USING (prev)
    )
    SELECT prev,
           CAST(MAX(ci) AS BIGINT) AS n_transitions,
           ROUND(SUM(t) / 1000000000000.0, 6) AS entropy_nats,
           ROUND(exp(ROUND(SUM(t) / 1000000000000.0, 6)), 4)
               AS branching_factor
    FROM scaled
    GROUP BY prev
    ORDER BY prev
"""


@register("events_markov_entropy", _MARKOV_H_SQL)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy H(next | prev) per previous state,
    over the same per-user (ts, event_id)-ordered journey bigrams as
    ``events_markov_transitions`` — the predictability readout on top
    of the transition matrix: entropy ≈ ln(5) means the journey is
    uniform-random after this state (nothing to model), entropy ≈ 0
    means deterministic funnels (bot/scripted traffic signature, or a
    UI with one exit). ``branching_factor`` = e^H is the effective
    number of next states.

    Determinism: transition counts are exact ints from the lag window
    (total (ts, event_id) order, same as the transition row); each of
    the ≤|states|² terms (c/ci)·ln(ci/c) integer-scales to 1e-12
    quanta before the exact per-state sum; the branching factor
    exponentiates the already-rounded entropy so the two columns can
    never disagree. One user-keyed window shuffle + state²-bounded
    epilogue."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy("prev", F.col("event_type").alias("nxt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ci = c.groupBy("prev").agg(F.sum("c").cast("bigint").alias("ci"))
    scaled = c.join(ci, "prev").select(
        "prev",
        "ci",
        F.round(
            (F.col("c").cast("double") / F.col("ci"))
            * F.log(F.col("ci").cast("double") / F.col("c"))
            * 1000000000000.0
        )
        .cast("bigint")
        .alias("t"),
    )
    ent = F.round(F.sum("t") / 1000000000000.0, 6)
    return (
        scaled.groupBy("prev")
        .agg(
            F.max("ci").cast("bigint").alias("n_transitions"),
            ent.alias("entropy_nats"),
        )
        .select(
            "prev",
            "n_transitions",
            "entropy_nats",
            F.round(F.exp("entropy_nats"), 4).alias("branching_factor"),
        )
        .orderBy("prev")
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring (principled ER match weights)
# ---------------------------------------------------------------------------

_FS_M = 0.95  # assumed per-field agreement probability among true matches

_FS_SQL = f"""
    WITH c AS (
        SELECT c_custkey AS id, c_nationkey AS blk, c_mktsegment AS seg,
               CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) AS bal5,
               (c_acctbal >= 0) AS pos
        FROM customer
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c
    ), useg AS (
        SELECT CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS u2
        FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY seg)
    ), ubal AS (
        SELECT CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS u2
        FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY bal5)
    ), upos AS (
        SELECT CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS u2
        FROM (SELECT COUNT(*) AS cnt FROM c GROUP BY pos)
    ), pairs AS (
        SELECT a.seg = b.seg AS a_seg, a.bal5 = b.bal5 AS a_bal,
               a.pos = b.pos AS a_pos
        FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
    ), scored AS (
        SELECT
            (CASE WHEN a_seg
                  THEN ln({_FS_M} * n.n * n.n / useg.u2)
                  ELSE ln((1.0 - {_FS_M}) * n.n * n.n
                          / (CAST(n.n AS HUGEINT) * n.n - useg.u2)) END)
            + (CASE WHEN a_bal
                    THEN ln({_FS_M} * n.n * n.n / ubal.u2)
                    ELSE ln((1.0 - {_FS_M}) * n.n * n.n
                            / (CAST(n.n AS HUGEINT) * n.n - ubal.u2)) END)
            + (CASE WHEN a_pos
                    THEN ln({_FS_M} * n.n * n.n / upos.u2)
                    ELSE ln((1.0 - {_FS_M}) * n.n * n.n
                            / (CAST(n.n AS HUGEINT) * n.n - upos.u2)) END)
            AS score
        FROM pairs CROSS JOIN n CROSS JOIN useg CROSS JOIN ubal
        CROSS JOIN upos
    )
    SELECT CAST(FLOOR(score) AS BIGINT) AS score_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MIN(score), 4) AS min_score,
           ROUND(MAX(score), 4) AS max_score
    FROM scored
    GROUP BY 1
    ORDER BY 1
"""


@register("customer_fellegi_sunter_scores", _FS_SQL)
def customer_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter match-weight histogram over nation-blocked
    customer pairs — the PRINCIPLED scoring layer on top of the repo's
    blocking operators (`part_fuzzy_match_blocked` finds candidates;
    this row says how much an agreement is WORTH): each field
    contributes ln(m/u) when it agrees and ln((1−m)/(1−u)) when it
    doesn't, where u — the probability two RANDOM records agree — is
    computed exactly from the field's marginal frequencies
    (u = Σ_v n_v²/N², the birthday-collision identity; decimal/HUGEINT
    products). Agreement on a 5-value segment is worth little; on a
    rare balance band, a lot — which is precisely what a fixed Jaccard
    threshold cannot express. m is the documented 0.95 assumption (the
    EM refinement is the classic follow-up; u is the half that matters
    for ranking and it is exact here).

    Determinism: u's are exact integer ratios; the three per-pair
    weights are identical doubles cross-engine, summed in fixed
    left-associative expression order (a 3-term expression, not an
    aggregate — no merge-order exposure); FLOOR on identical doubles
    buckets identically. Scale: pair fan-out is bounded by the block
    key (nation here — the granularity dial, same contract as the
    fuzzy-match block), u/N scalars are three 1-row broadcasts."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 500.0).cast("bigint").alias("bal5"),
        (F.col("c_acctbal") >= 0).alias("pos"),
    )
    n = c.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def u2(col: str, alias: str):
        return (
            c.groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(
                F.sum(
                    F.col("cnt").cast("decimal(18,0)")
                    * F.col("cnt").cast("decimal(18,0)")
                ).alias(alias)
            )
        )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        (F.col("a.seg") == F.col("b.seg")).alias("a_seg"),
        (F.col("a.bal5") == F.col("b.bal5")).alias("a_bal"),
        (F.col("a.pos") == F.col("b.pos")).alias("a_pos"),
    )
    scalars = (
        n.crossJoin(F.broadcast(u2("seg", "useg")))
        .crossJoin(F.broadcast(u2("bal5", "ubal")))
        .crossJoin(F.broadcast(u2("pos", "upos")))
    )
    n2 = F.col("n").cast("double") * F.col("n")

    def w(flag: str, u2col: str):
        u2d = F.col(u2col).cast("double")
        return F.when(
            F.col(flag), F.log(F.lit(_FS_M) * n2 / u2d)
        ).otherwise(F.log((1.0 - _FS_M) * n2 / (n2 - u2d)))

    scored = pairs.crossJoin(F.broadcast(scalars)).select(
        (w("a_seg", "useg") + w("a_bal", "ubal") + w("a_pos", "upos")).alias(
            "score"
        )
    )
    return (
        scored.groupBy(F.floor("score").cast("bigint").alias("score_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.min("score"), 4).alias("min_score"),
            F.round(F.max("score"), 4).alias("max_score"),
        )
        .orderBy("score_bucket")
    )


# ---------------------------------------------------------------------------
# Snapshot diff audit (table-version reconciliation)
# ---------------------------------------------------------------------------

_DIFF_SQL = """
    WITH v1 AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
                   || CAST(o_totalprice AS VARCHAR) || '|' || o_orderpriority)
                   AS h
        FROM orders
    ), v2 AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
                   || CAST(CASE WHEN o_orderkey % 10 = 3
                                THEN o_totalprice + 100.0
                                ELSE o_totalprice END AS VARCHAR)
                   || '|' || o_orderpriority) AS h
        FROM orders WHERE o_orderkey % 17 != 5
        UNION ALL
        SELECT k, md5(CAST(k AS VARCHAR)) AS h
        FROM (SELECT unnest(generate_series(1, 500)) * 100000000 + 7 AS k)
    ), d AS (
        SELECT COALESCE(a.k, b.k) AS k,
               CASE WHEN a.k IS NULL THEN 'added'
                    WHEN b.k IS NULL THEN 'deleted'
                    WHEN a.h != b.h THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM d GROUP BY change_type
    ORDER BY change_type
"""


@register("orders_snapshot_diff_stats", _DIFF_SQL)
def orders_snapshot_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two table versions: FULL OUTER
    join on the key with an md5 row-fingerprint comparison classifying
    every key as added / deleted / changed / unchanged — the diff
    primitive behind incremental-publish validation ("did the nightly
    rebuild change only what the changelog says"), complementing
    `orders_merge_upsert_stats` (which APPLIES changes; this one
    AUDITS them). v2 is synthesized deterministically from v1 in both
    engines (price bump on key%10=3, deletes on key%17=5, 500 inserted
    high keys), so the oracle replays the whole pipeline.

    Scale shape: the diff is ONE key-equi full-outer join between
    scans, with the row fingerprint computed map-side (md5 of a
    canonical column concatenation — compare kilobyte fingerprints,
    not row payloads); counts are exact. Bucketing both versions on
    the key (`sources/sinks.py` layout) turns the join shuffle-free,
    the same move as the bucketed dedup history. Numeric columns are
    rendered to strings identically cross-engine (both print doubles
    shortest-round-trip), which the oracle itself verifies."""
    o = _t(spark, sf_dir, "orders")

    def fp(price_col):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                price_col.cast("string"),
                F.col("o_orderpriority"),
            )
        )

    v1 = o.select(F.col("o_orderkey").alias("k"), fp(F.col("o_totalprice")).alias("h"))
    bumped = F.when(
        F.col("o_orderkey") % 10 == 3, F.col("o_totalprice") + 100.0
    ).otherwise(F.col("o_totalprice"))
    v2 = (
        o.filter(F.col("o_orderkey") % 17 != 5)
        .select(F.col("o_orderkey").alias("k"), fp(bumped).alias("h"))
        .unionByName(
            spark.range(1, 501).select(
                (F.col("id") * 100000000 + 7).alias("k"),
                F.md5((F.col("id") * 100000000 + 7).cast("string")).alias("h"),
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    d = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "deleted")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return (
        d.groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("change_type")
    )

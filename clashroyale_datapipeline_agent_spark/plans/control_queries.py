"""Round-8 wave: robust time-series process control and embedding-drift
monitors — the statistical-control instruments that watch a 100 TB
pipeline's FEEDS (EWMA control chart, MAD robust anomalies, seasonal
decomposition, Theil-Sen robust trend, seasonal-naive backtest) and its
REPRESENTATIONS (per-label centroid shift between data halves, which is
also the exact linear-kernel MMD). Round 7's drift wave (plans/
drift_queries.py) answered "did the distribution move" with two-sample
tests; this wave answers "when, how much, and is the trend real" with
robust estimators that a single corrupted day cannot swing.

House determinism discipline (SCALE.md "Float-ROUND ledger"):

- the DOUBLE ``value``/price columns quantize to cents on scan; every
  cross-row SUM is an exact integer (decimal(38,0)/HUGEINT where
  squares or component sums can pass int64 — the silhouette pattern);
- daily/monthly means divide exact sums ONCE, then re-quantize to
  1e6-scaled BIGINTs before any second-level aggregation (variance,
  median, pairwise slopes);
- EWMA weights are PRECOMPUTED DECIMAL LITERALS embedded identically
  in both engines (no pow() at query time — libm-vs-JVM pow is the
  documented 1-ulp class), and the EWMA itself is a fixed 15-term
  lag expression, not an order-sensitive aggregate;
- medians interpolate midpoints of 1e6-scaled BIGINTs — (a+b)/2 on
  ints < 2^52 is exact in both engines.

No reference counterpart: the reference (``/root/reference/src``) has
no time-series or representation monitoring; these exist for the
100 TB operations story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans.star_queries import _t, register

#: lambda = 0.3 EWMA weights w_k = 0.3 * 0.7^k, k = 0..14, rendered once
#: in Python and embedded as identical decimal literals in BOTH engines
#: (repr of a double round-trips exactly; no pow() at query time).
_EWMA_LAM = 0.3
_EWMA_K = 15
_EWMA_W = [repr(_EWMA_LAM * (1.0 - _EWMA_LAM) ** k) for k in range(_EWMA_K)]


# ---------------------------------------------------------------------------
# EWMA control chart over daily mean event value
# ---------------------------------------------------------------------------

def _ewma_terms_sql() -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN lag(mean_d, {k}) OVER w IS NULL THEN 0.0"
        f" ELSE {w} * lag(mean_d, {k}) OVER w END"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(mean_d, {k}) OVER w IS NULL THEN 0.0"
        f" ELSE {w} END"
        for k, w in enumerate(_EWMA_W)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms_sql()

_EWMA_SQL = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
        FROM events GROUP BY 1
    ), means AS (
        SELECT d, n, sq * 1.0 / (n * 100.0) AS mean_d FROM daily
    ), ew AS (
        SELECT d, n, mean_d,
               ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
        FROM means
        WINDOW w AS (ORDER BY d)
    ), md AS (
        SELECT d, n, mean_d, ewma,
               CAST(ROUND(mean_d * 1000000.0) AS BIGINT) AS mq
        FROM ew
    ), sig AS (
        SELECT COUNT(*) AS dd,
               SUM(CAST(mq AS HUGEINT)) AS sm,
               SUM(CAST(mq AS HUGEINT) * CAST(mq AS HUGEINT)) AS sm2
        FROM md
    )
    SELECT md.d AS day, md.n AS n_events,
           ROUND(md.mean_d, 4) AS daily_mean,
           ROUND(md.ewma, 4) AS ewma,
           ABS(md.mq - CAST(ROUND(md.ewma * 1000000.0) AS BIGINT))
               > 3.0 * sqrt(CAST(sig.dd * sig.sm2 - sig.sm * sig.sm
                                 AS DOUBLE) / (sig.dd * sig.dd))
               AS is_alarm
    FROM md, sig ORDER BY day
"""


@register("events_ewma_control_chart", _EWMA_SQL)
def events_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) over the daily mean event
    value: ewma_t = sum_k w_k * x_(t-k) / sum_k w_k with lambda = 0.3
    truncated at 15 lags — the truncation makes the smoother a FIXED
    15-term lag expression over the day-grain epilogue instead of a
    recursive state, so it is order-fixed, restart-free, and identical
    cross-engine (the weights are precomputed decimal literals; no
    pow() at query time). Alarm when the 1e6-QUANTIZED |x_t - ewma_t|
    exceeds 3 sigma of the daily means (integer deviation, so 1-ulp
    float noise on a zero-variance history cannot alarm), with sigma^2
    from the exact integer identity
    (D*Sm2 - Sm^2)/D^2 over 1e6-quantized means in HUGEINT/decimal.
    Scale shape: one day-grain hash agg over the scan, then windows
    over a calendar-bounded frame (single-partition window is fine at
    any data scale — rows = days)."""
    e = _t(spark, sf_dir, "events")
    daily = e.select(
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("vq"),
    ).groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vq").alias("sq"),
    )
    return ewma_readout(daily)


def ewma_readout(daily: DataFrame) -> DataFrame:
    """The EWMA chart epilogue over a day-grain (d, n, sq) table —
    shared VERBATIM by the batch query above and the streaming monitor
    (streaming/control_stream.py), so batch and stream readings are
    equal by construction, not by parallel maintenance."""
    daily = daily.select(
        "d",
        "n",
        (F.col("sq") * 1.0 / (F.col("n") * 100.0)).alias("mean_d"),
    ).localCheckpoint(eager=True)  # day-grain; feeds ewma AND sigma
    w = Window.orderBy("d")
    num = None
    den = None
    for k, wt in enumerate(_EWMA_W):
        lagged = F.lag("mean_d", k).over(w)
        t_num = F.when(lagged.isNull(), 0.0).otherwise(
            F.lit(float(wt)) * lagged
        )
        t_den = F.when(lagged.isNull(), 0.0).otherwise(F.lit(float(wt)))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    md = daily.select(
        "d",
        "n",
        "mean_d",
        (num / den).alias("ewma"),
        F.round(F.col("mean_d") * 1000000.0).cast("bigint").alias("mq"),
    )
    mq_dec = F.col("mq").cast("decimal(18,0)")
    sig = md.agg(
        F.count(F.lit(1)).alias("dd"),
        F.sum(mq_dec).alias("sm"),
        F.sum(mq_dec * mq_dec).alias("sm2"),
    )
    return (
        md.crossJoin(F.broadcast(sig))
        .select(
            F.col("d").alias("day"),
            F.col("n").alias("n_events"),
            F.round("mean_d", 4).alias("daily_mean"),
            F.round("ewma", 4).alias("ewma"),
            (
                F.abs(
                    F.col("mq")
                    - F.round(F.col("ewma") * 1000000.0).cast("bigint")
                )
                > 3.0
                * F.sqrt(
                    (
                        F.col("dd") * F.col("sm2")
                        - F.col("sm") * F.col("sm")
                    ).cast("double")
                    / (F.col("dd") * F.col("dd"))
                )
            ).alias("is_alarm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# MAD robust anomaly summary over daily means (Iglewicz-Hoaglin)
# ---------------------------------------------------------------------------

_MAD_SQL = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
        FROM events GROUP BY 1
    ), md AS (
        SELECT d, CAST(ROUND(sq * 10000.0 / n) AS BIGINT) AS mq
        FROM daily
    ), med AS (
        SELECT median(mq) AS m FROM md
    ), dev AS (
        SELECT md.mq, ABS(md.mq - med.m) AS ad FROM md, med
    ), mad AS (
        SELECT median(ad) AS mad FROM dev
    )
    SELECT CAST((SELECT COUNT(*) FROM md) AS BIGINT) AS n_days,
           ROUND(med.m / 1000000.0, 4) AS median_daily_mean,
           ROUND(mad.mad / 1000000.0, 4) AS mad_daily_mean,
           CAST((SELECT COUNT(*) FROM dev, mad
                 WHERE mad.mad > 0
                   AND 0.6745 * dev.ad > 3.5 * mad.mad) AS BIGINT)
               AS n_anomaly_days,
           ROUND((SELECT MAX(0.6745 * dev.ad / mad.mad)
                  FROM dev, mad WHERE mad.mad > 0), 4) AS max_abs_rz
    FROM med, mad
"""


@register("events_mad_anomaly_days", _MAD_SQL)
def events_mad_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly census over daily mean event value using the
    median/MAD modified z-score (Iglewicz & Hoaglin 1993): a day is
    anomalous when 0.6745*|x - med|/MAD > 3.5. Median and MAD replace
    mean/stddev so one corrupted day cannot both shift the center and
    inflate the yardstick that should catch it. Daily means quantize
    to 1e6-scaled BIGINTs (sq*1e4/n: cents * 1e4); both engines'
    medians linearly interpolate midpoints of those ints — (a+b)/2 on
    ints < 2^52 is exact. The anomaly predicate cross-multiplies
    (0.6745*ad > 3.5*mad) on identically-derived doubles. Scale: one
    day-grain agg; everything after is a days-sized epilogue with two
    medians over a calendar-bounded set."""
    e = _t(spark, sf_dir, "events")
    md = (
        e.select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("vq"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vq").alias("sq"),
        )
        .select(
            F.round(F.col("sq") * 10000.0 / F.col("n"))
            .cast("bigint")
            .alias("mq")
        )
        .localCheckpoint(eager=True)  # day-grain; feeds med, dev, mad
    )
    med = md.agg(F.percentile("mq", F.lit(0.5)).alias("m"))
    dev = (
        md.crossJoin(F.broadcast(med))
        .select("mq", F.abs(F.col("mq") - F.col("m")).alias("ad"), "m")
        .localCheckpoint(eager=True)  # feeds mad AND the flag census
    )
    mad = dev.agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"),
        F.min("m").alias("m"),
        F.count(F.lit(1)).alias("n_days"),
    )
    flagged = dev.crossJoin(F.broadcast(mad.select("mad"))).agg(
        F.sum(
            F.when(
                (F.col("mad") > 0)
                & (0.6745 * F.col("ad") > 3.5 * F.col("mad")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomaly_days"),
        F.round(
            F.max(
                F.when(
                    F.col("mad") > 0,
                    0.6745 * F.col("ad") / F.col("mad"),
                )
            ),
            4,
        ).alias("max_abs_rz"),
    )
    return mad.crossJoin(F.broadcast(flagged)).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.col("m") / 1000000.0, 4).alias("median_daily_mean"),
        F.round(F.col("mad") / 1000000.0, 4).alias("mad_daily_mean"),
        "n_anomaly_days",
        "max_abs_rz",
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal profile + seasonal strength
# ---------------------------------------------------------------------------

_DOW_SQL = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               dayofweek(date_trunc('day', ts)) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
        FROM events GROUP BY 1, 2
    ), md AS (
        SELECT dow, n, CAST(ROUND(sq * 10000.0 / n) AS BIGINT) AS mq
        FROM daily
    ), per_dow AS (
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n) AS BIGINT) AS n_events,
               SUM(CAST(mq AS HUGEINT)) AS sm,
               SUM(CAST(mq AS HUGEINT) * CAST(mq AS HUGEINT)) AS sm2
        FROM md GROUP BY dow
    ), parts AS (
        SELECT dow, n_days, n_events, sm,
               CAST(ROUND(CAST(n_days * sm2 - sm * sm AS DOUBLE) / n_days)
                    AS BIGINT) AS ssw_term
        FROM per_dow
    ), tot AS (
        SELECT SUM(CAST(a.n_days AS HUGEINT)) AS dd,
               SUM(a.sm) AS tsm, SUM(a.sm2) AS tsm2,
               (SELECT SUM(ssw_term) FROM parts) AS ssw
        FROM per_dow a
    )
    SELECT p.dow,
           p.n_days, p.n_events,
           ROUND(CAST(p.sm AS DOUBLE) / (p.n_days * 1000000.0), 4)
               AS mean_value,
           ROUND(1.0 - CAST(t.ssw AS DOUBLE)
                       / (CAST(t.dd * t.tsm2 - t.tsm * t.tsm AS DOUBLE)
                          / CAST(t.dd AS DOUBLE)), 4) AS seasonal_strength
    FROM parts p, tot t ORDER BY p.dow
"""


@register("events_dow_seasonal_profile", _DOW_SQL)
def events_dow_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily mean event value:
    the 7-row DOW profile plus the seasonal STRENGTH 1 - SSW/SST (the
    variance fraction the weekly cycle explains — STL's strength
    statistic computed from sufficient statistics). Every sum is exact
    (1e6-quantized daily means in HUGEINT/decimal); each per-dow
    within-group term (n*Sm2 - Sm^2)/n takes its one division and
    re-quantizes to a BIGINT before the 7-term rollup, so the rollup
    stays an exact integer sum. DOW convention pinned cross-engine:
    DuckDB dayofweek is Sunday=0, Spark dayofweek is Sunday=1, so the
    Spark side subtracts 1. Scale: one day-grain agg; all else is a
    7-row epilogue with a 1-row broadcast combine."""
    e = _t(spark, sf_dir, "events")
    md = (
        e.select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("vq"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vq").alias("sq"),
        )
        .select(
            (F.dayofweek("d") - 1).alias("dow"),
            "n",
            F.round(F.col("sq") * 10000.0 / F.col("n"))
            .cast("bigint")
            .alias("mq"),
        )
    )
    mq_dec = F.col("mq").cast("decimal(18,0)")
    per_dow = md.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum(mq_dec).alias("sm"),
        F.sum(mq_dec * mq_dec).alias("sm2"),
    )
    parts = per_dow.select(
        "dow",
        "n_days",
        "n_events",
        "sm",
        "sm2",
        F.round(
            (
                F.col("n_days") * F.col("sm2") - F.col("sm") * F.col("sm")
            ).cast("double")
            / F.col("n_days")
        )
        .cast("bigint")
        .alias("ssw_term"),
    )
    tot = parts.agg(
        F.sum("n_days").alias("dd"),
        F.sum("sm").alias("tsm"),
        F.sum("sm2").alias("tsm2"),
        F.sum("ssw_term").alias("ssw"),
    )
    return (
        parts.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            "n_events",
            F.round(
                F.col("sm").cast("double") / (F.col("n_days") * 1000000.0),
                4,
            ).alias("mean_value"),
            F.round(
                1.0
                - F.col("ssw").cast("double")
                / (
                    (
                        F.col("dd") * F.col("tsm2")
                        - F.col("tsm") * F.col("tsm")
                    ).cast("double")
                    / F.col("dd").cast("double")
                ),
                4,
            ).alias("seasonal_strength"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over monthly order revenue
# ---------------------------------------------------------------------------

_TS_SQL = """
    WITH monthly AS (
        SELECT (CAST(year(o_orderdate) AS BIGINT) - 1992) * 12
                   + CAST(month(o_orderdate) AS BIGINT) AS t,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rq
        FROM orders GROUP BY 1
    ), pairs AS (
        SELECT (b.rq - a.rq) / ((b.t - a.t) * 100.0) AS slope
        FROM monthly a JOIN monthly b ON b.t > a.t
    ), sl AS (
        SELECT median(slope) AS ts_slope,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs
    ), ic AS (
        SELECT median(m.rq / 100.0 - sl.ts_slope * m.t) AS ts_intercept
        FROM monthly m, sl
    )
    SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_months,
           sl.n_pairs,
           ROUND(sl.ts_slope, 2) AS ts_slope,
           ROUND(ic.ts_intercept, 2) AS ts_intercept
    FROM sl, ic
"""


@register("orders_theil_sen_trend", _TS_SQL)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly order revenue: the median of
    all pairwise slopes (Sen 1968) — up to 29.3% of months can be
    corrupted before the slope moves, vs 0% for OLS. The pair join is
    over the MONTHLY rollup, so its size is calendar-bounded (~80
    months -> ~3k pairs) and INDEPENDENT of data scale — the classic
    "aggregate first, then do the quadratic thing on the bounded
    epilogue" shape; Spark broadcasts the 80-row side. Revenue sums
    are exact cents; each pair slope takes one division of exact ints;
    medians interpolate identically cross-engine. The intercept is the
    median residual med(y - slope*t) (Conover's form)."""
    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.select(
            (
                (F.year("o_orderdate").cast("bigint") - 1992) * 12
                + F.month("o_orderdate").cast("bigint")
            ).alias("t"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("rq"),
        )
        .groupBy("t")
        .agg(F.sum("rq").alias("rq"))
        .localCheckpoint(eager=True)  # month-grain; feeds pairs x2 + ic
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("b.t") > F.col("a.t")
    ).select(
        (
            (F.col("b.rq") - F.col("a.rq"))
            / ((F.col("b.t") - F.col("a.t")) * 100.0)
        ).alias("slope")
    )
    sl = pairs.agg(
        F.percentile("slope", F.lit(0.5)).alias("ts_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    ic = monthly.crossJoin(F.broadcast(sl)).agg(
        F.percentile(
            F.col("rq") / 100.0 - F.col("ts_slope") * F.col("t"),
            F.lit(0.5),
        ).alias("ts_intercept"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.min("ts_slope").alias("ts_slope"),
        F.min("n_pairs").alias("n_pairs"),
    )
    return ic.select(
        "n_months",
        "n_pairs",
        F.round("ts_slope", 2).alias("ts_slope"),
        F.round("ts_intercept", 2).alias("ts_intercept"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive backtest (12-month lag forecast) over monthly revenue
# ---------------------------------------------------------------------------

_SNAIVE_SQL = """
    WITH monthly AS (
        SELECT (CAST(year(o_orderdate) AS BIGINT) - 1992) * 12
                   + CAST(month(o_orderdate) AS BIGINT) AS t,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rq
        FROM orders GROUP BY 1
    ), scored AS (
        SELECT cur.t, cur.rq, prev.rq AS fq,
               CAST(ROUND(ABS(cur.rq - prev.rq) * 1000000.0 / cur.rq)
                    AS BIGINT) AS ape_scaled,
               CAST(ROUND((cur.rq - prev.rq) * 1000000.0 / cur.rq)
                    AS BIGINT) AS pe_scaled
        FROM monthly cur JOIN monthly prev ON prev.t = cur.t - 12
        WHERE cur.rq > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored_months,
           ROUND(SUM(ape_scaled) / (COUNT(*) * 10000.0), 4) AS mape_pct,
           ROUND(SUM(pe_scaled) / (COUNT(*) * 10000.0), 4) AS bias_pct,
           CAST(SUM(CASE WHEN ape_scaled > 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_months_gt20pct
    FROM scored
"""


@register("orders_seasonal_naive_backtest", _SNAIVE_SQL)
def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast month t's revenue with month
    t-12's, score MAPE / signed bias / months-over-20%-error — the
    forecasting BASELINE every fancier model must beat (and the honest
    companion to q6_forecast_revenue's point estimate). The 12-lag
    join is a self-join of the calendar-bounded monthly rollup
    (broadcast). Per-month percentage errors take one division of
    exact cents and quantize to 1e6-scaled BIGINTs, so the MAPE/bias
    rollups are exact integer sums with one trailing division; the
    >20% flag compares the scaled int against a constant."""
    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.select(
            (
                (F.year("o_orderdate").cast("bigint") - 1992) * 12
                + F.month("o_orderdate").cast("bigint")
            ).alias("t"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("rq"),
        )
        .groupBy("t")
        .agg(F.sum("rq").alias("rq"))
        .localCheckpoint(eager=True)  # month-grain; feeds cur AND prev
    )
    cur = monthly.alias("cur")
    prev = monthly.alias("prev")
    scored = (
        cur.join(
            F.broadcast(prev),
            F.col("prev.t") == F.col("cur.t") - 12,
        )
        .where(F.col("cur.rq") > 0)
        .select(
            F.round(
                F.abs(F.col("cur.rq") - F.col("prev.rq"))
                * 1000000.0
                / F.col("cur.rq")
            )
            .cast("bigint")
            .alias("ape_scaled"),
            F.round(
                (F.col("cur.rq") - F.col("prev.rq"))
                * 1000000.0
                / F.col("cur.rq")
            )
            .cast("bigint")
            .alias("pe_scaled"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored_months"),
        F.round(
            F.sum("ape_scaled") / (F.count(F.lit(1)) * 10000.0), 4
        ).alias("mape_pct"),
        F.round(
            F.sum("pe_scaled") / (F.count(F.lit(1)) * 10000.0), 4
        ).alias("bias_pct"),
        F.sum(F.when(F.col("ape_scaled") > 200000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_months_gt20pct"),
    )


# ---------------------------------------------------------------------------
# Per-label centroid shift between data halves (linear-kernel MMD)
# ---------------------------------------------------------------------------

_CSHIFT_SQL = """
    WITH dims AS (
        SELECT unnest(generate_series(1, 64)) AS i
    ), pe AS (
        SELECT label, vec_id % 2 = 0 AS is_a, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS vq
        FROM embeddings, dims
    ), sums AS (
        SELECT label, i,
               SUM(CASE WHEN is_a THEN CAST(vq AS HUGEINT) ELSE 0 END) AS sa,
               SUM(CASE WHEN NOT is_a THEN CAST(vq AS HUGEINT) ELSE 0 END)
                   AS sb,
               SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS na_i,
               SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS nb_i
        FROM pe GROUP BY label, i
    ), lab AS (
        SELECT label,
               MAX(na_i) AS na, MAX(nb_i) AS nb,
               SUM(sa * sb) AS dot,
               SUM(sa * sa) AS a2,
               SUM(sb * sb) AS b2
        FROM sums GROUP BY label
    )
    SELECT label,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(CAST(dot AS DOUBLE)
                 / sqrt(CAST(a2 AS DOUBLE) * CAST(b2 AS DOUBLE)), 6)
               AS centroid_cosine,
           ROUND(sqrt(CAST(a2 AS DOUBLE) / (CAST(na AS DOUBLE) * na)
                      - 2.0 * CAST(dot AS DOUBLE)
                        / (CAST(na AS DOUBLE) * nb)
                      + CAST(b2 AS DOUBLE) / (CAST(nb AS DOUBLE) * nb))
                 / 1000000.0, 6) AS linear_mmd
    FROM lab WHERE na > 0 AND nb > 0 ORDER BY label
"""


@register("embeddings_centroid_shift_drift", _CSHIFT_SQL)
def embeddings_centroid_shift_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation-drift monitor: split each label's vectors into
    two halves by vec_id parity (old/new feed stand-in), compare the
    half-centroids by cosine and by L2 distance — the latter IS the
    exact linear-kernel MMD (Gretton et al. 2012): ||mu_a - mu_b||.
    Cosine is scale-invariant, so it is computed directly on the
    component SUMS; the MMD expands as a2/na^2 - 2*dot/(na*nb) +
    b2/nb^2 — all three terms are exact decimal(38,0)/HUGEINT sums of
    products of 1e6-quantized component sums (the silhouette pattern:
    sums reach n*2e6, squares would wrap int64 silently). Divisions
    and the sqrt happen once, at the 1-row-per-label epilogue. Scale:
    one (label, dim) shuffle of bounded cardinality — labels x 64 rows
    — and everything after is label-sized."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 2 == 0).alias("is_a"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "label",
        "is_a",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("val").cast("double") * 1000000.0)
        .cast("bigint")
        .alias("vq"),
    )
    sums = pe.groupBy("label", "i").agg(
        F.sum(F.when(F.col("is_a"), F.col("vq")).otherwise(0))
        .cast("decimal(18,0)")
        .alias("sa"),
        F.sum(F.when(~F.col("is_a"), F.col("vq")).otherwise(0))
        .cast("decimal(18,0)")
        .alias("sb"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na_i"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb_i"),
    )
    lab = sums.groupBy("label").agg(
        F.max("na_i").alias("na"),
        F.max("nb_i").alias("nb"),
        F.sum(F.col("sa") * F.col("sb")).alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).alias("a2"),
        F.sum(F.col("sb") * F.col("sb")).alias("b2"),
    )
    return (
        lab.where((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "label",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("a2").cast("double") * F.col("b2").cast("double")
                ),
                6,
            ).alias("centroid_cosine"),
            F.round(
                F.sqrt(
                    F.col("a2").cast("double")
                    / (F.col("na").cast("double") * F.col("na"))
                    - 2.0
                    * F.col("dot").cast("double")
                    / (F.col("na").cast("double") * F.col("nb"))
                    + F.col("b2").cast("double")
                    / (F.col("nb").cast("double") * F.col("nb"))
                )
                / 1000000.0,
                6,
            ).alias("linear_mmd"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Fano-factor burstiness per event type (hour-spined)
# ---------------------------------------------------------------------------

_FANO_SQL = """
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), counts AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), filled AS (
        SELECT t.event_type, hrs.h, COALESCE(c.c, 0) AS c
        FROM types t CROSS JOIN hours hrs
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.h = hrs.h
    ), agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(c) AS BIGINT) AS n_events,
               SUM(CAST(c AS HUGEINT) * c) AS s2
        FROM filled GROUP BY event_type
    )
    SELECT event_type, n_hours, n_events,
           ROUND(CAST(n_hours * s2 - CAST(n_events AS HUGEINT) * n_events
                      AS DOUBLE)
                 / (CAST(n_hours AS DOUBLE) * n_events), 4) AS fano,
           2 * (n_hours * s2 - CAST(n_events AS HUGEINT) * n_events)
               > 3 * CAST(n_hours AS HUGEINT) * n_events AS is_bursty
    FROM agg WHERE n_events > 0 ORDER BY event_type
"""


@register("events_burstiness_fano", _FANO_SQL)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type via the Fano factor (index of
    dispersion) of HOURLY arrival counts on a zero-filled hour spine:
    Fano = var/mean; a Poisson-regular feed sits at 1, machine bursts
    and replay storms push it up — the feed-regularity gate next to
    the interarrival stats. The spine is generated from a 1-row bounds
    aggregate (calendar-bounded, broadcastable) so silent hours COUNT
    (omitting them biases Fano down exactly when the feed stalls).
    Fano reduces to exact integers: (H*S2 - N^2)/(H*N) with S2 in
    HUGEINT/decimal; one division; the >1.5 burst flag
    cross-multiplies ints (2*(H*S2 - N^2) > 3*H*N)."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = e.select("event_type").distinct()
    counts = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    filled = (
        types.crossJoin(F.broadcast(hours))
        .join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    c_dec = F.col("c").cast("decimal(18,0)")
    agg = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(c_dec * c_dec).alias("s2"),
    )
    n_dec = F.col("n_events").cast("decimal(18,0)")
    var_num = (F.col("n_hours") * F.col("s2") - n_dec * n_dec)
    return (
        agg.where(F.col("n_events") > 0)
        .select(
            "event_type",
            "n_hours",
            "n_events",
            F.round(
                var_num.cast("double")
                / (F.col("n_hours").cast("double") * F.col("n_events")),
                4,
            ).alias("fano"),
            (
                2 * var_num
                > 3 * F.col("n_hours").cast("decimal(18,0)") * n_dec
            ).alias("is_bursty"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue vs its median
# ---------------------------------------------------------------------------

_RUNS_SQL = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rq
        FROM orders GROUP BY 1
    ), med AS (
        SELECT median(rq) AS m FROM daily
    ), signs AS (
        SELECT d, CASE WHEN rq > med.m THEN 1 ELSE 0 END AS s
        FROM daily, med WHERE rq != med.m
    ), runs AS (
        SELECT s,
               CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                         OR lag(s) OVER (ORDER BY d) != s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ), agg AS (
        SELECT CAST(SUM(new_run) AS BIGINT) AS r,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
        FROM runs
    )
    SELECT n1 + n2 AS n_days, r AS n_runs,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1, 4) AS expected_runs,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
                           * (n1 + n2 - 1))), 4) AS z_stat,
           ABS((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
               / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                      / ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
                         * (n1 + n2 - 1)))) > 1.96 AS reject_random
    FROM agg
"""


@register("orders_runs_test", _RUNS_SQL)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test: is the daily-revenue series random
    around its median, or does it trend/oscillate (too few runs =
    positive autocorrelation/trend; too many = alternation)? The
    nonparametric companion to orders_daily_autocorr — no distribution
    assumed. Day grain is calendar-bounded; runs count via a lag
    window over the ordered days (order-fixed); n1/n2/R are exact ints
    and the z formula is one fixed expression of them, identical
    cross-engine. Ties (rq == median) are excluded, the standard
    treatment."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("rq"),
        )
        .groupBy("d")
        .agg(F.sum("rq").alias("rq"))
        .localCheckpoint(eager=True)  # day-grain; feeds med AND signs
    )
    med = daily.agg(F.percentile("rq", F.lit(0.5)).alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rq") != F.col("m"))
        .select(
            "d", F.when(F.col("rq") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sig = F.sqrt(
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (((n1 + n2).cast("double") * (n1 + n2)) * (n1 + n2 - 1))
    )
    return agg.select(
        (n1 + n2).alias("n_days"),
        r.alias("n_runs"),
        F.round(mu, 4).alias("expected_runs"),
        F.round((r - mu) / sig, 4).alias("z_stat"),
        (F.abs((r - mu) / sig) > 1.96).alias("reject_random"),
    )


# ---------------------------------------------------------------------------
# Binary-segmentation changepoint: optimal single split of the daily series
# ---------------------------------------------------------------------------

_BSEG_SQL = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
        FROM events GROUP BY 1
    ), cum AS (
        SELECT d,
               SUM(n) OVER w AS nl,
               SUM(sq) OVER w AS sl
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), tot AS (
        SELECT SUM(n) AS nt, SUM(sq) AS st FROM daily
    ), scored AS (
        SELECT c.d, c.nl, t.nt - c.nl AS nr, c.sl, t.st - c.sl AS sr,
               CAST((CAST(c.sl AS HUGEINT) * (t.nt - c.nl)
                     - CAST(t.st - c.sl AS HUGEINT) * c.nl)
                    * (CAST(c.sl AS HUGEINT) * (t.nt - c.nl)
                       - CAST(t.st - c.sl AS HUGEINT) * c.nl)
                    AS DOUBLE)
                   / (CAST(c.nl AS DOUBLE) * (t.nt - c.nl)) AS bss
        FROM cum c, tot t
        WHERE t.nt - c.nl > 0
    )
    SELECT d AS split_day,
           CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           ROUND(CAST(sl AS DOUBLE) / (nl * 100.0), 4) AS mean_left,
           ROUND(CAST(sr AS DOUBLE) / (nr * 100.0), 4) AS mean_right,
           ROUND(bss / 10000.0, 4) AS bss
    FROM scored
    ORDER BY bss DESC, split_day ASC
    LIMIT 3
"""


@register("events_binary_segmentation_split", _BSEG_SQL)
def events_binary_segmentation_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Optimal single changepoint of the daily event-value series by
    binary segmentation: the split that maximizes the between-segment
    sum of squares BSS(t) = (S_L·n_R − S_R·n_L)² / (n_L·n_R·N) — the
    first recursion of the classic top-down changepoint detector, and
    the "where did the level shift actually happen" answer that the
    CUSUM/EWMA monitors (this module) only flag. Top-3 candidate
    splits are reported so a flat series is visibly flat.

    Determinism: daily sums are exact cent-quantized BIGINTs; the BSS
    numerator is an exact HUGEINT/decimal(38,0) square (|S_L·n_R| ≤
    ~1e13 at sf0.1, ≤ ~1e26 squared — inside 38 digits at the 100 TB
    row count with the same headroom math as the DoReMi sums); one
    IEEE division, ROUND(…/1e4, 4) = cents² → value² units. The
    constant N in the BSS denominator is dropped (rank-invariant).
    Scale: one day-grain agg, then a prefix-sum window and argmax over
    the calendar-bounded day set — the recursion depth is the only
    multiplier, and each level re-runs the SAME day-grain epilogue."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("vq"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("vq").alias("sq"),
        )
    )
    w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "d",
        F.sum("n").over(w).alias("nl"),
        F.sum("sq").over(w).alias("sl"),
    )
    tot = daily.agg(
        F.sum("n").alias("nt"), F.sum("sq").alias("st")
    )
    dec = "decimal(38,0)"
    nr = F.col("nt") - F.col("nl")
    sr = F.col("st") - F.col("sl")
    num = (
        F.col("sl").cast(dec) * nr.cast(dec)
        - sr.cast(dec) * F.col("nl").cast(dec)
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(nr > 0)
        .select(
            "d",
            F.col("nl"),
            nr.alias("nr"),
            "sl",
            sr.alias("sr"),
            ((num * num).cast("double") / (
                F.col("nl").cast("double") * nr.cast("double")
            )).alias("bss"),
        )
    )
    return (
        scored.select(
            F.col("d").alias("split_day"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            F.round(F.col("sl").cast("double") / (F.col("nl") * 100.0), 4)
            .alias("mean_left"),
            F.round(F.col("sr").cast("double") / (F.col("nr") * 100.0), 4)
            .alias("mean_right"),
            F.round(F.col("bss") / 10000.0, 4).alias("bss"),
        )
        .orderBy(F.desc("bss"), F.asc("split_day"))
        .limit(3)
    )

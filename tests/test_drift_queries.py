"""Drift/forensics queries (plans/drift_queries.py): semantic invariants
beyond the cross-engine hash — the statistics must behave like the
theory says (bounds, normalization, alarm consistency), and the
detectors must actually FIRE on a synthetically drifted input (a green
oracle row only proves both engines agree, not that the alarm works).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans import drift_queries as DQ
from tests.conftest import SF_DIR


def test_ks_binned_bounds_and_alarm_consistency(spark):
    rows = DQ.events_ks_binned_two_sample(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.ks_crit_05 > 0.0
    assert r.reject_h0 == (r.ks_stat > r.ks_crit_05)


def test_cusum_nonnegative_and_peak_in_range(spark):
    rows = DQ.events_cusum_drift(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r.max_cusum >= 0.0
        assert r.n_days >= 1
        assert r.drift_flag == (r.max_cusum > 5.0)


def test_cusum_fires_on_synthetic_level_shift(spark, tmp_path):
    """A series flat at 100/day for 20 days then 130/day for 10 days
    must push the one-sided CUSUM well past a stationary series' —
    the detector detects. Built as a parquet events table so the query
    runs unmodified."""
    rows = []
    eid = 0
    for day in range(1, 31):
        n = 100 if day <= 20 else 130
        for i in range(n):
            rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "shift", 1.0, "{}"))
            eid += 1
        for i in range(100):
            rows.append((eid, f"2024-01-{day:02d} 13:00:00", 2, "flat", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "drift_sf")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    out = {r.event_type: r for r in DQ.events_cusum_drift(spark, d).collect()}
    assert out["shift"].max_cusum > out["flat"].max_cusum + 1.0
    assert out["shift"].drift_flag
    # peak lands in the shifted regime
    assert out["shift"].peak_day.day > 20


def test_benford_zero_backfill_and_chi2(spark):
    rows = DQ.orders_benford_audit(spark, SF_DIR).collect()
    assert len(rows) == 5  # one per priority class
    for r in rows:
        assert r.chi2 >= 0.0
        assert 1 <= r.max_dev_digit <= 9
        assert r.benford_reject == (r.chi2 > 15.507)
    # fixture prices are uniform, decidedly non-Benford: every class fires
    assert all(r.benford_reject for r in rows)


def test_benford_accepts_benford_distributed_digits(spark, tmp_path):
    """Prices drawn AS Benford first-digit masses must not reject —
    the negative control for the forensic."""
    rows, oid = [], 0
    for d in range(1, 10):
        n = int(round(3000 * math.log10(1.0 + 1.0 / d)))
        for i in range(n):
            rows.append((oid, 1, "F", d * 1000.0 + (oid % 997), "2024-01-01 00:00:00", "1-TEST"))
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = str(tmp_path / "benford_sf")
    df.coalesce(1).write.parquet(f"{d}/orders.parquet")
    out = DQ.orders_benford_audit(spark, d).collect()
    assert len(out) == 1
    assert not out[0].benford_reject, f"chi2={out[0].chi2}"


def test_tcloseness_partition_and_bounds(spark):
    rows = DQ.customer_tcloseness_audit(spark, SF_DIR).collect()
    assert rows
    total = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r.n_customers for r in rows) == total  # buckets partition
    for r in rows:
        assert 0.0 <= r.max_t <= 1.0  # TVD bound
        # the bucket's max sits inside [bucket_lo, bucket_lo + 0.05]
        assert r.t_bucket_lo - 1e-9 <= r.max_t <= r.t_bucket_lo + 0.05 + 1e-9


def test_jsd_bounds_and_degenerate_zero(spark):
    rows = DQ.docs_js_divergence_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # JSD in nats is bounded by ln 2; quantization can graze 0 from
        # below by one 1e-12 quantum
        assert -1e-6 <= r.jsd_vs_corpus <= math.log(2.0) + 1e-6
        assert r.n_tokens > 0


def test_bigram_surprisal_positive_and_ppl_consistent(spark):
    rows = DQ.docs_bigram_lm_surprisal_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.avg_surprisal > 0.0  # add-one smoothing ⇒ P < 1 strictly
        assert r.perplexity == pytest.approx(
            round(math.exp(r.avg_surprisal), 2), abs=1e-9
        )
        assert r.n_bigrams > 0


def test_psi_nonnegative_and_flag_consistent(spark):
    rows = DQ.events_psi_value_drift(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.psi >= 0.0  # PSI is a symmetrized KL: nonnegative
        assert r.drift_flag == (r.psi > 0.2)
        assert r.n_first_half > 0 and r.n_second_half > 0


def test_psi_zero_on_identical_halves(spark, tmp_path):
    """A stream whose two halves are value-identical must score PSI == 0
    exactly (the smoothed p's coincide bin-for-bin)."""
    rows = []
    for half, day in ((0, 1), (1, 20)):
        for i in range(500):
            rows.append(
                (i + half * 500, f"2024-01-{day:02d} 10:00:00", 1, "x",
                 float((i * 7) % 400), "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "psi_sf")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    out = DQ.events_psi_value_drift(spark, d).collect()
    assert len(out) == 1
    assert out[0].psi == 0.0
    assert not out[0].drift_flag


def test_heaps_beta_in_sublinear_band(spark):
    rows = DQ.docs_heaps_law_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # V_cum is nondecreasing in N_cum, so the OLS slope is >= 0;
        # <= 1 since vocabulary can't outgrow tokens. The synthetic
        # fixture's tiny fixed vocabulary saturates by decile 1, so
        # beta ~ 0 here is CORRECT (the template-spam signature the
        # synthetic-control test exercises from both sides).
        assert 0.0 <= r.heaps_beta <= 1.0 + 1e-9
        assert r.n_points >= 3


def test_heaps_flat_for_fixed_vocab_repetition(spark, tmp_path):
    """A source that repeats one fixed sentence grows no vocabulary
    after decile 0: its beta must sit near 0, far under a source with
    fresh words per doc — the detector separates template spam from
    growing text."""
    rows = []
    for i in range(50):
        rows.append((i, "the same five words again", "en", "template", 25))
    for i in range(50, 100):
        rows.append((i, f"fresh w{i}a w{i}b w{i}c w{i}d", "en", "growing", 25))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "heaps_sf")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {r.source: r.heaps_beta for r in DQ.docs_heaps_law_by_source(spark, d).collect()}
    assert out["template"] < 0.05
    assert out["growing"] > 0.5
    assert out["template"] < out["growing"]


def test_mannwhitney_auc_bounds_and_symmetry(spark):
    rows = DQ.events_mannwhitney_auc(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r.auc <= 1.0
    assert r.reject_h0 == (abs(r.z_score) > 1.96)
    assert r.n_a > 0 and r.n_b > 0


def test_mannwhitney_auc_detects_shift(spark, tmp_path):
    """Cohort a uniformly above cohort b must push AUC near 1 and
    reject; identical cohorts sit at exactly 0.5 (all mass in shared
    bins takes the tie half-credit)."""
    rows = []
    for i in range(400):
        rows.append((i, "2024-01-01 10:00:00", 1, "purchase", 300.0 + i % 50, "{}"))
        rows.append((i + 400, "2024-01-01 10:00:00", 2, "click", 10.0 + i % 50, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "mw_sf")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    out = DQ.events_mannwhitney_auc(spark, d).collect()[0]
    assert out.auc > 0.99 and out.reject_h0

    rows2 = [
        (i, "2024-01-01 10:00:00", 1,
         "purchase" if i % 2 == 0 else "click", float(i % 200), "{}")
        for i in range(800)
    ]
    df2 = spark.createDataFrame(
        rows2,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d2 = str(tmp_path / "mw_sf2")
    df2.coalesce(1).write.parquet(f"{d2}/events.parquet")
    out2 = DQ.events_mannwhitney_auc(spark, d2).collect()[0]
    assert out2.auc == pytest.approx(0.5, abs=1e-9)
    assert not out2.reject_h0


def test_autocorr_bounds_and_pair_counts(spark):
    rows = DQ.orders_daily_autocorr(spark, SF_DIR).collect()
    assert [r.lag for r in rows] == [1, 7]
    for r in rows:
        assert -1.0 - 1e-9 <= r.autocorr <= 1.0 + 1e-9
        assert r.n_pairs > 0
    # longer lag cannot have MORE pairs on a fixed calendar
    assert rows[1].n_pairs <= rows[0].n_pairs


def test_autocorr_detects_weekly_cadence(spark, tmp_path):
    """A series with a strong 7-day cycle must score lag-7 autocorr
    near 1 and far above lag-1."""
    import datetime as _dt

    rows, oid = [], 0
    for day in range(90):
        n = 200 if day % 7 == 0 else 20
        date = _dt.date(1995, 1, 1) + _dt.timedelta(days=day)
        for i in range(n):
            rows.append((oid, 1, "F", 1000.0, f"{date} 00:00:00", "1-X"))
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = str(tmp_path / "acf_sf")
    df.coalesce(1).write.parquet(f"{d}/orders.parquet")
    out = {r.lag: r.autocorr for r in DQ.orders_daily_autocorr(spark, d).collect()}
    assert out[7] > 0.8
    assert out[7] > out[1] + 0.5


def test_markov_entropy_bounds_and_consistency(spark):
    import math as _math

    rows = DQ.events_markov_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # conditional entropy over <= 5 next states
        assert -1e-9 <= r.entropy_nats <= _math.log(5.0) + 1e-6
        assert r.branching_factor == pytest.approx(
            round(_math.exp(r.entropy_nats), 4), abs=1e-9
        )
        assert r.n_transitions > 0


def test_fellegi_sunter_weight_structure(spark):
    """Histogram partitions the blocked pair set; bucket edges contain
    their min/max; and the global max score equals the sum of the three
    agree weights (recomputed here from exact marginals) — i.e. the
    scoring is the Fellegi-Sunter formula, not just monotone."""
    import math as _math

    rows = DQ.customer_fellegi_sunter_scores(spark, SF_DIR).collect()
    assert rows
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = c.count()
    blocked = (
        c.groupBy("c_nationkey").count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .collect()[0][0]
    )
    assert sum(r.n_pairs for r in rows) == int(blocked)
    for r in rows:
        assert r.score_bucket <= r.min_score + 1e-9
        assert r.max_score < r.score_bucket + 1 + 1e-9
        assert r.min_score <= r.max_score

    def u(col):
        counts = [x[0] for x in c.groupBy(col).count().select("count").collect()]
        return sum(v * v for v in counts) / (n * n)

    m = DQ._FS_M
    max_expected = sum(
        _math.log(m / u(col))
        for col in ["c_mktsegment"]
    ) + _math.log(m / (
        sum(v * v for v in [x[0] for x in c.groupBy(
            F.floor(F.col("c_acctbal") / 500.0)).count().select("count").collect()]) / (n * n)
    )) + _math.log(m / (
        sum(v * v for v in [x[0] for x in c.groupBy(
            F.col("c_acctbal") >= 0).count().select("count").collect()]) / (n * n)
    ))
    top = max(r.max_score for r in rows)
    assert top <= round(max_expected, 4) + 1e-6
    # at least one all-agree pair exists on the fixture
    assert top == pytest.approx(round(max_expected, 4), abs=1e-6)


def test_snapshot_diff_partition_arithmetic(spark):
    """The synthesized v2's change classes must reconcile exactly with
    the modular-arithmetic construction: 500 adds, deletes = keys
    %17==5, changes = surviving keys %10==3, and the classes partition
    v1 ∪ adds."""
    out = {r.change_type: r.n_rows for r in
           DQ.orders_snapshot_diff_stats(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    deleted = o.filter(F.col("o_orderkey") % 17 == 5).count()
    changed = o.filter(
        (F.col("o_orderkey") % 10 == 3) & (F.col("o_orderkey") % 17 != 5)
    ).count()
    assert out["added"] == 500
    assert out["deleted"] == deleted
    assert out["changed"] == changed
    assert out["unchanged"] == n - deleted - changed

"""Invariant tests for the scale-tooling batch: count-min sketch,
HLL register merge, single-scan constraint suite, SCD2 intervals,
equi-depth histogram, and the adaptive events-timestamp reader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators.profile import check_constraints
from clashroyale_datapipeline_agent_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
)
from clashroyale_datapipeline_agent_spark.plans import scale_queries
from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table
from tests.conftest import SF_DIR


def test_cms_one_sided_and_bounded_state(spark):
    ev = load_star_table(spark, SF_DIR, "events")
    counters = cms_counters(ev, "user_id")
    assert counters.count() <= CMS_DEPTH * CMS_WIDTH
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.orderBy(F.desc("exact_cnt"), F.asc("user_id")).limit(10)
    est = cms_estimate(counters, probes, "user_id")
    rows = est.collect()
    assert len(rows) == 10
    # CMS guarantee is one-sided: never an undercount.
    assert all(r.cms_estimate >= r.exact_cnt for r in rows)


def test_cms_total_mass_per_row(spark):
    # Each hash row sees every input once: per-row counter sums == N.
    ev = load_star_table(spark, SF_DIR, "events")
    n = ev.count()
    sums = (
        cms_counters(ev, "user_id")
        .groupBy("row_id")
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    )
    assert len(sums) == CMS_DEPTH
    assert all(r.mass == n for r in sums)


def test_hll_merge_equals_direct(spark):
    out = scale_queries.events_hll_merge_daily(spark, SF_DIR).collect()
    assert out and all(r.merge_exact for r in out)
    assert all(r.n_days >= 1 for r in out)


def test_check_constraints_single_scan(spark):
    o = load_star_table(spark, SF_DIR, "orders")
    n = F.count(F.lit(1))
    df = check_constraints(
        o,
        [
            ("row_count_min", n, n >= 10),
            ("nonneg_price", F.min("o_totalprice"), F.min("o_totalprice") >= 0.0),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    rows = {r.check: r for r in df.collect()}
    assert rows["row_count_min"].passed and rows["nonneg_price"].passed


def test_quality_checks_all_pass(spark):
    rows = scale_queries.orders_quality_checks(spark, SF_DIR).collect()
    assert len(rows) == 6
    assert all(r.passed for r in rows)


def test_equidepth_partitions_everything(spark):
    d = load_star_table(spark, SF_DIR, "documents")
    total = d.count()
    rows = scale_queries.docs_equidepth_histogram(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == total
    assert all(0 <= r.bucket <= 9 for r in rows)
    # Bucket value ranges are disjoint and ordered.
    ordered = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(ordered, ordered[1:]):
        assert a.max_chars <= b.min_chars


def test_scd2_interval_counts_bounded(spark):
    ev = load_star_table(spark, SF_DIR, "events")
    n_events = ev.count()
    rows = scale_queries.events_scd2_intervals(spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_intervals for r in rows) <= n_events
    # Open intervals: exactly one per user (the last state has no LEAD).
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_open for r in rows) == n_users
    assert all(
        r.avg_duration_s is None or r.avg_duration_s > 0 for r in rows
    )


def test_events_reader_adapts_to_micros_fixture(spark):
    # Round-3 fixtures store ts as TIMESTAMP(MICROS); the footer-sniffing
    # reader must land on the real 2024 axis, not a 1000x-compressed one.
    ev = load_star_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2000, f"time axis corrupted: {lo}"
    assert (hi - lo).days >= 1

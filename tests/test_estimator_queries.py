"""Estimator-fidelity queries (plans/estimator_queries.py): semantic
invariants pytest can pin beyond the cross-engine hash (which only proves
both engines agree — not that the estimator behaves like the theory says).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans import estimator_queries as EQ
from tests.conftest import SF_DIR_ORACLE


def _plan(spark, df) -> str:
    return spark.sparkContext._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pq_adc_seed_vectors_score_their_own_reconstruction(spark, sf_dir):
    """A codebook seed vector quantizes to itself in every subspace
    (d2=0), so its ADC distance must EQUAL the exact query-to-seed
    distance — the zero-quantization-error corner of the ADC
    approximation, checked to float tolerance."""
    from clashroyale_datapipeline_agent_spark.operators.similarity import (
        pq_adc_scores,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = (
        e.filter(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    codebooks = [
        [list(row[0][g * 8 : g * 8 + 8]) for row in seed] for g in range(8)
    ]
    query = [
        float(x)
        for x in e.filter(F.col("vec_id") == 7)
        .select("embedding")
        .collect()[0][0]
    ]
    adc = {
        r["vec_id"]: r["adc_d2"]
        for r in pq_adc_scores(
            e.filter(F.col("vec_id") < 4), codebooks, query
        ).collect()
    }
    for c, row in enumerate(seed):
        exact = sum((q - float(v)) ** 2 for q, v in zip(query, row[0]))
        assert abs(adc[c] - exact) < 1e-9, (c, adc[c], exact)


def test_pq_adc_topk_plan_is_scan_topk_broadcast_rerank(spark, sf_dir):
    """The ADC cascade must plan as: map-side code+LUT projection (no
    Python eval, no shuffle before the top-k), TakeOrderedAndProject for
    the candidate cut, and a BROADCAST join (never sort-merge) for the
    20-row exact rerank."""
    plan = _plan(spark, EQ.ann_pq_adc_topk(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_estimate_error_tracks_theory(spark, sf_dir):
    """Componentwise MinHash is unbiased with sd = sqrt(J(1-J)/H) ≤ 0.125
    at H=16; per-bucket mean absolute error on the deterministic fixture
    must stay within ~2 sd, and the estimate must be a multiple of 1/16."""
    rows = EQ.dedup_minhash_estimate_error(spark, sf_dir).collect()
    assert rows, "no candidate pairs on the fixture"
    for r in rows:
        assert 0 <= r["jacc_bucket"] <= 4
        assert r["mae"] <= 0.26, r.asDict()
        # bucketed averages live in [0, 1]
        assert 0.0 <= r["avg_est_jacc"] <= 1.0
        assert 0.0 <= r["avg_true_jacc"] <= 1.0


def test_interval_join_conversion_gaps_bounded(spark, sf_dir):
    """Every aggregated gap mass is non-negative and no single pair can
    exceed 30 minutes, so sum_gap_us ≤ n_pairs * 30min."""
    for r in EQ.events_interval_join_conversion(spark, sf_dir).collect():
        assert 0 <= r["sum_gap_us"] <= r["n_pairs"] * 30 * 60 * 1_000_000
        assert r["n_views_converted"] <= r["n_pairs"]


def test_quantile_sketch_rank_error_within_gk_bound(spark, sf_dir):
    """percentile_approx(accuracy=100) guarantees rank error ≤ 1%. The
    registry query now hashes only the order-robust 2ε boolean (round
    10); the STRICT per-run ε profile is recomputed here from the raw
    sketch (plus 1/n discreteness)."""
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
    )

    rows = EQ.events_quantile_sketch_audit(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 event types x 3 percentiles
    assert all(r["within_2eps"] for r in rows)
    ev = load_star_table(spark, sf_dir, "events").select("event_type", "value")
    ps = [0.5, 0.9, 0.99]
    plit = F.array(*[F.lit(p) for p in ps])
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", plit, F.lit(100)).alias("qs"),
    )
    est = agg.select(
        "event_type",
        "n",
        F.posexplode("qs").alias("i", "q"),
    ).select(
        "event_type", "n", F.element_at(plit, F.col("i") + 1).alias("p"), "q"
    )
    probed = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type", "p")
        .agg(
            F.first("n").alias("n"),
            (
                F.sum((F.col("value") <= F.col("q")).cast("long"))
                / F.first("n")
            ).alias("rank_at_q"),
        )
        .collect()
    )
    assert len(probed) == 15
    for r in probed:
        err = abs(r["rank_at_q"] - r["p"])
        assert err <= 0.01 + 1.0 / r["n"], (r["event_type"], r["p"], err)


def test_temporal_holdout_partitions_completely(spark, sf_dir):
    """Every event lands in exactly one split, and per event_type the
    split counts sum to the type's total (no row dropped or doubled)."""
    from pyspark.sql import functions as F2

    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
    )

    ev = load_star_table(spark, sf_dir, "events")
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F2.count(F2.lit(1)).alias("n")).collect()
    }
    got: dict[str, int] = {}
    seen_splits = set()
    for r in EQ.events_user_temporal_holdout(spark, sf_dir).collect():
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["n_events"]
        seen_splits.add(r["split"])
    assert got == totals
    assert seen_splits == {"train", "embargo", "test"}


def test_contrastive_pairs_ring_arithmetic(spark, sf_dir):
    """The no-wrap hash ring emits exactly 2 negatives per anchor except
    the last two docs of each of the 16 buckets (1 and 0), so the total
    sits in [2N - 3*16, 2N]; positives never exceed anchors."""
    r = EQ.docs_contrastive_pairs_stats(spark, sf_dir).collect()[0]
    n = r["n_anchors"]
    assert n > 0
    assert 2 * n - 3 * 16 <= r["n_negative_pairs"] <= 2 * n
    assert 0 <= r["n_with_positive"] <= n
    assert 0 <= r["n_false_negatives"] <= r["n_negative_pairs"]


def test_temporal_holdout_single_window_shuffle(spark, sf_dir):
    """One hashpartitioning exchange on user_id (the max-ts window);
    no join, no Python eval."""
    import re

    plan = _plan(spark, EQ.events_user_temporal_holdout(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L, \d+\)", plan)) == 1, plan
    assert "Join" not in plan


def test_contrastive_pairs_no_cartesian_no_udf(spark, sf_dir):
    """Positives ride the shingle equi-join, negatives the bucketed ring
    window, the audit an equi-join — nothing may plan as a cartesian
    product or Python eval (the scalar summary crossJoins are 1-row
    broadcast loops, which Spark plans as BroadcastNestedLoopJoin over
    single rows, not CartesianProduct)."""
    plan = _plan(spark, EQ.docs_contrastive_pairs_stats(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_rrf_fusion_rank_consistency(spark, sf_dir):
    """RRF output invariants: scores decrease with rank, every row keeps
    at least one source rank, and a doc ranked 1 in BOTH lists would
    dominate — concretely, rrf is bounded by 2/61 and every present rank
    is within [1, 50]."""
    rows = EQ.docs_hybrid_rrf_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert r["rank_bm25"] is not None or r["rank_fluency"] is not None
        for rk in (r["rank_bm25"], r["rank_fluency"]):
            if rk is not None:
                assert 1 <= rk <= 50
        assert r["rrf"] <= round(2 / 61, 6) + 1e-9
        if prev is not None:
            assert r["rrf"] <= prev + 1e-12  # sorted descending
        prev = r["rrf"]


def test_decayed_counts_bounded_by_raw(spark, sf_dir):
    """Half-life weights live in (0, 1] (anchor = max ts), so the
    decayed count is positive and never exceeds the raw count, and
    freshness is their ratio."""
    for r in EQ.events_decayed_counts(spark, sf_dir).collect():
        assert 0 < r["decayed_n"] <= r["n_events"]
        assert abs(r["freshness"] - round(r["decayed_n"] / r["n_events"], 4)) < 2e-4


def test_contrastive_pairs_stop_shingle_bounded(spark, tmp_path):
    """The DF ceiling on the positives join: a 60-doc corpus whose ONLY
    shared shingle is a stop-shingle (doc_freq 60 > the 50 cap) must
    produce ZERO positives — uncapped, that single skewed key would pump
    60·59/2 Jaccard-1 pairs through the shingle self-join (the quadratic
    blow-up the cap exists to prevent; at corpus scale d reaches
    millions). Docs sharing only RARE shingles (doc_freq 2) still pair."""
    rows = [(i, "in the end", "en", "syn", 10) for i in range(60)]
    rows += [
        (1000, "alpha beta gamma delta epsilon", "en", "syn", 30),
        (1001, "alpha beta gamma delta epsilon", "en", "syn", 30),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    r = EQ.docs_contrastive_pairs_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_anchors"] == 62
    # only the rare-shingle twins pair; the stop-shingle crowd does not
    assert r["n_with_positive"] == 2


def test_importance_weights_ess_hand_corpus(spark, tmp_path):
    """Kish ESS on a hand-computable 2-source corpus: 8 docs from A, 2
    from B -> w_A = 10/(2*8) = 0.625, w_B = 10/(2*2) = 2.5,
    ESS = k^2/(1/8 + 1/2) = 4/0.625 = 6.4, ess_frac = 0.64. Also the
    structural invariants: sum of n_docs*w = N and ESS <= N."""
    rows = [(i, f"doc {i}", "en", "A" if i < 8 else "B", 5) for i in range(10)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: r
        for r in EQ.docs_importance_weights_ess(spark, str(tmp_path)).collect()
    }
    assert got["A"]["weight"] == 0.625 and got["B"]["weight"] == 2.5
    assert got["A"]["ess"] == 6.4
    assert got["A"]["ess_frac"] == 0.64
    n_total = sum(r["n_docs"] for r in got.values())
    assert abs(sum(r["n_docs"] * r["weight"] for r in got.values()) - n_total) < 1e-6
    assert got["A"]["ess"] <= n_total


def test_quality_calibration_bins_partition_corpus(spark, sf_dir):
    """The decile bins PARTITION the corpus (sum of n_docs equals the
    table count — a doc on a boundary lands in exactly one bin), scores
    and label fractions are valid, and bins come out ordered."""
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
    )

    rows = EQ.docs_quality_calibration_bins(spark, sf_dir).collect()
    n = load_star_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
    buckets = [r["bucket"] for r in rows]
    assert buckets == sorted(buckets) and 0 <= buckets[0] <= buckets[-1] <= 9
    for r in rows:
        assert 0.0 <= r["frac_en"] <= 1.0
        assert 0.0 <= r["mean_score"] <= 1.0


def test_lang_id_kappa_consistent_with_confusion(spark, sf_dir):
    """Kappa must be recomputable from the confusion matrix it grades:
    replay p_o/p_e from lang_id_confusion's rows and match, and the
    bounds hold (p_e in (0,1), kappa <= 1, kappa <= p_o when p_e > 0)."""
    from clashroyale_datapipeline_agent_spark.plans.text_queries import (
        lang_id_confusion,
    )

    r = EQ.lang_id_kappa(spark, sf_dir).collect()[0]
    conf = lang_id_confusion(spark, sf_dir).collect()
    n = sum(c["n_docs"] for c in conf)
    agree = sum(c["n_docs"] for c in conf if c["lang"] == c["lang_guess"])
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for c in conf:
        rows[c["lang"]] = rows.get(c["lang"], 0) + c["n_docs"]
        cols[c["lang_guess"]] = cols.get(c["lang_guess"], 0) + c["n_docs"]
    pe = sum(rows[k] * cols.get(k, 0) for k in rows) / (n * n)
    po = agree / n
    assert r["n_docs"] == n and r["n_agree"] == agree
    assert abs(r["p_observed"] - round(po, 6)) < 1e-9
    assert abs(r["p_chance"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-6
    assert 0 < r["p_chance"] < 1 and r["kappa"] <= 1


def test_markov_transitions_row_stochastic(spark, sf_dir):
    """Per prev_type the transition probabilities sum to ~1 (row-
    stochastic up to per-cell rounding) and counts are positive."""
    rows = EQ.events_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    cells: dict[str, int] = {}
    for r in rows:
        assert r["n"] > 0 and 0 < r["p"] <= 1
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
        cells[r["prev_type"]] = cells.get(r["prev_type"], 0) + 1
    for prev, s in by_prev.items():
        assert abs(s - 1.0) <= cells[prev] * 5e-7  # rounding slack


# ---------------------------------------------------------------------------
# Round-6 additions: bloom membership, anisotropy, budget trim, split
# balance, Welch t-test
# ---------------------------------------------------------------------------

def test_bloom_membership_one_sided(spark):
    from clashroyale_datapipeline_agent_spark.plans.scale_queries import (
        orders_bloom_membership_audit,
    )

    rows = orders_bloom_membership_audit(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        # no false negatives: every member is maybe-present, so
        # n_maybe decomposes exactly into members + false positives
        assert r.n_maybe == r.n_members + r.n_false_pos
        assert r.n_maybe >= r.n_members
        assert 0 < r.bits_set <= 4096


def test_bloom_probe_duplicate_rows_no_false_negative(spark):
    """Round-7 ADVICE regression: a probe side with REPEATED keys (the
    pre-filter-a-scan use case) must still report every true member as
    maybe-present — the old sum==hashes aggregate saw d×hashes hits for
    d pooled duplicates and flipped members to absent."""
    from clashroyale_datapipeline_agent_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    bloom = bloom_bits(members, "k")
    # duplicate every member key 3x, plus some non-members once each
    dup = spark.createDataFrame(
        [(i,) for i in range(50) for _ in range(3)]
        + [(i,) for i in range(1000, 1020)],
        "k bigint",
    )
    out = {r.k: r.maybe_present for r in bloom_probe(bloom, dup, "k").collect()}
    for i in range(50):
        assert out[i] is True, f"false negative for duplicated member {i}"


def test_anisotropy_bounds(spark):
    from clashroyale_datapipeline_agent_spark.plans.scale_queries import (
        embeddings_anisotropy_stats,
    )

    rows = embeddings_anisotropy_stats(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.mean_pairwise_cos <= 1.0
        assert 0.0 <= r.centroid_norm <= 1.0 + 1e-9
        assert r.n_vecs > 1


def test_token_budget_trim_invariants(spark):
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        _TOKEN_BUDGET,
        docs_token_budget_trim,
    )

    rows = docs_token_budget_trim(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.tokens_kept <= _TOKEN_BUDGET
        assert 0 < r.n_kept <= r.n_docs


def test_split_balance_shares(spark):
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        docs_split_balance_audit,
    )

    rows = docs_split_balance_audit(spark, SF_DIR_ORACLE).collect()
    by_source: dict = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        by_source.setdefault(r.source, 0.0)
        by_source[r.source] += r.share
    for src_name, total in by_source.items():
        assert abs(total - 1.0) < 0.01, (src_name, total)


def test_welch_ttest_scalars(spark):
    import math

    from clashroyale_datapipeline_agent_spark.plans.estimator_queries import (
        events_ab_welch_ttest,
    )
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
    )

    [r] = events_ab_welch_ttest(spark, SF_DIR_ORACLE).collect()
    ev = load_star_table(spark, SF_DIR_ORACLE, "events").filter(
        "value IS NOT NULL"
    )
    assert r.na + r.nb == ev.count()
    assert math.isfinite(r.t_stat)
    # same synthetic distribution in both cohorts: no real effect
    assert abs(r.t_stat) < 5


def test_cuped_adjusted_lift(spark):
    """θ algebra: adjusted means shift by θ·(cohort X deviation), and the
    pooled n-weighted adjusted mean is preserved (CUPED is mean-neutral
    up to the 4-decimal output rounding)."""
    from clashroyale_datapipeline_agent_spark.plans.estimator_queries import (
        events_cuped_adjusted_lift,
    )

    rows = events_cuped_adjusted_lift(spark, SF_DIR_ORACLE).collect()
    assert [r.cohort for r in rows] == [0, 1]
    assert 0.0 <= rows[0].var_reduction <= 1.0
    assert rows[0].theta == rows[1].theta
    n = sum(r.n_users for r in rows)
    pooled_raw = sum(r.mean_post * r.n_users for r in rows) / n
    pooled_adj = sum(r.mean_adjusted * r.n_users for r in rows) / n
    assert abs(pooled_raw - pooled_adj) < 1e-3


def test_hard_negatives_contract(spark):
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        embeddings_hard_negatives_topk,
    )

    rows = embeddings_hard_negatives_topk(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 16  # one hard negative per bounded probe
    for r in rows:
        assert r.neg_label != r.probe_label
        assert -1.0 <= r.cos_sim <= 1.0
        assert r.neg_id != r.probe_id


def test_neyman_allocation_invariants(spark):
    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        _NEYMAN_BUDGET,
        docs_neyman_allocation,
    )

    rows = docs_neyman_allocation(spark, SF_DIR_ORACLE).collect()
    assert rows
    total = sum(r.alloc_n for r in rows)
    # FLOOR under-allocates by < 1 per stratum, never over
    assert _NEYMAN_BUDGET - len(rows) <= total <= _NEYMAN_BUDGET
    for r in rows:
        assert r.sd_chars > 0 and r.alloc_n >= 0


def test_power_iteration_rayleigh_monotone_and_bounded(spark):
    """Rayleigh quotients under power iteration are monotone
    nondecreasing for the PSD second-moment matrix, and the estimate is
    sandwiched by trace/64 (mean eigenvalue) and trace (sum) — computed
    exactly here from the raw vectors."""
    from clashroyale_datapipeline_agent_spark.plans.scale_queries import (
        embeddings_power_iter_topeig,
    )

    rows = embeddings_power_iter_topeig(spark, SF_DIR_ORACLE).collect()
    assert [r.iter for r in rows] == [1, 2, 3]
    r = [row.rayleigh for row in rows]
    assert r[0] <= r[1] + 1e-3 and r[1] <= r[2] + 1e-3  # monotone (quantized)
    e = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    tr_n = (
        e.select(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda a, v: a + v.cast("double") * v.cast("double"),
            ).alias("q")
        )
        .agg(F.avg("q").alias("tr"))
        .collect()[0]
        .tr
    )
    assert tr_n / 64 - 1e-6 <= r[2] <= tr_n + 1e-6

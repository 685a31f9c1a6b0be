"""Round-8 waves (plans/selection_queries.py, plans/control_queries.py):
semantic invariants beyond the cross-engine hash — each detector must
FIRE on a handcrafted pathological input, and each estimator must match
an independent pure-Python/numpy reference computed from the same
parquet (the oracle row only proves Spark and DuckDB agree; these prove
the statistic is the one the docstring claims)."""

from __future__ import annotations

import math
import statistics

import duckdb
import pytest

from clashroyale_datapipeline_agent_spark.plans import control_queries as CQ
from clashroyale_datapipeline_agent_spark.plans import selection_queries as SQ
from tests.conftest import SF_DIR


def _docs_sf(tmp_path, rows):
    """A tiny sf dir whose documents table is the given rows; the other
    tables symlink to sf0.001 (these queries never read them)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        (tmp_path / f"{t}.parquet").symlink_to(f"{SF_DIR}/{t}.parquet")
    return str(tmp_path)


def _doc(i, text, source="srcA"):
    return (i, text, "en", source, len(text))


# ---------------------------------------------------------------------------
# Gopher rule battery
# ---------------------------------------------------------------------------

def test_gopher_rules_fire_per_rule(spark, tmp_path):
    word30 = lambda w: " ".join([w] * 30)  # noqa: E731
    good = "the cat sat for one happy hour and then went back into its " \
           "warm little den to nap over the long quiet winter afternoon " \
           "with hot tea set nearby"
    rows = [
        _doc(0, word30("aa")),             # mean wl 2 < 3 -> wordlen
        _doc(1, word30("extraordinarily") + " the a of and"),  # wl > 10
        _doc(2, "the cat sat for fun"),    # 5 tokens -> short
        _doc(3, " ".join(["zebra"] * 40)),  # no 2 distinct stopwords
        _doc(4, word30("123") + " the a"),  # digits -> alpha fail
        _doc(5, good),                     # passes all
    ]
    sf = _docs_sf(tmp_path, rows)
    r = {x["source"]: x for x in SQ.docs_gopher_rule_flags(spark, sf).collect()}
    a = r["srcA"]
    assert a["n_docs"] == 6
    assert a["n_fail_wordlen"] >= 2       # docs 0, 1 (4 may also trip)
    assert a["n_fail_short"] == 1         # doc 2
    assert a["n_fail_stop"] >= 1          # doc 3
    assert a["n_fail_alpha"] == 1         # doc 4
    assert a["n_pass"] == 1               # doc 5 only


def test_dup_window_detects_repetition(spark, tmp_path):
    loop = " ".join(["alpha beta gamma delta omega"] * 6)  # 6 equal windows
    uniq = " ".join(f"w{i}" for i in range(30))
    sf = _docs_sf(tmp_path, [_doc(0, loop, "loop"), _doc(1, uniq, "uniq")])
    r = {x["source"]: x for x in
         SQ.docs_dup_window_fraction(spark, sf).collect()}
    assert r["loop"]["n_windows"] == 6
    assert r["loop"]["n_dup_windows"] == 5
    assert r["loop"]["n_flagged"] == 1
    assert r["uniq"]["n_dup_windows"] == 0
    assert r["uniq"]["n_flagged"] == 0


def test_top_ngram_char_fraction_flags_bigram_loop(spark, tmp_path):
    loop = " ".join(["ping pong"] * 15)            # 'ping pong' dominates
    uniq = " ".join(f"word{i}" for i in range(30))  # every bigram unique
    sf = _docs_sf(tmp_path, [_doc(0, loop, "loop"), _doc(1, uniq, "uniq")])
    r = {x["source"]: x for x in
         SQ.docs_top_ngram_char_fraction(spark, sf).collect()}
    assert r["loop"]["avg_top_bigram_frac"] > 0.9
    assert r["loop"]["n_flagged"] == 1
    assert r["uniq"]["avg_top_bigram_frac"] < 0.2
    assert r["uniq"]["n_flagged"] == 0


def test_span_dedup_census_finds_cross_doc_spans(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        _doc(0, shared + " " + " ".join(f"a{i}" for i in range(10)), "dup"),
        _doc(1, shared + " " + " ".join(f"b{i}" for i in range(10)), "dup"),
        _doc(2, " ".join(f"c{i}" for i in range(20)), "clean"),
    ]
    sf = _docs_sf(tmp_path, rows)
    r = {x["source"]: x for x in
         SQ.docs_span_dedup_census(spark, sf).collect()}
    # docs 0/1: windows [shared, a*] and [shared, b*] -> shared span in both
    assert r["dup"]["n_windows"] == 4
    assert r["dup"]["n_shared_windows"] == 2
    assert r["clean"]["n_shared_windows"] == 0


def test_dsir_scores_target_vocabulary_higher(spark, tmp_path):
    tvocab = " ".join(["alpha beta gamma delta"] * 8)
    rvocab = " ".join(["omega psi chi phi"] * 8)
    rows = []
    for i in range(6):
        rows.append(_doc(i, tvocab, f"src{i % 3}"))          # targets
    for i in range(6, 12):
        rows.append(_doc(i, rvocab, "src9"))                 # raw-only
    sf = _docs_sf(tmp_path, rows)
    r = {x["source"]: x["avg_log_importance"] for x in
         SQ.docs_dsir_importance_by_source(spark, sf).collect()}
    assert min(r["src0"], r["src1"], r["src2"]) > r["src9"]
    assert r["src9"] < 0  # raw-only vocabulary is down-weighted


# ---------------------------------------------------------------------------
# Uncertainty quantification vs pure-Python references
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_se_magnitude_and_determinism(spark):
    rows1 = SQ.docs_poisson_bootstrap_se(spark, SF_DIR).collect()
    rows2 = SQ.docs_poisson_bootstrap_se(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    ref = dict(
        duckdb.sql(
            f"SELECT source, stddev_samp(n_chars) / sqrt(COUNT(*)) "
            f"FROM '{SF_DIR}/documents.parquet' GROUP BY source"
        ).fetchall()
    )
    for r in rows1:
        assert r["boot_se_chars"] > 0
        # B=32 replicates: the bootstrap SE should be the right ORDER
        # (within ~3x of the classical se of the mean)
        assert ref[r["source"]] / 3 < r["boot_se_chars"] < ref[r["source"]] * 3


def test_jackknife_matches_python_loo(spark):
    daily = duckdb.sql(
        f"""SELECT date_trunc('day', ts) AS d, COUNT(*) AS nd,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sd
            FROM '{SF_DIR}/events.parquet' GROUP BY 1"""
    ).fetchall()
    n = sum(r[1] for r in daily)
    s = sum(r[2] for r in daily)
    ms = [round(1e6 * (s - sd) / ((n - nd) * 100.0)) for _, nd, sd in daily]
    d = len(ms)
    sm, sm2 = sum(ms), sum(m * m for m in ms)
    want = round(math.sqrt((d - 1) * (d * sm2 - sm * sm)) / (d * 1e6), 6)
    got = SQ.events_jackknife_daily_se(spark, SF_DIR).collect()[0]
    assert got["n_days"] == d
    assert got["jackknife_se"] == pytest.approx(want, abs=2e-6)
    assert got["mean_value"] == pytest.approx(s / (n * 100.0), abs=1e-4)


# ---------------------------------------------------------------------------
# Control charts vs pure-Python references
# ---------------------------------------------------------------------------

def _daily_means():
    return duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def test_ewma_matches_python_loop(spark):
    daily = _daily_means()
    means = [sq / (n * 100.0) for _, n, sq in daily]
    lam = 0.3
    w = [lam * (1 - lam) ** k for k in range(15)]
    want_raw = []
    for t in range(len(means)):
        ks = [k for k in range(15) if t - k >= 0]
        num = sum(w[k] * means[t - k] for k in ks)
        den = sum(w[k] for k in ks)
        want_raw.append(num / den)
    got = CQ.events_ewma_control_chart(spark, SF_DIR).orderBy("day").collect()
    assert [r["ewma"] for r in got] == pytest.approx(
        [round(e, 4) for e in want_raw], abs=2e-4
    )
    # alarm consistency: flag iff 1e6-quantized |mean - ewma| > 3 sigma
    mq = [round(m * 1e6) for m in means]
    dd = len(mq)
    sig = math.sqrt((dd * sum(m * m for m in mq) - sum(mq) ** 2) / (dd * dd))
    for r, q, e in zip(got, mq, want_raw):
        assert r["is_alarm"] == (abs(q - round(e * 1e6)) > 3 * sig)


def test_mad_matches_numpy_reference(spark):
    daily = _daily_means()
    mq = [round(sq * 1e4 / n) for _, n, sq in daily]
    med = statistics.median(mq)
    ads = [abs(x - med) for x in mq]
    mad = statistics.median(ads)
    n_anom = sum(1 for a in ads if mad > 0 and 0.6745 * a > 3.5 * mad)
    got = CQ.events_mad_anomaly_days(spark, SF_DIR).collect()[0]
    assert got["n_days"] == len(mq)
    assert got["median_daily_mean"] == pytest.approx(med / 1e6, abs=1e-4)
    assert got["mad_daily_mean"] == pytest.approx(mad / 1e6, abs=1e-4)
    assert got["n_anomaly_days"] == n_anom


def test_dow_profile_matches_reference_and_strength_bounds(spark):
    daily = duckdb.sql(
        f"""SELECT dayofweek(CAST(ts AS DATE)) AS dow, COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sq
            FROM '{SF_DIR}/events.parquet'
            GROUP BY CAST(ts AS DATE) ORDER BY 1"""
    ).fetchall()
    got = CQ.events_dow_seasonal_profile(spark, SF_DIR).collect()
    assert len(got) == 7
    strengths = {r["seasonal_strength"] for r in got}
    assert len(strengths) == 1
    s = strengths.pop()
    assert 0.0 <= s <= 1.0
    by_dow: dict[int, list[int]] = {}
    for dow, n, sq in daily:
        by_dow.setdefault(dow, []).append(round(sq * 1e4 / n))
    for r in got:
        ms = by_dow[r["dow"]]
        assert r["n_days"] == len(ms)
        assert r["mean_value"] == pytest.approx(
            sum(ms) / (len(ms) * 1e6), abs=1e-4
        )


def test_theil_sen_matches_python_pairwise_median(spark):
    monthly = duckdb.sql(
        f"""SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate) AS t,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rq
            FROM '{SF_DIR}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    slopes = [
        (rq2 - rq1) / ((t2 - t1) * 100.0)
        for i, (t1, rq1) in enumerate(monthly)
        for (t2, rq2) in monthly[i + 1:]
    ]
    want_slope = statistics.median(slopes)
    got = CQ.orders_theil_sen_trend(spark, SF_DIR).collect()[0]
    assert got["n_months"] == len(monthly)
    assert got["n_pairs"] == len(slopes)
    assert got["ts_slope"] == pytest.approx(want_slope, abs=0.02)
    resid = [rq / 100.0 - want_slope * t for t, rq in monthly]
    assert got["ts_intercept"] == pytest.approx(
        statistics.median(resid), abs=0.05
    )


def test_seasonal_naive_matches_python(spark):
    monthly = dict(
        duckdb.sql(
            f"""SELECT (year(o_orderdate) - 1992) * 12 + month(o_orderdate),
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FROM '{SF_DIR}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    apes, pes = [], []
    for t, rq in monthly.items():
        if t - 12 in monthly and rq > 0:
            fq = monthly[t - 12]
            apes.append(round(abs(rq - fq) * 1e6 / rq))
            pes.append(round((rq - fq) * 1e6 / rq))
    got = CQ.orders_seasonal_naive_backtest(spark, SF_DIR).collect()[0]
    assert got["n_scored_months"] == len(apes)
    assert got["mape_pct"] == pytest.approx(
        sum(apes) / (len(apes) * 1e4), abs=1e-3
    )
    assert got["bias_pct"] == pytest.approx(
        sum(pes) / (len(pes) * 1e4), abs=1e-3
    )


def test_centroid_shift_matches_numpy(spark):
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, dict[bool, np.ndarray]] = {}
    counts: dict[int, dict[bool, int]] = {}
    for vec_id, label, emb in rows:
        q = np.round(np.array(emb, dtype=np.float64) * 1e6)
        half = vec_id % 2 == 0
        by_label.setdefault(label, {}).setdefault(
            half, np.zeros_like(q)
        )
        by_label[label][half] = by_label[label].get(half, 0) + q
        counts.setdefault(label, {True: 0, False: 0})
        counts[label][half] += 1
    got = {
        r["label"]: r
        for r in CQ.embeddings_centroid_shift_drift(spark, SF_DIR).collect()
    }
    for label, halves in by_label.items():
        if True not in halves or False not in halves:
            continue
        sa, sb = halves[True], halves[False]
        na, nb = counts[label][True], counts[label][False]
        cos = float(sa @ sb / math.sqrt((sa @ sa) * (sb @ sb)))
        mmd = float(np.linalg.norm(sa / na - sb / nb)) / 1e6
        r = got[label]
        assert r["n_a"] == na and r["n_b"] == nb
        assert r["centroid_cosine"] == pytest.approx(cos, abs=2e-6)
        assert r["linear_mmd"] == pytest.approx(mmd, abs=2e-6)


def test_curriculum_plan_monotone_and_budgeted(spark):
    rows = SQ.docs_curriculum_plan(spark, SF_DIR).orderBy("phase").collect()
    assert [r["phase"] for r in rows] == list(range(1, len(rows) + 1))
    diffs = [r["difficulty"] for r in rows]
    assert diffs == sorted(diffs)
    assert rows[-1]["cum_tokens"] == sum(r["n_tokens"] for r in rows)
    cums = [r["cum_tokens"] for r in rows]
    assert cums == sorted(cums)


# ---------------------------------------------------------------------------
# wave 3: canary / simpson / fano / runs
# ---------------------------------------------------------------------------

def _events_sf(tmp_path, rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY t TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings".split()
    ):
        (tmp_path / f"{t}.parquet").symlink_to(f"{SF_DIR}/{t}.parquet")
    return str(tmp_path)


def test_canary_contamination_counts_plants_and_zero_row(spark, tmp_path):
    rows = [
        (0, "clean words only here now", "en", "s0", 25),
        (1, "prefix batch batch batch suffix", "en", "s0", 31),
        (2, "another batch batch batch doc", "en", "s1", 29),
        (3, "slow slow start", "en", "s2", 15),
    ]
    sf = _docs_sf(tmp_path, rows)
    got = {r["canary"]: r for r in
           SQ.docs_canary_contamination(spark, sf).collect()}
    assert got["batch batch batch"]["n_docs"] == 2
    assert got["batch batch batch"]["n_sources"] == 2
    assert got["batch batch batch"]["first_doc_id"] == 1
    assert got["slow slow"]["n_docs"] == 1
    never = got["canary-4f2a9c never-in-corpus"]
    assert never["n_docs"] == 0 and never["n_sources"] == 0
    assert never["first_doc_id"] is None


def test_simpson_diversity_extremes(spark, tmp_path):
    mono = " ".join(["same"] * 40)
    divr = " ".join(f"w{i}" for i in range(40))
    sf = _docs_sf(tmp_path, [_doc(0, mono, "mono"), _doc(1, divr, "divr")])
    got = {r["source"]: r for r in
           SQ.docs_simpson_diversity(spark, sf).collect()}
    assert got["mono"]["simpson_index"] == pytest.approx(1.0, abs=1e-6)
    assert got["mono"]["inv_simpson"] == pytest.approx(1.0, abs=1e-4)
    # all-distinct tokens -> sum c(c-1) = 0 -> filtered out (pairs > 0)
    assert "divr" not in got


def test_fano_separates_regular_from_bursty(spark, tmp_path):
    rows = []
    eid = 0
    # regular: exactly 3 per hour for 48 hours
    for h in range(48):
        for i in range(3):
            rows.append((eid, f"2024-03-{1 + h // 24:02d} {h % 24:02d}:0{i}:00",
                         1, "regular", 1.0, "{}"))
            eid += 1
    # bursty: all 144 events in the first hour, silent for 47
    for i in range(144):
        rows.append((eid, f"2024-03-01 00:{i % 60:02d}:{i % 60:02d}",
                     1, "bursty", 1.0, "{}"))
        eid += 1
    sf = _events_sf(tmp_path, rows)
    got = {r["event_type"]: r for r in
           CQ.events_burstiness_fano(spark, sf).collect()}
    assert got["regular"]["n_hours"] == 48
    assert got["regular"]["fano"] == pytest.approx(0.0, abs=1e-4)
    assert not got["regular"]["is_bursty"]
    # burst: mean 3/hour, var ~ (48*144^2/48 - ...) -> huge fano
    assert got["bursty"]["fano"] > 50
    assert got["bursty"]["is_bursty"]


def test_runs_test_rejects_trend_and_matches_python(spark, tmp_path):
    import math

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
        " o_orderpriority VARCHAR)"
    )
    # strictly increasing daily revenue over 40 days -> 2 runs
    rows = [
        (i, 1, "O", 100.0 + 10.0 * i, f"1995-01-{1 + i % 28:02d}"
         if False else f"1995-{1 + i // 28:02d}-{1 + i % 28:02d}", "P")
        for i in range(40)
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY t TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part lineitem events documents "
        "embeddings".split()
    ):
        (tmp_path / f"{t}.parquet").symlink_to(f"{SF_DIR}/{t}.parquet")
    got = CQ.orders_runs_test(spark, str(tmp_path)).collect()[0]
    assert got["n_days"] == 40
    assert got["n_runs"] == 2          # all-lows then all-highs
    n1 = n2 = 20
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    sig = math.sqrt(
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert got["expected_runs"] == pytest.approx(mu, abs=1e-4)
    assert got["z_stat"] == pytest.approx((2 - mu) / sig, abs=1e-4)
    assert got["reject_random"]


def test_doremi_upweights_hard_domain(spark, tmp_path):
    """A template domain (one repeated bigram, near-zero surprisal)
    must get LESS mixture weight than its baseline share; a
    unique-bigram domain (maximal surprisal) must get MORE. Weights
    sum to ~1."""
    template = " ".join(["spark rocks"] * 20)
    rows = [_doc(i, template, "easy") for i in range(8)]
    for i in range(8, 12):
        hard = " ".join(f"u{i}x{j}" for j in range(40))
        rows.append(_doc(i, hard, "hard"))
    sf = _docs_sf(tmp_path, rows)
    got = {r["source"]: r for r in
           SQ.docs_doremi_mixture_weights(spark, sf).collect()}
    total_bg = sum(r["n_bigrams"] for r in got.values())
    assert abs(sum(r["mixture_weight"] for r in got.values()) - 1.0) < 1e-3
    assert got["hard"]["avg_surprisal"] > got["easy"]["avg_surprisal"]
    assert got["easy"]["excess"] == 0.0
    assert got["hard"]["excess"] > 0.0
    easy_share = got["easy"]["n_bigrams"] / total_bg
    hard_share = got["hard"]["n_bigrams"] / total_bg
    assert got["easy"]["mixture_weight"] < easy_share
    assert got["hard"]["mixture_weight"] > hard_share

"""Unit invariants for the round-6 entity-resolution / privacy /
evaluation-protocol batch (plans/resolution_queries.py) — constructed
inputs with hand-computable answers, complementing the DuckDB
differential that covers the same queries end-to-end."""

from __future__ import annotations

import math

from clashroyale_datapipeline_agent_spark.operators.dedup import (
    sorted_neighborhood_pairs,
)
from clashroyale_datapipeline_agent_spark.operators.graph import label_propagation
from clashroyale_datapipeline_agent_spark.plans import resolution_queries as rq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_snm_finds_adjacent_near_dup(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),  # near-dup of 1, same prefix
            (3, "zeta eta theta iota"),       # different block entirely
        ],
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in sorted_neighborhood_pairs(docs, window=3).collect()
    }
    assert (1, 2) in pairs
    # |{alpha,beta,gamma}| / |{alpha,beta,gamma,delta,epsilon}| = 3/5
    assert pairs[(1, 2)] == 0.6
    # doc 3 blocks on "zeta" alone: no cross-block pair may appear
    assert all(3 not in p for p in pairs)


def test_snm_window_bounds_fanout(spark):
    # 6 docs in ONE block: window=3 emits leads at offsets 1 and 2 only
    docs = _docs(
        spark, [(i, f"same prefix words v{i}") for i in range(6)]
    )
    pairs = sorted_neighborhood_pairs(docs, window=3).collect()
    # n*(w-1) - boundary = 5 + 4 pairs; never the 15 of all-pairs
    assert len(pairs) == 9
    for r in pairs:
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0


def test_snm_identical_docs_score_one(spark):
    docs = _docs(spark, [(7, "dup text here"), (8, "dup text here")])
    rows = sorted_neighborhood_pairs(docs, window=2).collect()
    assert len(rows) == 1 and rows[0].jaccard == 1.0


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------

def test_lpa_two_triangles_converge_to_min_ids(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        ["id_a", "id_b"],
    )
    trail = label_propagation(edges, rounds=3)
    final, changed = trail[-1]
    labels = {r.id: r.label for r in final.collect()}
    # each triangle collapses to its minimum vertex id
    assert labels[2] == 1 and labels[3] == 1
    assert labels[11] == 10 and labels[12] == 10
    assert changed == 0  # stable by round 3


def test_lpa_tiebreak_prefers_smaller_label(spark):
    # path 1-2-3: node 2 sees labels {1, 3} with equal counts -> takes 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    first, _ = label_propagation(edges, rounds=1)[0]
    labels = {r.id: r.label for r in first.collect()}
    assert labels[2] == 1


def test_lpa_round_trail_changed_counts_monotone_sensible(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["id_a", "id_b"]
    )
    trail = label_propagation(edges, rounds=3)
    assert len(trail) == 3
    for labels, changed in trail:
        assert changed >= 0
        assert labels.count() == 8  # every vertex stays labeled


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------

def test_ldiversity_histogram_counts(spark, tmp_path):
    rows = [
        # QI group (1, 'A'): balances in ONE band -> l = 1 (disclosure!)
        (1, "c1", 1, 500.0, "A"),
        (2, "c2", 1, 700.0, "A"),
        # QI group (2, 'B'): two bands -> l = 2
        (3, "c3", 2, 500.0, "B"),
        (4, "c4", 2, 1500.0, "B"),
        (5, "c5", 2, 1700.0, "B"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        r.l_distinct: r
        for r in rq.customer_ldiversity_audit(spark, str(tmp_path)).collect()
    }
    assert out[1].n_groups == 1 and out[1].n_customers == 2
    assert out[2].n_groups == 1 and out[2].n_customers == 3
    assert out[2].min_group_size == 3


# ---------------------------------------------------------------------------
# blocked fuzzy match
# ---------------------------------------------------------------------------

def test_fuzzy_match_blocked_counts(spark, tmp_path):
    rows = [
        (1, "red widget", "Brand#1", "t", 1, 1.0),
        (2, "red widget", "Brand#2", "t", 1, 1.0),   # same name, mult 2
        (3, "ted widget", "Brand#3", "t", 1, 1.0),   # lev 1 from "red widget"
        (4, "blue widget", "Brand#4", "t", 1, 1.0),  # lev 3 from "red widget"
        (5, "green gear", "Brand#5", "t", 1, 1.0),   # other block
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = {r.noun: r for r in rq.part_fuzzy_match_blocked(spark, str(tmp_path)).collect()}
    w = out["widget"]
    # distinct names in block: red/ted/blue -> 3 pairs
    assert w.n_name_pairs == 3
    # lev(red,ted)=1; lev(red,blue)=4 and lev(ted,blue)=4 exceed the cap
    assert w.n_close == 1 and w.min_dist == 1
    # row-level: red widget ships twice -> red(2)×ted(1) = 2
    assert w.n_part_pairs == 2
    assert "gear" not in out  # singleton block emits no pairs


# ---------------------------------------------------------------------------
# rolling-origin folds
# ---------------------------------------------------------------------------

def test_rolling_origin_folds_counts_and_leakage(spark, tmp_path):
    from datetime import datetime

    # 10 events over [t0, t0+100s): slices are 20s wide
    t0 = datetime(2024, 1, 1)
    def ts(sec):
        return datetime(2024, 1, 1, 0, sec // 60, sec % 60)
    rows = [
        # user 100 active in slices 0 and 2 (warm in fold 2)
        (1, ts(0), 100, "a", 1.0, "{}"),
        (2, ts(45), 100, "a", 1.0, "{}"),
        # user 200 first appears in slice 2 (cold in fold 2)
        (3, ts(50), 200, "a", 1.0, "{}"),
        # user 300 spans all slices
        (4, ts(10), 300, "a", 1.0, "{}"),
        (5, ts(25), 300, "a", 1.0, "{}"),
        (6, ts(55), 300, "a", 1.0, "{}"),
        (7, ts(70), 300, "a", 1.0, "{}"),
        (8, ts(99), 300, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.fold: r for r in rq.events_rolling_origin_folds(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # fold 1: train = slice 0 = events at 0,10 -> 2; test = slice 1 = event 25
    assert out[1].n_train == 2 and out[1].n_test == 1
    # fold 2 tests slice 2 (45,50,55): users 100,200,300; 100+300 warm
    assert out[2].n_test_users == 3 and out[2].n_warm_users == 2
    # expanding window: train sizes strictly increase
    assert out[1].n_train < out[2].n_train < out[3].n_train < out[4].n_train


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------

def test_zipf_slope_exact_power_law(spark, tmp_path):
    # construct a corpus where word k appears ceil(64 / 2^(k-1)) times:
    # counts 64,32,16,8 at ranks 1..4 -> slope exactly -1 in log2 space,
    # i.e. ln-space slope -1.0 (ratios are exact powers of two)
    words = []
    for rank, cnt in enumerate([64, 32, 16, 8], start=1):
        words += [f"w{rank}"] * cnt
    rows = [(i, " ".join(words), "en", "srcA", 1) for i in range(1)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = rq.docs_zipf_slope_by_source(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_words == 4
    # closed-form OLS on the same (ln rank, ln count) points
    xs = [math.log(k) for k in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (64, 32, 16, 8)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    expect = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
    assert r.zipf_slope == expect


def test_zipf_slope_deterministic_across_reruns(spark):
    a = rq.docs_zipf_slope_by_source(spark, SF).collect()
    b = rq.docs_zipf_slope_by_source(spark, SF).collect()
    assert a == b


# ---------------------------------------------------------------------------
# simplified silhouette
# ---------------------------------------------------------------------------

def test_silhouette_separated_clusters_score_one(spark, tmp_path):
    # two point-clusters: every member sits ON its centroid -> a = 0,
    # b = inter-centroid distance, s = (b-0)/b = 1.0 exactly
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(4)]
    rows += [(10 + i, [0.0, 1.0, 0.0, 0.0], 1) for i in range(4)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        r.label: r
        for r in rq.embeddings_silhouette_by_label(spark, str(tmp_path)).collect()
    }
    assert out[0].n_vecs == 4 and out[1].n_vecs == 4
    assert out[0].mean_silhouette == 1.0
    assert out[1].mean_silhouette == 1.0


def test_silhouette_bounded_and_deterministic(spark):
    a = rq.embeddings_silhouette_by_label(spark, SF).collect()
    b = rq.embeddings_silhouette_by_label(spark, SF).collect()
    assert a == b
    for r in a:
        assert -1.0 <= r.mean_silhouette <= 1.0


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_mg_underestimates_and_finds_dominant_key(spark, tmp_path):
    from datetime import datetime

    rows = []
    eid = 0
    # user 7 dominates with 40 events; 30 other users get 2 each
    for _ in range(40):
        rows.append((eid, datetime(2024, 1, 1), 7, "a", 1.0, "{}")); eid += 1
    for u in range(100, 130):
        for _ in range(2):
            rows.append((eid, datetime(2024, 1, 1), u, "a", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = rq.events_mg_heavy_hitters(spark, str(tmp_path)).collect()
    assert out, "dominant key must survive the trim"
    by_user = {r.user_id: r for r in out}
    # MG guarantee: estimates never exceed exact counts
    for r in out:
        assert 0 < r.est <= r.exact_c
        assert r.underestimate == r.exact_c - r.est
    # the dominant user tops the estimate ranking
    assert out[0].user_id == 7 and out[0].exact_c == 40
    assert 7 in by_user


# ---------------------------------------------------------------------------
# length-matched pairs
# ---------------------------------------------------------------------------

def test_matched_pairs_nearest_in_bucket(spark, tmp_path):
    rows = [
        # bucket 0: treated 100 matches control 90 (gap 10)
        (1, "t", "en", "src0", 100),
        (2, "c", "en", "src1", 90),
        # bucket 1: treated 200 matches control 210 (gap 10, next side)
        (3, "t", "en", "src0", 200),
        (4, "c", "en", "src1", 210),
        # bucket 3: treated 400 has no control -> unmatched
        (5, "t", "en", "src0", 400),
        # other sources are excluded from the pool entirely
        (6, "x", "en", "src2", 100),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = rq.docs_length_matched_pairs(spark, str(tmp_path)).collect()[0]
    assert r.n_treated == 3 and r.n_matched == 2 and r.n_unmatched == 1
    assert r.sum_gap == 20 and r.max_gap == 10
    assert r.n_distinct_controls == 2


def test_matched_pairs_tie_prefers_earlier_control(spark, tmp_path):
    rows = [
        (1, "c", "en", "src1", 95),   # prev control, gap 5
        (2, "t", "en", "src0", 100),
        (3, "c", "en", "src1", 105),  # next control, gap 5 -> tie
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = rq.docs_length_matched_pairs(spark, str(tmp_path)).collect()[0]
    # equal gaps keep the earlier (preceding) control: 1 distinct control
    assert r.n_matched == 1 and r.sum_gap == 5 and r.n_distinct_controls == 1


# ---------------------------------------------------------------------------
# feature-hash collision audit
# ---------------------------------------------------------------------------

def test_feature_hash_grid_and_ratio(spark, tmp_path):
    rows = [(1, "a b c", "en", "s", 5), (2, "a b d", "en", "s", 5)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.dim: r for r in rq.docs_feature_hash_collisions(spark, str(tmp_path)).collect()}
    assert set(out) == {256, 1024, 4096}
    for dim, r in out.items():
        # bigrams: "a b", "b c", "b d"
        assert r.n_features == 3
        assert 1 <= r.n_buckets_used <= 3
        assert r.collision_frac == round(1 - r.n_buckets_used / 3, 4)
    # wider tables can only reduce (or keep) collisions
    assert out[4096].n_buckets_used >= out[256].n_buckets_used

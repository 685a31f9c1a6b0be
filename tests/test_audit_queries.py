"""Round-8 wave 2 (plans/audit_queries.py): semantic invariants — the
JL ratio must concentrate near 1, conformal coverage must meet its
distribution-free target, apportionment must hit the budget exactly,
fertility must count pieces like a pre-tokenizer, and the label-noise
audit must catch a planted mislabel."""

from __future__ import annotations

import duckdb
import pytest

from clashroyale_datapipeline_agent_spark.plans import audit_queries as AQ
from tests.conftest import SF_DIR


def _sf_with(tmp_path, table, create_sql, rows):
    con = duckdb.connect()
    con.execute(create_sql)
    placeholders = ",".join("?" * len(rows[0]))
    con.executemany(f"INSERT INTO t VALUES ({placeholders})", rows)
    con.execute(f"COPY t TO '{tmp_path}/{table}.parquet' (FORMAT PARQUET)")
    for other in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        if other != table:
            (tmp_path / f"{other}.parquet").symlink_to(
                f"{SF_DIR}/{other}.parquet"
            )
    return str(tmp_path)


def test_jl_ratio_concentrates_near_one(spark):
    r = AQ.embeddings_jl_projection_audit(spark, SF_DIR).collect()[0]
    assert r["k"] == 16
    assert r["n_pairs"] == 496
    assert 0.7 < r["mean_ratio"] < 1.3
    assert r["min_ratio"] > 0.0
    # JL with k=16: tails exist but gross distortion should be rare
    assert r["n_pairs_distorted_50pct"] < r["n_pairs"] * 0.2


def test_conformal_coverage_meets_target(spark):
    r = AQ.docs_conformal_coverage(spark, SF_DIR).collect()[0]
    assert r["n_cal"] + r["n_test"] > 0
    assert r["threshold"] > 0
    # guarantee is E[coverage] >= 0.9; allow finite-sample wiggle
    assert r["coverage"] >= 0.84
    assert r["coverage"] <= 1.0


def test_apportionment_budget_exact_and_near_proportional(spark):
    rows = AQ.docs_apportionment_plan(spark, SF_DIR).collect()
    total_docs = sum(r["n_docs"] for r in rows)
    assert sum(r["alloc"] for r in rows) == 10000
    for r in rows:
        exact = 10000 * r["n_docs"] / total_docs
        assert abs(r["alloc"] - exact) < 1.0  # Hamilton stays within 1


def test_tokenizer_fertility_counts_pieces(spark, tmp_path):
    rows = [
        (0, "abc123 de-f", "en", "s0", 11),   # pieces: abc,123,de,-,f = 5
        (1, "pure words here", "en", "s0", 15),  # 3 words, 3 pieces
    ]
    sf = _sf_with(
        tmp_path,
        "documents",
        "CREATE TABLE t(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)",
        rows,
    )
    r = AQ.docs_tokenizer_fertility(spark, sf).collect()
    assert len(r) == 1
    en = r[0]
    assert en["n_words"] == 5
    assert en["n_pieces"] == 8
    assert en["fertility"] == pytest.approx(8 / 5, abs=1e-4)


def test_label_noise_audit_catches_planted_mislabel(spark, tmp_path):
    # two tight, well-separated clusters; one vector of cluster 0 is
    # labeled 1 -> it must be the only suspect
    dim = 64
    rows = []
    vid = 0
    for i in range(10):
        v = [1.0 + 0.001 * i] + [0.0] * (dim - 1)
        rows.append((vid, v, 0))
        vid += 1
    for i in range(10):
        v = [0.0] * (dim - 1) + [1.0 + 0.001 * i]
        rows.append((vid, v, 1))
        vid += 1
    # the plant: a cluster-0-shaped vector labeled 1
    rows.append((vid, [1.0] + [0.0] * (dim - 1), 1))
    sf = _sf_with(
        tmp_path,
        "embeddings",
        "CREATE TABLE t(vec_id BIGINT, embedding FLOAT[], label INTEGER)",
        rows,
    )
    got = {r["label"]: r for r in
           AQ.embeddings_label_noise_audit(spark, sf).collect()}
    assert got[0]["n_mismatch"] == 0
    assert got[1]["n_mismatch"] == 1
    assert got[1]["mismatch_rate"] == pytest.approx(1 / 11, abs=1e-4)


@pytest.mark.parametrize(
    "counts",
    [
        {"a": 1, "b": 1, "c": 1},                  # perfect ties
        {"a": 333, "b": 333, "c": 334},            # near-ties
        {"a": 1, "b": 9999},                       # extreme skew
        {"a": 7, "b": 11, "c": 13, "d": 17},       # co-prime remainders
    ],
)
def test_apportionment_properties_on_pathological_counts(
    spark, tmp_path, counts
):
    """Hamilton invariants on tie-heavy / skewed distributions: the
    allocation sums EXACTLY to the budget, every source stays within 1
    of its exact proportional share (the largest-remainder guarantee),
    and remainder ties break deterministically (re-run equality)."""
    rows, doc_id = [], 0
    for src, n in counts.items():
        for _ in range(n):
            rows.append((doc_id, f"w{doc_id} text", "en", src, 10))
            doc_id += 1
    sf = _sf_with(
        tmp_path,
        "documents",
        "CREATE TABLE t(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)",
        rows,
    )
    got1 = AQ.docs_apportionment_plan(spark, sf).collect()
    got2 = AQ.docs_apportionment_plan(spark, sf).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in got2]
    total = sum(counts.values())
    assert sum(r["alloc"] for r in got1) == 10000
    for r in got1:
        exact = 10000 * counts[r["source"]] / total
        assert abs(r["alloc"] - exact) < 1.0

"""Dedup / similarity / text / multimodal operator tests (BASELINE.json
north-star surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.operators import dedup as D
from clashroyale_datapipeline_agent_spark.operators import similarity as S
from clashroyale_datapipeline_agent_spark.operators import text as T
from clashroyale_datapipeline_agent_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
)
from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup of 1
        (4, "completely different words entirely here now friends"),
        (5, "der hund ist nicht auf der couch und das ist gut"),
        (6, ""),  # empty text edge
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = {r["keeper_id"]: r["copies"] for r in D.exact_dedup_groups(docs).collect()}
    assert groups[1] == 2  # docs 1+2 identical
    assert groups[3] == 1
    kept = {r["doc_id"] for r in D.exact_dedup(docs).collect()}
    assert 2 not in kept and {1, 3, 4, 5, 6} <= kept


def test_shingles_and_minhash(docs):
    sh = docs.select(
        "doc_id", D.shingles_col(F.col("text"), 3).alias("sh")
    ).collect()
    by_id = {r["doc_id"]: list(r["sh"]) for r in sh}
    assert "the quick brown" in by_id[1]
    assert by_id[6] == []
    sig = docs.select(
        "doc_id", D.minhash_signature(D.shingles_col(F.col("text"), 3), 16).alias("sig")
    ).collect()
    sigs = {r["doc_id"]: list(r["sig"]) for r in sig}
    assert sigs[1] == sigs[2]  # identical docs -> identical signatures
    # docs 1/3 share 4 of 10 distinct shingles (J=0.4) -> expect ~40% of
    # minhash components to agree; require at least a few
    same = sum(1 for a, b in zip(sigs[1], sigs[3]) if a == b)
    assert same >= 3


def test_lsh_candidates_and_jaccard(docs):
    # bands=16/r=1: a single shared minhash surfaces the pair, so the
    # 0.4-jaccard near-dup (1,3) collides with probability 1-(0.6)^16
    # under INDEPENDENT hash functions. (The old bands=8/r=2 expectation
    # was calibrated against a closure bug that salted by array index —
    # at r=2 a 0.4 pair is only a ~75% collision and correctly missed.)
    cands = D.lsh_candidate_pairs(docs, num_hashes=16, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    verified = D.ngram_jaccard_pairs(docs, cands, threshold=0.35).collect()
    vm = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert vm[(1, 2)] == pytest.approx(1.0)
    assert vm[(1, 3)] == pytest.approx(0.4)  # 4 shared / 10 union shingles
    deduped = D.minhash_lsh_dedup(docs, threshold=0.35, num_hashes=16, bands=16)
    kept = {r["doc_id"] for r in deduped.collect()}
    assert 2 not in kept and 3 not in kept and 1 in kept
    # dissimilar docs must NOT be surfaced even at the permissive setting
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_simhash(docs):
    pairs = D.simhash_candidate_pairs(docs, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0  # identical
    sh = {r["doc_id"]: r["h"] for r in docs.select("doc_id", D.simhash_col(F.col("text")).alias("h")).collect()}
    assert sh[1] == sh[2]
    assert bin(sh[1] ^ sh[3]).count("1") <= 16  # near dup close in hamming


def test_cosine_topk(spark, sf_dir):
    emb = load_star_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    top = S.brute_force_topk(emb, qvec, k=5, exclude_id=0).collect()
    assert len(top) == 5
    cosines = [r["cosine"] for r in top]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0001 <= c <= 1.0001 for c in cosines)
    # self-similarity sanity: query against itself scores 1
    self_top = S.brute_force_topk(emb, qvec, k=1).collect()[0]
    assert self_top["vec_id"] == 0 and self_top["cosine"] == pytest.approx(1.0)


def test_lsh_topk_subset_of_bruteforce_order(spark, sf_dir):
    emb = load_star_table(spark, sf_dir, "embeddings").cache()
    qvec = [float(x) for x in emb.filter("vec_id = 7").collect()[0]["embedding"]]
    approx = S.lsh_topk(emb, qvec, k=5, n_planes=4)
    rows = approx.collect()
    assert 0 < len(rows) <= 5
    # every returned cosine must match the exact score for that id
    exact = {
        r["vec_id"]: r["cosine"]
        for r in S.brute_force_topk(emb, qvec, k=10**6).collect()
    }
    for r in rows:
        assert r["cosine"] == pytest.approx(exact[r["vec_id"]])


def test_pairwise_topk_join(spark, sf_dir):
    emb = load_star_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id in (1, 2)").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = S.pairwise_topk_join(emb, queries, k=3)
    rows = res.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2}
    for q, rs in by_q.items():
        assert len(rs) == 3
        assert rs[0]["vec_id"] == q  # self is nearest


def test_token_and_quality_stats(docs):
    stats = {r["doc_id"]: r for r in T.with_token_stats(docs).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["n_unique_tokens"] == 8  # 'the' twice
    assert stats[6]["n_tokens"] == 0 and stats[6]["avg_token_len"] == 0.0
    q = docs.select("doc_id", *[v.alias(k) for k, v in T.quality_score_cols(F.col("text")).items()]).collect()
    qm = {r["doc_id"]: r for r in q}
    assert qm[1]["repetition_ratio"] == pytest.approx(1 - 8 / 9)
    assert qm[6]["punct_ratio"] == 0.0


def test_language_scores(docs):
    scored = {r["doc_id"]: r for r in T.with_language_scores(docs).collect()}
    assert scored[1]["lang_guess"] == "en"
    assert scored[5]["lang_guess"] == "de"
    assert scored[6]["lang_guess"] is None


def test_fingerprints(docs):
    fp = docs.select(
        "doc_id",
        T.fingerprint_col(F.col("text")).alias("xx"),
        T.md5_fingerprint_col(F.col("text")).alias("md5"),
    ).collect()
    m = {r["doc_id"]: r for r in fp}
    assert m[1]["xx"] == m[2]["xx"] and m[1]["md5"] == m[2]["md5"]
    assert m[1]["xx"] != m[3]["xx"]
    import hashlib

    assert m[4]["md5"] == hashlib.md5(
        "completely different words entirely here now friends".encode()
    ).hexdigest()


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG" + b"x" * 100), {"w": "64", "h": "64"}),
        (2, "audio", bytearray(b"RIFF" + b"y" * 400), {"sr": "16000"}),
        (3, "video", bytearray(b"\x00\x00ftyp" + b"z" * 900), {"n_frames": "95"}),
        (4, "image", None, {}),  # missing payload -> error path
    ]
    from clashroyale_datapipeline_agent_spark.schemas import MEDIA_ASSET

    return spark.createDataFrame(rows, MEDIA_ASSET)


def test_extract_features_shapes_and_errors(assets):
    out = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert len(out) == 4
    for aid, r in out.items():
        assert len(r["feature"]) == FEATURE_DIM
    assert out[1]["status"] == "ok" and out[1]["n_bytes"] == 104
    assert out[4]["status"].startswith("error:NotImplementedError")
    assert out[4]["n_bytes"] == 0
    # determinism: same payload -> same features
    again = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert [float(x) for x in again[2]["feature"]] == [float(x) for x in out[2]["feature"]]


def test_frame_sample_plan(assets):
    frames = frame_sample_plan(assets, every_n=30).collect()
    by_asset: dict = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert by_asset[3] == [0, 30, 60, 90]
    # frameless assets (no n_frames meta) contribute no rows — a fabricated
    # frame_idx 0 here was an ADVICE.md round-1 finding
    assert set(by_asset) == {3}


def test_ngram_contamination_includes_clean_docs(spark):
    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        ngram_contamination,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "alpha beta gamma nine"), (11, "zz yy xx ww")],
        "doc_id long, text string",
    )
    rows = {r["eval_id"]: r for r in ngram_contamination(train, ev, n=3).collect()}
    assert rows[10]["n_contaminated_train_docs"] == 1  # shares 'alpha beta gamma'
    assert rows[10]["n_shared_ngrams"] == 1
    assert rows[11]["n_contaminated_train_docs"] == 0  # clean doc still gets a row
    # df cap drops the hot gram entirely
    capped = {
        r["eval_id"]: r
        for r in ngram_contamination(train, ev, n=3, max_train_df=0).collect()
    }
    assert capped[10]["n_shared_ngrams"] == 0


def test_cap_per_group_deterministic(spark):
    import pyspark.sql.functions as F

    from clashroyale_datapipeline_agent_spark.operators.sampling import cap_per_group

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    kept = cap_per_group(df, group_col="lang", cap=40, id_col="doc_id")
    counts = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert all(c == 40 for c in counts.values())
    ids = sorted(r["doc_id"] for r in kept.collect())
    again = sorted(
        r["doc_id"]
        for r in cap_per_group(
            df.repartition(7), group_col="lang", cap=40, id_col="doc_id"
        ).collect()
    )
    assert again == ids  # survivor SET is partitioning-independent


def test_chunk_documents_covers_every_token(spark):
    import pyspark.sql.functions as F

    from clashroyale_datapipeline_agent_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks -> 2 chunks
            (2, " ".join(f"t{i}" for i in range(10))),   # short -> 1 chunk
            (3, ""),                                      # empty -> 1 empty chunk
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    # chunk 1 of doc 1 starts at stride 48 => its first token is t48 (16
    # tokens of overlap with chunk 0, which ends at t63)
    c1 = next(r for r in by_doc[1] if r["chunk_idx"] == 1)
    toks = c1["chunk_text"].split(" ")
    assert toks[0] == "t48" and toks[-1] == "t99" and len(toks) == 52
    c0 = next(r for r in by_doc[1] if r["chunk_idx"] == 0)
    assert c0["chunk_text"].split(" ")[-1] == "t63"
    # union of chunk tokens covers every token
    covered = set()
    for r in by_doc[1]:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(100)}


def test_scrub_col_order_and_patterns(spark):
    import pyspark.sql.functions as F

    from clashroyale_datapipeline_agent_spark.operators.text import scrub_col

    df = spark.createDataFrame(
        [("call 12345678 or mail bob@example.com now",)], "t string"
    )
    out = df.select(scrub_col(F.col("t")).alias("c")).collect()[0]["c"]
    assert "<NUM>" in out and "<EMAIL>" in out
    assert "12345678" not in out and "bob@example.com" not in out


def test_resize_assets_truncates_and_chains(assets):
    from clashroyale_datapipeline_agent_spark.operators.multimodal import (
        resize_assets,
    )

    out = {r["asset_id"]: r for r in resize_assets(assets, max_bytes=256).collect()}
    assert len(out) == 4
    # large payloads truncate and get tagged; small ones pass through
    assert len(out[2]["payload"]) == 256 and out[2]["meta"]["resized"] == "true"
    assert len(out[1]["payload"]) == 104 and "resized" not in out[1]["meta"]
    # missing payload -> per-row error, stage survives
    assert out[4]["status"].startswith("error:NotImplementedError")
    # output is MEDIA_ASSET-shaped: chains straight into extract_features
    feats = {
        r["asset_id"]: r
        for r in extract_features(
            resize_assets(assets, max_bytes=256).drop("status")
        ).collect()
    }
    assert feats[3]["n_bytes"] == 256 and feats[3]["status"] == "ok"


def _tiny_png(width=4, height=3, shade=200) -> bytes:
    """Minimal valid 8-bit grayscale PNG via stdlib only (no PIL needed to
    GENERATE; PIL is only needed to DECODE)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(b"\x00" + bytes([shade]) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_pil_decoder_real_png(spark):
    """Skip-if-unavailable: with Pillow installed, the real decoder seam
    decodes a generated PNG end-to-end through the same mapInPandas
    plumbing the stub uses; corrupt payloads still land in status."""
    pytest.importorskip("PIL")
    from clashroyale_datapipeline_agent_spark.operators.multimodal import (
        pil_image_features,
    )
    from clashroyale_datapipeline_agent_spark.schemas import MEDIA_ASSET

    rows = [
        (1, "image", bytearray(_tiny_png(4, 3, 200)), {}),
        (2, "image", bytearray(b"not a png at all"), {}),
        (3, "image", None, {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_ASSET)
    out = {
        r["asset_id"]: r
        for r in extract_features(df, decoder=pil_image_features).collect()
    }
    good = [float(x) for x in out[1]["feature"]]
    # width, height, bands, mean luma, first/last occupied bin, n bins, bytes
    assert good[:3] == [4.0, 3.0, 1.0]
    assert good[3] == 200.0 and good[4] == 200.0 and good[5] == 200.0
    assert good[6] == 1.0
    assert out[1]["status"] == "ok"
    assert out[2]["status"].startswith("error:")
    assert out[3]["status"].startswith("error:NotImplementedError")


def test_pil_decoder_contract_without_spark():
    """The decoder callable itself honors the stub contract (None ->
    NotImplementedError) — checked driver-side when PIL is present."""
    pytest.importorskip("PIL")
    from clashroyale_datapipeline_agent_spark.operators.multimodal import (
        pil_image_features,
    )

    with pytest.raises(NotImplementedError):
        pil_image_features(None, "image")
    feats = pil_image_features(_tiny_png(5, 2, 17), "image")
    assert feats[:3] == [5.0, 2.0, 1.0] and len(feats) == 8


def test_pil_available_flag_consistent():
    from clashroyale_datapipeline_agent_spark.operators.multimodal import (
        pil_available,
    )

    try:
        import PIL  # noqa: F401

        assert pil_available()
    except ImportError:
        assert not pil_available()

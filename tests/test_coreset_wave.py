"""Round-9 wave 2 (plans/coreset_queries.py) vs pure-Python oracles.

Each query is re-derived at sf0.001 with plain Python over the same
parquet (pyarrow + math only — no Spark, no DuckDB), so a bug shared
by the Spark plan and its DuckDB oracle SQL cannot hide here."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

from clashroyale_datapipeline_agent_spark.plans import coreset_queries as cq


def _vecs() -> dict[int, tuple[list[int], int]]:
    """vec_id -> (1e6-quantized components, label)."""
    t = pq.read_table(SF_DIR + "/embeddings.parquet")
    out = {}
    for vid, emb, lab in zip(
        t.column("vec_id").to_pylist(),
        t.column("embedding").to_pylist(),
        t.column("label").to_pylist(),
    ):
        out[int(vid)] = (
            [int(round(float(x) * 1000000.0)) for x in emb],
            int(lab),
        )
    return out


def _d2(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _sim6(a: list[int], b: list[int]) -> int:
    cr = sum(x * y for x, y in zip(a, b))
    na2 = sum(x * x for x in a)
    nb2 = sum(x * x for x in b)
    return int(round(1000000.0 * float(cr) / math.sqrt(float(na2) * float(nb2))))


def test_kcenter_matches_pure_python_greedy(spark):
    vecs = _vecs()
    picks = [0]
    expect = [(1, 0, vecs[0][1], 0)]
    for step in range(2, cq._KC_K + 1):
        best = None
        for vid, (vq, _) in vecs.items():
            if vid in picks:
                continue
            mind2 = min(_d2(vq, vecs[p][0]) for p in picks)
            key = (-mind2, vid)
            if best is None or key < best[0]:
                best = (key, vid, mind2)
        picks.append(best[1])
        expect.append((step, best[1], vecs[best[1]][1], best[2]))

    got = [
        (int(r["step"]), int(r["vec_id"]), int(r["label"]), int(r["mind2"]))
        for r in cq.embeddings_kcenter_coreset(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_kcenter_radius_sequence_nonincreasing(spark):
    rows = cq.embeddings_kcenter_coreset(spark, SF_DIR).collect()
    radii = [int(r["mind2"]) for r in rows[1:]]  # step 1 is the seed (0)
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({int(r["vec_id"]) for r in rows}) == cq._KC_K


def test_mmr_matches_pure_python_greedy(spark):
    vecs = _vecs()
    q = vecs[0][0]
    rel = {
        vid: _sim6(vq, q) for vid, (vq, _) in vecs.items() if vid != 0
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[: cq._MMR_POOL]
    picks = [min(pool, key=lambda v: (-rel[v], v))]
    expect = [(1, picks[0], rel[picks[0]], 7 * rel[picks[0]])]
    for step in range(2, cq._MMR_K + 1):
        best = None
        for vid in pool:
            if vid in picks:
                continue
            msim = max(_sim6(vecs[vid][0], vecs[p][0]) for p in picks)
            mmr = 7 * rel[vid] - 3 * msim
            key = (-mmr, vid)
            if best is None or key < best[0]:
                best = (key, vid, mmr)
        picks.append(best[1])
        expect.append((step, best[1], rel[best[1]], best[2]))

    got = [
        (int(r["step"]), int(r["vec_id"]), int(r["rel6"]), int(r["mmr6"]))
        for r in cq.embeddings_mmr_diverse_topk(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_mmr_first_pick_is_most_relevant_and_rest_tradeoff(spark):
    rows = cq.embeddings_mmr_diverse_topk(spark, SF_DIR).collect()
    assert int(rows[0]["mmr6"]) == 7 * int(rows[0]["rel6"])
    # later picks: mmr6 = 7*rel6 - 3*msim6 with |msim6| <= 1e6
    for r in rows[1:]:
        assert abs(int(r["mmr6"]) - 7 * int(r["rel6"])) <= 3 * 1000000
    assert len({int(r["vec_id"]) for r in rows}) == len(rows)


def _kn_model():
    """Global KN bigram counts from the sf0.001 documents."""
    t = pq.read_table(SF_DIR + "/documents.parquet")
    per_source: dict[tuple[str, str, str], int] = {}
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        ts = [w for w in text.lower().strip().split() if w]
        for w1, w2 in zip(ts, ts[1:]):
            key = (src, w1, w2)
            per_source[key] = per_source.get(key, 0) + 1
    c12: dict[tuple[str, str], int] = {}
    for (_, w1, w2), k in per_source.items():
        c12[(w1, w2)] = c12.get((w1, w2), 0) + k
    c1: dict[str, int] = {}
    n1p: dict[str, int] = {}
    ncont: dict[str, int] = {}
    for (w1, w2), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        ncont[w2] = ncont.get(w2, 0) + 1
    return per_source, c12, c1, n1p, ncont, len(c12)


def test_kneser_ney_matches_pure_python(spark):
    per_source, c12, c1, n1p, ncont, b = _kn_model()
    agg: dict[str, tuple[int, int]] = {}
    for (src, w1, w2), k in per_source.items():
        num = (4 * c12[(w1, w2)] - 3) * b + 3 * n1p[w1] * ncont[w2]
        den = 4 * c1[w1] * b
        s9 = int(round(-math.log(float(num) / float(den)) * 1e9))
        nk, ns = agg.get(src, (0, 0))
        agg[src] = (nk + k, ns + k * s9)
    expect = {
        src: (
            nk,
            round(float(ns) / (float(nk) * 1e9), 4),
            round(math.exp(round(float(ns) / (float(nk) * 1e9), 4)), 2),
        )
        for src, (nk, ns) in agg.items()
    }
    got = {
        r["source"]: (
            int(r["n_bigrams"]),
            float(r["avg_kn_surprisal"]),
            float(r["perplexity"]),
        )
        for r in cq.docs_kneser_ney_bigram_ppl_by_source(
            spark, SF_DIR
        ).collect()
    }
    assert got == expect


def test_kneser_ney_seen_mass_at_most_one(spark):
    """For every context w1, the KN probability mass over SEEN
    continuations is <= 1 (the held-out remainder goes to unseen w2)."""
    _, c12, c1, n1p, ncont, b = _kn_model()
    by_w1: dict[str, float] = {}
    for (w1, w2), c in c12.items():
        p = ((4 * c - 3) * b + 3 * n1p[w1] * ncont[w2]) / (4 * c1[w1] * b)
        assert 0.0 < p <= 1.0
        by_w1[w1] = by_w1.get(w1, 0.0) + p
    assert max(by_w1.values()) <= 1.0 + 1e-9


def test_adamic_adar_matches_pure_python(spark):
    ords = pq.read_table(SF_DIR + "/orders.parquet")
    li = pq.read_table(SF_DIR + "/lineitem.parquet")
    cust_of = dict(
        zip(
            ords.column("o_orderkey").to_pylist(),
            ords.column("o_custkey").to_pylist(),
        )
    )
    cp = set()
    for ok, p in zip(
        li.column("l_orderkey").to_pylist(),
        li.column("l_partkey").to_pylist(),
    ):
        cp.add((int(cust_of[ok]), int(p)))
    parts_of: dict[int, list[int]] = {}
    for c, p in cp:
        parts_of.setdefault(c, []).append(p)
    scores: dict[tuple[int, int], tuple[int, int]] = {}
    for c, ps in parts_of.items():
        d = len(ps)
        if not (cq._AA_MIN_DEG <= d <= cq._AA_MAX_DEG):
            continue
        w9 = int(round(1e9 / math.log(float(d))))
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                key = (ps[i], ps[j])
                n, s = scores.get(key, (0, 0))
                scores[key] = (n + 1, s + w9)
    expect = sorted(
        ((k[0], k[1], n, s) for k, (n, s) in scores.items()),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:20]
    got = [
        (int(r["part_a"]), int(r["part_b"]), int(r["n_common"]), int(r["aa9"]))
        for r in cq.orders_adamic_adar_topk(spark, SF_DIR).collect()
    ]
    assert got == expect


@pytest.mark.parametrize("d", [2, 3, 10, 40])
def test_adamic_adar_weight_monotone_in_degree(d):
    w = int(round(1e9 / math.log(float(d))))
    w_next = int(round(1e9 / math.log(float(d + 1))))
    assert w > w_next > 0


def test_freq_3seq_matches_pure_python(spark):
    t = pq.read_table(SF_DIR + "/events.parquet")
    rows = sorted(
        zip(
            t.column("user_id").to_pylist(),
            t.column("ts").to_pylist(),
            t.column("event_id").to_pylist(),
            t.column("event_type").to_pylist(),
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    by_user: dict[int, list[str]] = {}
    for u, _, _, et in rows:
        by_user.setdefault(int(u), []).append(et)
    support: dict[tuple[str, str, str], set[int]] = {}
    occ: dict[tuple[str, str, str], int] = {}
    for u, seq in by_user.items():
        for tri in zip(seq, seq[1:], seq[2:]):
            support.setdefault(tri, set()).add(u)
            occ[tri] = occ.get(tri, 0) + 1
    expect = sorted(
        (
            (k[0], k[1], k[2], len(s), occ[k])
            for k, s in support.items()
        ),
        key=lambda r: (-r[3], -r[4], r[0], r[1], r[2]),
    )[:20]
    got = [
        (
            r["t1"],
            r["t2"],
            r["t3"],
            int(r["n_users"]),
            int(r["n_occurrences"]),
        )
        for r in cq.events_freq_3seq_topk(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_pareto_front_matches_pure_python(spark):
    t = pq.read_table(SF_DIR + "/documents.parquet")
    pts = []
    for did, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        ts = [w for w in text.lower().strip().split() if w]
        if not ts:
            continue
        x = len(ts)
        y = int(round(1000000.0 * float(len(set(ts))) / float(x)))
        pts.append((int(did), x, y))
    front = [
        (d, x, y)
        for d, x, y in pts
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in pts
        )
    ]
    expect = sorted(front, key=lambda r: (-r[1], r[0]))
    got = [
        (int(r["doc_id"]), int(r["n_tokens"]), int(r["ttr6"]))
        for r in cq.docs_pareto_quality_front(spark, SF_DIR).collect()
    ]
    assert got == expect
    assert len(got) >= 1


def test_effective_rank_matches_pure_python(spark):
    vecs = _vecs()
    n = len(vecs)
    dim = cq._DIM
    s = [0] * dim
    gram = [[0] * dim for _ in range(dim)]
    for vq, _ in vecs.values():
        for i in range(dim):
            s[i] += vq[i]
        for i in range(dim):
            vi = vq[i]
            gi = gram[i]
            for j in range(dim):
                gi[j] += vi * vq[j]
    tr = 0
    fro2 = 0
    for i in range(dim):
        for j in range(dim):
            cij = n * gram[i][j] - s[i] * s[j]
            fro2 += cij * cij
            if i == j:
                tr += cij
    expect = (
        n,
        round(float(tr) * float(tr) / float(fro2), 4),
        round(float(tr) * float(tr) / (float(fro2) * dim), 4),
    )
    r = cq.embeddings_effective_rank_stats(spark, SF_DIR).collect()[0]
    got = (
        int(r["n_vectors"]),
        float(r["eff_rank"]),
        float(r["eff_rank_frac"]),
    )
    assert got == expect
    assert 1.0 <= got[1] <= dim


def test_binary_segmentation_matches_pure_python(spark):
    from clashroyale_datapipeline_agent_spark.plans import control_queries as ctl

    t = pq.read_table(SF_DIR + "/events.parquet")
    daily: dict = {}
    for ts, v in zip(
        t.column("ts").to_pylist(), t.column("value").to_pylist()
    ):
        d = ts.date()
        n, s = daily.get(d, (0, 0))
        daily[d] = (n + 1, s + int(round(float(v) * 100)))
    days = sorted(daily)
    nt = sum(n for n, _ in daily.values())
    st = sum(s for _, s in daily.values())
    rows = []
    nl = sl = 0
    for d in days:
        n, s = daily[d]
        nl, sl = nl + n, sl + s
        nr, sr = nt - nl, st - sl
        if nr <= 0:
            continue
        num = sl * nr - sr * nl
        bss = float(num * num) / (float(nl) * float(nr))
        rows.append(
            (
                d,
                nl,
                nr,
                round(float(sl) / (nl * 100.0), 4),
                round(float(sr) / (nr * 100.0), 4),
                round(bss / 10000.0, 4),
            )
        )
    expect = sorted(rows, key=lambda r: (-r[5], r[0]))[:3]
    got = [
        (
            r["split_day"],
            int(r["n_left"]),
            int(r["n_right"]),
            float(r["mean_left"]),
            float(r["mean_right"]),
            float(r["bss"]),
        )
        for r in ctl.events_binary_segmentation_split(spark, SF_DIR).collect()
    ]
    assert got == expect
    # the winning split separates the segment means
    assert got[0][3] != got[0][4]


def test_bpe_apply_matches_pure_python(spark):
    from clashroyale_datapipeline_agent_spark.plans import scale_queries as sq

    t = pq.read_table(SF_DIR + "/documents.parquet")
    wl: dict = {}
    wf: dict = {}
    for lang, text in zip(
        t.column("lang").to_pylist(), t.column("text").to_pylist()
    ):
        for w in text.split(" "):
            if not w:
                continue
            wl[(lang, w)] = wl.get((lang, w), 0) + 1
    for (_, w), f in wl.items():
        if len(w) >= 2:
            wf[w] = wf.get(w, 0) + f
    pair_f: dict = {}
    for w, f in wf.items():
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            pair_f[p] = pair_f.get(p, 0) + f
    merges = sorted(pair_f, key=lambda p: (-pair_f[p], p))[:4]
    agg: dict = {}
    for (lang, w), f in wl.items():
        w4 = w
        for i, m in enumerate(merges):
            w4 = w4.replace(m, chr(i + 1))
        types, toks, b, a = agg.get(lang, (0, 0, 0, 0))
        agg[lang] = (
            types + 1,
            toks + f,
            b + f * len(w),
            a + f * len(w4),
        )
    expect = {
        lang: (ty, tk, b, a, b - a, round(float(b) / float(a), 4))
        for lang, (ty, tk, b, a) in agg.items()
    }
    got = {
        r["lang"]: (
            int(r["n_word_types"]),
            int(r["n_tokens"]),
            int(r["symbols_before"]),
            int(r["symbols_after"]),
            int(r["merges_applied"]),
            float(r["compression"]),
        )
        for r in sq.docs_bpe_apply_compression(spark, SF_DIR).collect()
    }
    assert got == expect
    assert all(v[5] >= 1.0 for v in got.values())


def test_cka_halves_matches_pure_python(spark):
    vecs = _vecs()
    n = len(vecs)
    dim = cq._DIM
    half = dim // 2
    s = [0] * dim
    gram = [[0] * dim for _ in range(dim)]
    for vq, _ in vecs.values():
        for i in range(dim):
            s[i] += vq[i]
        for i in range(dim):
            vi = vq[i]
            gi = gram[i]
            for j in range(dim):
                gi[j] += vi * vq[j]
    fxy = fxx = fyy = 0
    for i in range(dim):
        for j in range(dim):
            cij = n * gram[i][j] - s[i] * s[j]
            c2 = cij * cij
            if i < half and j >= half:
                fxy += c2
            elif i < half and j < half:
                fxx += c2
            elif i >= half and j >= half:
                fyy += c2
    expect = (
        n,
        round(float(fxy) / (math.sqrt(float(fxx)) * math.sqrt(float(fyy))), 4),
    )
    r = cq.embeddings_cka_halves(spark, SF_DIR).collect()[0]
    got = (int(r["n_vectors"]), float(r["cka"]))
    assert got == expect
    assert 0.0 <= got[1] <= 1.0 + 1e-9


def _lsh_calibration_oracle():
    t = pq.read_table(SF_DIR + "/documents.parquet")
    sh = {}
    for did, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        if int(did) >= cq._LSH_SAMPLE:
            continue
        ts = [w for w in text.lower().split() if w]
        sh[int(did)] = {
            " ".join(ts[i : i + 3]) for i in range(max(len(ts) - 2, 0))
        }
    ids = sorted(sh)
    hist = {k: 0 for k in range(1, 21)}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                hist[1] += 1
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            hist[min(20 * inter // union, 19) + 1] += 1
    out = {}
    for r in cq._LSH_R:
        for b in cq._LSH_B:
            dup_h = dup_hp = fp_hp = 0
            for k, h in hist.items():
                s = (2 * k - 1) / 40.0
                sr = s
                n = r
                while n > 1:
                    sr = sr * sr
                    n //= 2
                x = 1.0 - sr
                n = b
                while n > 1:
                    x = x * x
                    n //= 2
                p9 = int(round((1.0 - x) * 1e9))
                if k >= 11:
                    dup_h += h
                    dup_hp += h * p9
                else:
                    fp_hp += h * p9
            rec = (
                None
                if dup_h == 0
                else round(float(dup_hp) / (float(dup_h) * 1e9), 4)
            )
            out[(r, b)] = (dup_h, rec, round(float(fp_hp) / 1e9, 4))
    return out


def test_lsh_param_calibration_matches_pure_python(spark):
    expect = _lsh_calibration_oracle()
    got = {
        (int(r["r"]), int(r["b"])): (
            int(r["n_dup_pairs"]),
            None if r["est_recall"] is None else float(r["est_recall"]),
            float(r["est_fp_pairs"]),
        )
        for r in cq.dedup_lsh_param_calibration(spark, SF_DIR).collect()
    }
    assert got == expect


def test_lsh_param_calibration_s_curve_monotonicity(spark):
    rows = {
        (int(r["r"]), int(r["b"])): r
        for r in cq.dedup_lsh_param_calibration(spark, SF_DIR).collect()
    }
    # more bands -> higher collision probability everywhere: recall and
    # FP volume both non-decreasing in b at fixed r
    for r in cq._LSH_R:
        for b1, b2 in zip(cq._LSH_B, cq._LSH_B[1:]):
            a, c = rows[(r, b1)], rows[(r, b2)]
            if a["est_recall"] is not None:
                assert float(c["est_recall"]) >= float(a["est_recall"])
            assert float(c["est_fp_pairs"]) >= float(a["est_fp_pairs"])
    # more rows per band -> stricter bands: FP volume non-increasing in r
    for b in cq._LSH_B:
        for r1, r2 in zip(cq._LSH_R, cq._LSH_R[1:]):
            assert float(rows[(r2, b)]["est_fp_pairs"]) <= float(
                rows[(r1, b)]["est_fp_pairs"]
            )


def test_corpus_digest_matches_pure_python(spark):
    import hashlib

    from clashroyale_datapipeline_agent_spark.plans import curation_queries as cur

    t = pq.read_table(SF_DIR + "/documents.parquet")
    agg: dict = {}
    for did, text, lang, src, nch in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
        t.column("source").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        v1 = int(hashlib.md5(f"{did}:{text}".encode()).hexdigest()[:8], 16)
        v2 = int(hashlib.md5(f"{text}#{lang}".encode()).hexdigest()[:8], 16)
        n, c, s1, s2 = agg.get(src, (0, 0, 0, 0))
        agg[src] = (n + 1, c + int(nch), s1 + v1, s2 + v2)
    expect = {
        src: (n, c, s1 % 2147483647, s2 % 2147483647)
        for src, (n, c, s1, s2) in agg.items()
    }
    got = {
        r["source"]: (
            int(r["n_docs"]),
            int(r["n_chars_total"]),
            int(r["digest_id_text"]),
            int(r["digest_text_lang"]),
        )
        for r in cur.corpus_digest_by_source(spark, SF_DIR).collect()
    }
    assert got == expect


def test_corpus_digest_order_invariant_and_change_sensitive():
    """The digest is a sum: permuting rows cannot move it; changing one
    row's text moves it unless the 32-bit hashes collide."""
    import hashlib

    rows = [(i, f"text {i}") for i in range(50)]
    dig = lambda rs: sum(  # noqa: E731
        int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:8], 16)
        for i, t in rs
    ) % 2147483647
    base = dig(rows)
    assert dig(list(reversed(rows))) == base
    mutated = [(i, t if i != 7 else t + "!") for i, t in rows]
    assert dig(mutated) != base


def test_keep_policy_divergence_matches_pure_python(spark):
    from clashroyale_datapipeline_agent_spark.plans import curation_queries as cur

    t = pq.read_table(SF_DIR + "/documents.parquet")
    docs = {
        int(d): (text, src, int(nch))
        for d, text, src, nch in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
            t.column("n_chars").to_pylist(),
        )
    }
    ids = set(docs)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members = set()
    for i in ids:
        if i % 3 == 0 and i + 1 in ids:
            union(i, i + 1)
            members.update((i, i + 1))
        if i % 9 == 0 and i + 2 in ids:
            union(i, i + 2)
            members.update((i, i + 2))
    clusters: dict = {}
    for i in members:
        clusters.setdefault(find(i), []).append(i)

    def quality(i):
        ts = [w for w in docs[i][0].lower().strip().split() if w]
        return len(set(ts)) * 1.0 / len(ts)

    agg: dict = {}
    for mem in clusters.values():
        qwin = min(mem, key=lambda i: (-quality(i), i))
        lwin = min(mem, key=lambda i: (-docs[i][2], i))
        src = docs[qwin][1]
        n, dv, qc, lc = agg.get(src, (0, 0, 0, 0))
        agg[src] = (
            n + 1,
            dv + (1 if qwin != lwin else 0),
            qc + docs[qwin][2],
            lc + docs[lwin][2],
        )
    got = {
        r["source"]: (
            int(r["n_clusters"]),
            int(r["n_divergent"]),
            int(r["kept_chars_quality"]),
            int(r["kept_chars_longest"]),
        )
        for r in cur.dedup_keep_policy_divergence(spark, SF_DIR).collect()
    }
    assert got == agg
    # the policies genuinely diverge somewhere on this corpus
    assert sum(v[1] for v in got.values()) >= 1

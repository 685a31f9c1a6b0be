"""Round-8 wave 2: representation / protocol audits — the checks a
100 TB training pipeline runs BEFORE trusting its own machinery:
Johnson-Lindenstrauss distortion of a random projection (is the cheap
16-dim index faithful to the 64-dim geometry?), split-conformal
coverage (does the distribution-free interval actually cover?),
nearest-centroid label-noise (are the labels the clustering queries
key on trustworthy?), Hamilton largest-remainder apportionment (the
exact-integer answer to "allocate a sample budget proportionally"),
and tokenizer fertility (what a BPE-ish pre-tokenizer will do to the
token budget before anyone trains one).

House determinism discipline (SCALE.md "Float-ROUND ledger"):

- the JL projection's +-1 signs come from comparing one md5 hex char
  against '8' — a pure string compare, identical in both engines;
  all projections and distances are exact integer sums
  (decimal(38,0)/HUGEINT);
- the conformal threshold is an EXACT ORDER STATISTIC (rank
  ceil((n+1)*(1-alpha))), not an interpolated quantile — rank
  selection on (score, doc_id) is total-ordered and engine-free;
- apportionment is pure integer arithmetic end to end (floor shares
  via integer division, remainders ranked with a source tiebreak) —
  the one query family where even the OUTPUT is exact ints;
- argmin over centroid distances orders by (d2, label): d2 is three
  IEEE divisions of exact ints summed in fixed expression order, so
  both engines materialize bit-identical doubles, and the label
  tiebreak makes the argmin total.

No reference counterpart (``/root/reference/src`` has no embedding,
sampling-theory, or tokenizer surface); these serve the 100 TB
training-data story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.plans.star_queries import _t, register

# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection distortion audit
# ---------------------------------------------------------------------------

_JL_K = 16          #: projected dimensionality
_JL_NVEC = 32       #: probe vectors (bounded pair census: 32*31/2 = 496)

_JL_SQL = f"""
    WITH dims AS (
        SELECT unnest(generate_series(1, 64)) AS i
    ), pv AS (
        SELECT vec_id, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS vq
        FROM embeddings, dims WHERE vec_id < {_JL_NVEC}
    ), signs AS (
        SELECT j, i,
               CASE WHEN substr(md5(CAST(j AS VARCHAR) || ':'
                                  || CAST(i AS VARCHAR)), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(generate_series(1, {_JL_K})) AS j), dims
    ), proj AS (
        SELECT pv.vec_id, signs.j,
               SUM(CAST(signs.s * pv.vq AS HUGEINT)) AS p
        FROM pv JOIN signs USING (i)
        GROUP BY pv.vec_id, signs.j
    ), od AS (
        SELECT a.vec_id AS u, b.vec_id AS v,
               SUM(CAST(a.vq - b.vq AS HUGEINT)
                   * CAST(a.vq - b.vq AS HUGEINT)) AS d2
        FROM pv a JOIN pv b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), pd AS (
        SELECT a.vec_id AS u, b.vec_id AS v,
               SUM((a.p - b.p) * (a.p - b.p)) AS pd2
        FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), ratios AS (
        SELECT CAST(ROUND(1000000.0 * CAST(pd.pd2 AS DOUBLE)
                          / ({_JL_K} * CAST(od.d2 AS DOUBLE)))
                    AS BIGINT) AS r
        FROM od JOIN pd ON od.u = pd.u AND od.v = pd.v
        WHERE od.d2 > 0
    )
    SELECT CAST({_JL_K} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(r) / (COUNT(*) * 1000000.0), 4) AS mean_ratio,
           ROUND(MIN(r) / 1000000.0, 4) AS min_ratio,
           ROUND(MAX(r) / 1000000.0, 4) AS max_ratio,
           CAST(SUM(CASE WHEN r < 500000 OR r > 1500000
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs_distorted_50pct
    FROM ratios
"""


@register("embeddings_jl_projection_audit", _JL_SQL)
def embeddings_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit for a signed random
    projection 64 -> 16 (Achlioptas 2003: +-1 entries suffice): for a
    bounded probe set of 32 vectors (496 pairs), the ratio
    ||Pu - Pv||^2 / (k * ||u - v||^2) should concentrate near 1 — the
    pre-flight check before trusting a cheap projected index (PQ/LSH
    shadow dims) with 100 TB of distance decisions. The projection
    matrix is GENERATED, not stored: sign(j, i) = md5 hex compare, so
    any executor rebuilds any entry locally. All sums are exact
    integers (HUGEINT/decimal(38,0): diffs reach 4e6, squares 1.6e13,
    x64 dims under 1e15; projections reach 1.3e8, squared 1.6e16 x16
    under 3e17). Per-pair ratios take ONE double division and quantize
    to 1e6 BIGINTs before the census. The probe-set size is the dial:
    the pair census is |probe|^2, never corpus^2."""
    e = _t(spark, sf_dir, "embeddings")
    dims = spark.range(1, 65).select(F.col("id").cast("int").alias("i"))
    pv = (
        e.where(F.col("vec_id") < _JL_NVEC)
        .select(
            "vec_id",
            F.posexplode("embedding").alias("pos", "val"),
        )
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("i"),
            F.round(F.col("val").cast("double") * 1000000.0)
            .cast("bigint")
            .alias("vq"),
        )
        .localCheckpoint(eager=True)  # probe set; feeds proj AND od
    )
    signs = (
        spark.range(1, _JL_K + 1)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(dims)
        .select(
            "j",
            "i",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("j").cast("string"),
                            F.lit(":"),
                            F.col("i").cast("string"),
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
    )
    proj = (
        pv.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(
            F.sum((F.col("s") * F.col("vq")).cast("decimal(18,0)")).alias(
                "p"
            )
        )
    )
    a, b = pv.alias("a"), pv.alias("b")
    od = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("v")
        )
        .agg(
            F.sum(
                (F.col("a.vq") - F.col("b.vq")).cast("decimal(18,0)")
                * (F.col("a.vq") - F.col("b.vq")).cast("decimal(18,0)")
            ).alias("d2")
        )
    )
    pa, pb = proj.alias("pa"), proj.alias("pb")
    pd = (
        pa.join(
            pb,
            (F.col("pa.j") == F.col("pb.j"))
            & (F.col("pa.vec_id") < F.col("pb.vec_id")),
        )
        .groupBy(
            F.col("pa.vec_id").alias("u"), F.col("pb.vec_id").alias("v")
        )
        .agg(
            F.sum(
                (F.col("pa.p") - F.col("pb.p"))
                * (F.col("pa.p") - F.col("pb.p"))
            ).alias("pd2")
        )
    )
    ratios = (
        od.join(pd, ["u", "v"])
        .where(F.col("d2") > 0)
        .select(
            F.round(
                1000000.0
                * F.col("pd2").cast("double")
                / (_JL_K * F.col("d2").cast("double"))
            )
            .cast("bigint")
            .alias("r")
        )
    )
    return ratios.agg(
        F.lit(_JL_K).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.sum("r") / (F.count(F.lit(1)) * 1000000.0), 4).alias(
            "mean_ratio"
        ),
        F.round(F.min("r") / 1000000.0, 4).alias("min_ratio"),
        F.round(F.max("r") / 1000000.0, 4).alias("max_ratio"),
        F.sum(
            F.when((F.col("r") < 500000) | (F.col("r") > 1500000), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_pairs_distorted_50pct"),
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage audit (alpha = 0.1)
# ---------------------------------------------------------------------------

_CONF_SQL = """
    WITH split AS (
        SELECT doc_id, n_chars,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_cal
        FROM documents
    ), mu AS (
        SELECT SUM(n_chars) * 1.0 / COUNT(*) AS mu_cal,
               CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM split WHERE is_cal
    ), scored AS (
        SELECT s.doc_id, s.is_cal, ABS(s.n_chars - mu.mu_cal) AS score
        FROM split s, mu
    ), ranked AS (
        SELECT score,
               ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rk
        FROM scored WHERE is_cal
    ), thr AS (
        SELECT r.score AS threshold, mu.n_cal
        FROM ranked r, mu
        WHERE r.rk = CAST(ceil((mu.n_cal + 1) * 0.9) AS BIGINT)
    )
    SELECT thr.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(thr.threshold, 4) AS threshold,
           ROUND(SUM(CASE WHEN s.score <= thr.threshold THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS coverage,
           CAST(0.9 AS DOUBLE) AS target
    FROM scored s, thr
    WHERE NOT s.is_cal
    GROUP BY thr.n_cal, thr.threshold
"""


@register("docs_conformal_coverage", _CONF_SQL)
def docs_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit (Vovk et al.; Lei et al. 2018)
    at alpha = 0.1: an md5 hash split carves ~50% calibration docs, the
    nonconformity score is |n_chars - mean_cal|, the interval radius is
    the EXACT ceil((n+1)(1-alpha))-th smallest calibration score (rank
    statistic with doc_id tiebreak — no interpolation, so the
    distribution-free guarantee holds verbatim and the threshold is
    engine-free), and the audit measures held-out coverage, which must
    be >= 0.9 in expectation. Scale shape: one scan, a 1-row
    calibration mean, ONE sort of the calibration scores for the rank
    statistic (at 100 TB the calibration set is a fixed-size sample by
    construction — split-conformal needs only thousands of points; the
    GK sketch is the documented approximate path if it is not). The
    score's one subtraction uses the exact-int mean division once."""
    d = _t(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        "n_chars",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8")
        .alias("is_cal"),
    ).localCheckpoint(eager=True)  # feeds mu, ranked, AND the test census
    mu = split.where("is_cal").agg(
        (F.sum("n_chars") * 1.0 / F.count(F.lit(1))).alias("mu_cal"),
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
    )
    scored = split.crossJoin(F.broadcast(mu.select("mu_cal"))).select(
        "doc_id",
        "is_cal",
        F.abs(F.col("n_chars") - F.col("mu_cal")).alias("score"),
    )
    w = Window.orderBy("score", "doc_id")
    thr = (
        scored.where("is_cal")
        .select("score", F.row_number().over(w).alias("rk"))
        .crossJoin(F.broadcast(mu.select("n_cal")))
        .where(
            F.col("rk")
            == F.ceil((F.col("n_cal") + 1) * 0.9).cast("bigint")
        )
        .select(F.col("score").alias("threshold"), "n_cal")
    )
    return (
        scored.where(~F.col("is_cal"))
        .crossJoin(F.broadcast(thr))
        .groupBy("n_cal", "threshold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(
                F.sum(
                    F.when(F.col("score") <= F.col("threshold"), 1)
                    .otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("coverage"),
        )
        .select(
            "n_cal",
            "n_test",
            F.round("threshold", 4).alias("threshold"),
            "coverage",
            F.lit(0.9).alias("target"),
        )
    )


# ---------------------------------------------------------------------------
# Hamilton largest-remainder apportionment of a sample budget
# ---------------------------------------------------------------------------

_APPORTION_B = 10000

_APPORTION_SQL = f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), tot AS (
        SELECT SUM(n_docs) AS n FROM counts
    ), quota AS (
        SELECT source, n_docs,
               ({_APPORTION_B} * n_docs) // tot.n AS base,
               ({_APPORTION_B} * n_docs) % tot.n AS rem
        FROM counts, tot
    ), leftover AS (
        SELECT {_APPORTION_B} - SUM(base) AS extra FROM quota
    ), ranked AS (
        SELECT source, n_docs, base, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        FROM quota
    )
    SELECT source, n_docs,
           CAST(base + CASE WHEN rk <= leftover.extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked, leftover
    ORDER BY source
"""


@register("docs_apportionment_plan", _APPORTION_SQL)
def docs_apportionment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 10,000-doc sample
    budget across sources: floor shares by integer division, then the
    leftover units go to the largest remainders (source tiebreak).
    This is the EXACT-integer answer to "proportional allocation that
    sums exactly to the budget" — float rounding of B*n_s/N shares can
    miss the budget by several units and differ across engines;
    integer div/mod cannot. Complements docs_neyman_allocation (which
    optimizes variance) with the pure-proportional protocol. Scale:
    one bounded (source) count, then a |sources|-row epilogue window.
    Every value in the OUTPUT is an exact integer."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").alias("n"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({_APPORTION_B} * n_docs) div n")
        .cast("bigint")
        .alias("base"),
        ((_APPORTION_B * F.col("n_docs")) % F.col("n")).alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(_APPORTION_B) - F.sum("base")).alias("extra")
    )
    w = Window.orderBy(F.col("rem").desc(), "source")
    return (
        quota.select(
            "source", "n_docs", "base", F.row_number().over(w).alias("rk")
        )
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_docs",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility (BPE-ish pre-tokenizer vs whitespace words)
# ---------------------------------------------------------------------------

_FERT_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

_FERT_SQL = f"""
    WITH t AS (
        SELECT lang,
               len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                     '\\s+'),
                               x -> x != '')) AS n_words,
               len(regexp_extract_all(lower(text), '{_FERT_PAT}'))
                   AS n_pieces,
               len(replace(lower(text), ' ', '')) AS n_chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
           ROUND(SUM(n_pieces) * 1.0 / SUM(n_words), 4) AS fertility,
           ROUND(SUM(n_chars) * 1.0 / SUM(n_pieces), 4)
               AS chars_per_piece
    FROM t WHERE n_words > 0 GROUP BY lang ORDER BY lang
"""


@register("docs_tokenizer_fertility", _FERT_SQL)
def docs_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: pieces-per-word and
    chars-per-piece under a GPT-2-style pre-tokenizer (split into
    letter runs / digit runs / symbol runs — the regex alternation
    both engines' RE2/Java regexes agree on; no lookarounds). Fertility
    is THE budget number a tokenizer change moves: pieces/word tells
    you how many BPE tokens a corpus will cost before anyone trains
    the merges. Pure per-row expressions; one bounded (lang) agg of
    exact ints; two trailing divisions on exact sums."""
    d = _t(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    t = d.select(
        "lang",
        F.size(
            F.filter(
                F.split(F.trim(lower), r"\s+"), lambda x: x != ""
            )
        ).alias("n_words"),
        F.size(F.regexp_extract_all(lower, F.lit(_FERT_PAT), 0)).alias(
            "n_pieces"
        ),
        F.length(F.replace(lower, F.lit(" "), F.lit(""))).alias(
            "n_chars"
        ),
    )
    return (
        t.where(F.col("n_words") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(
                F.sum("n_pieces") * 1.0 / F.sum("n_words"), 4
            ).alias("fertility"),
            F.round(
                F.sum("n_chars") * 1.0 / F.sum("n_pieces"), 4
            ).alias("chars_per_piece"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Nearest-centroid label-noise audit
# ---------------------------------------------------------------------------

_NOISE_SQL = """
    WITH dims AS (
        SELECT unnest(generate_series(1, 64)) AS i
    ), pe AS (
        SELECT vec_id, label, i,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS vq
        FROM embeddings, dims
    ), cent AS (
        SELECT label AS clabel, i, SUM(vq) AS s, COUNT(*) AS n
        FROM pe GROUP BY label, i
    ), csum AS (
        SELECT clabel, SUM(CAST(s AS HUGEINT) * s) AS sc2, MIN(n) AS n
        FROM cent GROUP BY clabel
    ), vsum AS (
        SELECT vec_id, label AS own, SUM(vq * vq) AS sv2
        FROM pe GROUP BY vec_id, label
    ), cross_t AS (
        SELECT pe.vec_id, c.clabel, SUM(CAST(pe.vq AS HUGEINT) * c.s) AS cr
        FROM pe JOIN cent c ON pe.i = c.i
        GROUP BY pe.vec_id, c.clabel
    ), d AS (
        SELECT v.vec_id, v.own, x.clabel,
               v.sv2 / 1e12
                   - 2.0 * CAST(x.cr AS DOUBLE) / (s.n * 1e12)
                   + CAST(s.sc2 AS DOUBLE) / (s.n * s.n * 1e12) AS d2
        FROM vsum v
        JOIN cross_t x ON v.vec_id = x.vec_id
        JOIN csum s ON x.clabel = s.clabel
    ), best AS (
        SELECT vec_id, own, clabel AS pred
        FROM d
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY d2, clabel) = 1
    )
    SELECT own AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN pred != own THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatch,
           ROUND(SUM(CASE WHEN pred != own THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS mismatch_rate
    FROM best GROUP BY own ORDER BY own
"""


@register("embeddings_label_noise_audit", _NOISE_SQL)
def embeddings_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit by nearest-centroid disagreement (the cheap
    core of confident learning, Northcutt et al. 2021): a vector whose
    nearest label-centroid is NOT its own label is a noise suspect;
    per-label suspect rates tell you which label partitions to distrust
    before SemDeDup-style per-cluster ops key on them. Reuses the
    silhouette machinery's exact expansion (resolution_queries.py:567):
    d^2 = Sv2/1e12 - 2*cr/(n*1e12) + sc2/(n^2*1e12) over exact
    decimal/HUGEINT sums of 1e6-quantized components, so both engines
    materialize bit-identical doubles; the argmin orders by (d2,
    clabel) — total, tiebroken, engine-free. Cost: n_vecs x n_labels
    distance rows (the label count is the bounded dial), one (label,
    dim) centroid shuffle, one broadcast join back."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("val").cast("double") * 1000000.0)
        .cast("bigint")
        .alias("vq"),
    )
    cent = pe.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("vq").alias("s"), F.count(F.lit(1)).alias("n")
    )
    s_dec = F.col("s").cast("decimal(18,0)")
    csum = cent.groupBy("clabel").agg(
        F.sum(s_dec * s_dec).alias("sc2"), F.min("n").alias("n")
    )
    vsum = pe.groupBy("vec_id", F.col("label").alias("own")).agg(
        F.sum(F.col("vq") * F.col("vq")).alias("sv2")
    )
    cross_t = (
        pe.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "clabel")
        .agg(F.sum(F.col("vq").cast("decimal(18,0)") * s_dec).alias("cr"))
    )
    d2 = (
        F.col("sv2") / 1e12
        - 2.0 * F.col("cr").cast("double") / (F.col("n") * 1e12)
        + F.col("sc2").cast("double")
        / (F.col("n") * F.col("n") * 1e12)
    )
    d = (
        vsum.join(cross_t, "vec_id")
        .join(F.broadcast(csum), "clabel")
        .select("vec_id", "own", "clabel", d2.alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "clabel")
    best = (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "own", F.col("clabel").alias("pred"))
    )
    return (
        best.groupBy(F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("pred") != F.col("own"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_mismatch"),
            F.round(
                F.sum(
                    F.when(F.col("pred") != F.col("own"), 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("mismatch_rate"),
        )
        .orderBy("label")
    )

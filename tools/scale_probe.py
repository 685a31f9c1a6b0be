"""Scaling probe: time the flagship aggregation, the MinHash-LSH dedup
pipeline, and the exact-substring span-coverage pipeline at 1x/4x/16x the
sf0.1 volume (duplicated with perturbed keys into /tmp parquet) and report
rows/sec. Linear wall-clock growth (flat rows/sec) demonstrates the plans
have no super-linear term — the local proxy for the 100 TB claim. The
dedup and substring probes matter separately: their duplicate-detection
paths are the plans whose cost COULD go quadratic if the banding (dedup)
or the no-pair-join shape (substring) were wrong — the substring probe
replicates docs EXACTLY, so every window is duplicated mult-fold and
duplicate handling carries its worst-case load.

    python tools/scale_probe.py [flagship|dedup|substring|dedup-worstcase|
                                 bigram-worstcase|span-worstcase|
                                 dsir-worstcase|doremi-worstcase]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    spark = get_spark("scale-probe")
    base = load_star_table(spark, "/root/testdata/sf0.1", "lineitem")

    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_"))
    results = []
    for mult in (1, 4, 16):
        path = tmp / f"x{mult}"
        (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .withColumn("l_orderkey", F.col("l_orderkey") * mult + F.col("_rep"))
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path))
        )
        df = spark.read.parquet(str(path))
        n = df.count()
        # warm
        _agg(df).count()
        t0 = time.perf_counter()
        _agg(df).count()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(f"x{mult:<3d} rows={n:>9,d}  wall={dt:6.2f}s  rows/sec={int(n/dt):,}")

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means near-linear scaling; <1 includes fixed overhead amortizing out)"
    )


def _agg(df):
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sq"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sd"),
            F.avg("l_discount").alias("ad"),
        )
    )


def main_dedup() -> None:
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        minhash_lsh_dedup,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    spark = get_spark("scale-probe-dedup")
    base = load_star_table(spark, "/root/testdata/sf0.1", "documents")

    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_dedup_"))
    results = []
    for mult in (1, 4, 16):
        path = tmp / f"x{mult}"
        (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .withColumn("doc_id", F.col("doc_id") * mult + F.col("_rep"))
            # perturb text per replica so replicas are NEAR-dups, not exact:
            # keeps the candidate count realistic instead of exploding every
            # band bucket by mult x
            .withColumn("text", F.concat_ws(" ", "text", F.col("_rep").cast("string")))
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path))
        )
        df = spark.read.parquet(str(path))
        n = df.count()
        minhash_lsh_dedup(df, threshold=0.8).count()  # warm
        t0 = time.perf_counter()
        kept = minhash_lsh_dedup(df, threshold=0.8).count()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(
            f"x{mult:<3d} docs={n:>8,d} kept={kept:>8,d}  wall={dt:6.2f}s"
            f"  docs/sec={int(n/dt):,}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means the banded candidate join stayed near-linear)"
    )


def main_substring() -> None:
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.plans.curation_queries import (
        docs_exact_substring_coverage,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    spark = get_spark("scale-probe-substring")
    base = load_star_table(spark, "/root/testdata/sf0.1", "documents")

    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_substr_"))
    results = []
    for mult in (1, 4, 16):
        path = tmp / f"x{mult}" / "documents.parquet"
        (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .withColumn("doc_id", F.col("doc_id") * mult + F.col("_rep"))
            # EXACT replicas: every 40-char window becomes duplicated, so
            # the dup-detection agg and semi-join carry worst-case load
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path))
        )
        sf_dir = str(tmp / f"x{mult}")
        n = spark.read.parquet(str(path)).count()
        docs_exact_substring_coverage(spark, sf_dir).count()  # warm
        t0 = time.perf_counter()
        docs_exact_substring_coverage(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(
            f"x{mult:<3d} docs={n:>8,d}  wall={dt:6.2f}s"
            f"  docs/sec={int(n/dt):,}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means the no-pair-join span pipeline stayed near-linear)"
    )


def main_dedup_worstcase() -> None:
    """Mega-duplicate-cluster probe: replicate the corpus with EXACT text
    (no perturbation), so every LSH band bucket of a duplicated doc grows
    mult-fold and the uncapped candidate join would go quadratic in mult.
    With ``max_bucket`` the star-divert keeps candidate volume linear —
    docs/sec should stay near-flat across 1x/4x/16x, which is the local
    proof that one boilerplate mega-cluster cannot sink a 100 TB run."""
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import load_star_table

    spark = get_spark("scale-probe-dedup-worstcase")
    base = load_star_table(spark, "/root/testdata/sf0.1", "documents")

    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_dedup_wc_"))
    results = []
    for mult in (1, 4, 16):
        path = tmp / f"x{mult}"
        (
            base.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
            .withColumn("doc_id", F.col("doc_id") * mult + F.col("_rep"))
            # EXACT replicas: every doc becomes a mult-sized mega-cluster
            .drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path))
        )
        df = spark.read.parquet(str(path))
        n = df.count()
        probe = lambda: lsh_candidate_pairs(df, max_bucket=8).count()  # noqa: E731
        probe()  # warm
        t0 = time.perf_counter()
        cands = probe()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(
            f"x{mult:<3d} docs={n:>8,d} cands={cands:>9,d}  wall={dt:6.2f}s"
            f"  docs/sec={int(n/dt):,}  cands/doc={cands/n:.2f}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means the star-divert kept the mega-cluster load linear)"
    )


def main_image_worstcase() -> None:
    """Image near-dup mega-cluster probe (round 10): EVERY asset carries
    the IDENTICAL image (one params row replicated), so all dHashes are
    equal and every Hamming band bucket holds the whole corpus — the
    uncapped banded self-join would emit 4·C(n,2) pairs. With
    ``max_bucket`` the star-divert keeps candidates at n−1 edges, so
    assets/sec should stay near-flat across 1x/4x/16x — the image twin
    of ``dedup-worstcase`` (near-constant images are every crawl's
    mega-cluster: black frames, blank thumbnails)."""
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        hamming_candidate_pairs,
    )
    from clashroyale_datapipeline_agent_spark.operators.multimodal import (
        dhash_assets,
        synthesize_gradient_png_assets,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("scale-probe-image-wc")
    base = 20_000
    results = []
    for mult in (1, 4, 16):
        n = base * mult
        params = spark.range(n).select(
            F.col("id").alias("asset_id"),
            F.lit(18).cast("int").alias("w"),
            F.lit(16).cast("int").alias("h"),
            F.lit(37).cast("int").alias("g"),
            F.lit(3).cast("int").alias("d"),
            F.lit(2).cast("int").alias("e"),
        ).repartition(32)
        hashes = dhash_assets(
            synthesize_gradient_png_assets(params)
        ).select(F.col("asset_id").alias("id"), F.col("dhash").alias("h"))

        def probe():
            return hamming_candidate_pairs(
                hashes, hash_col="h", id_col="id",
                max_hamming=6, max_bucket=16,
            ).count()

        probe()  # warm
        t0 = time.perf_counter()
        cands = probe()
        dt = time.perf_counter() - t0
        results.append((mult, n, dt, int(n / dt)))
        print(
            f"x{mult:<3d} assets={n:>8,d} cands={cands:>9,d}  wall={dt:6.2f}s"
            f"  assets/sec={int(n/dt):,}  cands/asset={cands/n:.2f}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means the star-divert kept the mega-cluster load linear)"
    )


def main_bigram_worstcase() -> None:
    """Unique-bigram corpus probe for ``docs_bigram_lm_surprisal_by_source``:
    the query's scale note says the scored grain is DISTINCT (source, w1,
    w2) bigrams, "far smaller than instances" — this probe builds the
    adversarial corpus where that compression is exactly zero (every
    token is globally unique, so distinct-grain = instance-grain) and
    checks the plan stays linear anyway: tokens/sec should be near-flat
    across 1x/4x/16x, because even at its worst the pipeline is a fixed
    number of instance-width hash-agg shuffles, never a pair join."""
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.plans.drift_queries import (
        docs_bigram_lm_surprisal_by_source,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("scale-probe-bigram-wc")
    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_bigram_wc_"))
    base_docs, toks_per_doc = 40_000, 20
    results = []
    for mult in (1, 4, 16):
        n_docs = base_docs * mult
        path = tmp / f"x{mult}"
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
                        lambda i: F.concat(
                            F.lit("t"),
                            (F.col("id") * 32 + i).cast("string"),
                        ),
                    ),
                ).alias("text"),
                F.lit("en").alias("lang"),
                F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias(
                    "source"
                ),
                F.lit(200).cast("bigint").alias("n_chars"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path / "documents.parquet"))
        )
        n_tok = n_docs * toks_per_doc
        probe = lambda: docs_bigram_lm_surprisal_by_source(  # noqa: E731
            spark, str(path)
        ).count()
        probe()  # warm
        t0 = time.perf_counter()
        probe()
        dt = time.perf_counter() - t0
        results.append((mult, n_tok, dt, int(n_tok / dt)))
        print(
            f"x{mult:<3d} tokens={n_tok:>10,d}  wall={dt:6.2f}s"
            f"  tokens/sec={int(n_tok/dt):,}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means zero-compression bigrams still scale linearly)"
    )


def main_span_worstcase() -> None:
    """Mega-duplicate corpus probe for ``docs_span_dedup_census``: every
    document is the SAME text, so every 10-token window collapses onto
    a handful of fingerprints — the census' countDistinct(doc_id) and
    the join back both land on maximally hot keys. The plan survives
    because (a) Spark rewrites count(distinct) as a two-level agg whose
    first level keys on (h, doc_id) — cardinality = all windows, evenly
    spread — and (b) the join back is h-keyed with AQE skew handling
    available. windows/sec should stay near-flat across 1x/4x/16x; a
    quadratic or single-reducer term would crater it."""
    from pyspark.sql import functions as F

    from clashroyale_datapipeline_agent_spark.plans.selection_queries import (
        docs_span_dedup_census,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    spark = get_spark("scale-probe-span-wc")
    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_span_wc_"))
    base_docs, toks_per_doc = 40_000, 40  # 4 windows per doc, ALL shared
    text = " ".join(f"w{i}" for i in range(toks_per_doc))
    results = []
    for mult in (1, 4, 16):
        n_docs = base_docs * mult
        path = tmp / f"x{mult}"
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.lit(text).alias("text"),
                F.lit("en").alias("lang"),
                F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias(
                    "source"
                ),
                F.lit(len(text)).cast("bigint").alias("n_chars"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path / "documents.parquet"))
        )
        n_win = n_docs * (toks_per_doc // 10)
        probe = lambda: docs_span_dedup_census(  # noqa: E731
            spark, str(path)
        ).count()
        probe()  # warm
        t0 = time.perf_counter()
        probe()
        dt = time.perf_counter() - t0
        results.append((mult, n_win, dt, int(n_win / dt)))
        print(
            f"x{mult:<3d} windows={n_win:>10,d}  wall={dt:6.2f}s"
            f"  windows/sec={int(n_win/dt):,}"
        )

    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means the all-duplicate census still scales linearly)"
    )


def _one_bigram_corpus(spark, path: Path, n_docs: int, toks_per_doc: int) -> None:
    """Adversarial selection-wave corpus: every document of a source is
    ONE bigram repeated — per source the distinct-(w1,w2) grain collapses
    to 2 rows carrying k ~ n_docs*toks_per_doc/20 instances each (the
    opposite extreme of bigram-worstcase's all-unique corpus), and every
    token of a source lands in <= 2 of DSIR's 256 hash buckets. This is
    the maximal-skew shape: one white-hot reduce key per domain."""
    from pyspark.sql import functions as F

    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
                    lambda i: F.concat(
                        F.when(i % 2 == 0, F.lit("w")).otherwise(F.lit("v")),
                        (F.col("id") % 20).cast("string"),
                    ),
                ),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
            F.lit(200).cast("bigint").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(path / "documents.parquet"))
    )


def _probe_tokens(spark, fn, name: str, toks_per_doc: int = 20) -> None:
    tmp = Path(tempfile.mkdtemp(prefix=f"scale_probe_{name}_"))
    base_docs = 40_000
    results = []
    for mult in (1, 4, 16):
        n_docs = base_docs * mult
        path = tmp / f"x{mult}"
        _one_bigram_corpus(spark, path, n_docs, toks_per_doc)
        n_tok = n_docs * toks_per_doc
        fn(spark, str(path)).count()  # warm
        t0 = time.perf_counter()
        fn(spark, str(path)).count()
        dt = time.perf_counter() - t0
        results.append((mult, n_tok, dt, int(n_tok / dt)))
        print(
            f"x{mult:<3d} tokens={n_tok:>10,d}  wall={dt:6.2f}s"
            f"  tokens/sec={int(n_tok/dt):,}"
        )
    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means linear despite one white-hot key per domain)"
    )


def main_dsir_worstcase() -> None:
    """docs_dsir_importance_by_source under maximal bucket skew: the
    one-repeated-bigram corpus funnels each source's full token stream
    into <= 2 of the 256 hash buckets, so the bucket agg's combine step
    carries everything. Linear tokens/sec across 1x/4x/16x shows the
    map-side partial aggregation absorbs the skew (the bucket table is
    256 rows whatever the corpus — the reduce side cannot blow up)."""
    from clashroyale_datapipeline_agent_spark.plans.selection_queries import (
        docs_dsir_importance_by_source,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    _probe_tokens(
        get_spark("scale-probe-dsir-wc"),
        docs_dsir_importance_by_source,
        "dsir_wc",
    )


def main_doremi_worstcase() -> None:
    """docs_doremi_mixture_weights under distinct-grain collapse: per
    source ONE repeated bigram means the (source, w1, w2) reduce grain is
    ~40 rows total while k per row grows with the corpus — the exact
    opposite of bigram-worstcase's unique-token corpus, and the shape
    where a hot (w1, w2) key would hurt if partial aggregation (or the
    HUGEINT/decimal k*s9 sums) did not hold. Linear tokens/sec across
    1x/4x/16x pins the skew story; together the two probes bracket the
    grain spectrum."""
    from clashroyale_datapipeline_agent_spark.plans.selection_queries import (
        docs_doremi_mixture_weights,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark

    _probe_tokens(
        get_spark("scale-probe-doremi-wc"),
        docs_doremi_mixture_weights,
        "doremi_wc",
    )


def main_affinity_worstcase() -> None:
    """orders_adamic_adar_topk under maximal pair-key heat: every
    customer buys the IDENTICAL cap-sized basket (40 parts), so the
    self-join emits C(40,2)=780 pair rows per customer that ALL collapse
    onto the same 780 (part_a, part_b) reduce keys — count = n_cust on
    each, the hottest shape the pair agg can see. Linear pairs/sec
    across 1x/4x/16x customers shows map-side partial aggregation
    absorbs the heat (the reduce grain is 780 rows whatever the corpus);
    a failure here would mean the basket cap bounds fan-out but not the
    reduce skew."""
    from clashroyale_datapipeline_agent_spark.plans.coreset_queries import (
        orders_adamic_adar_topk,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("scale-probe-affinity-wc")
    tmp = Path(tempfile.mkdtemp(prefix="scale_probe_affinity_wc_"))
    base = 10_000
    results = []
    for mult in (1, 4, 16):
        n_cust = base * mult
        path = tmp / f"x{mult}"
        (
            spark.range(n_cust)
            .select(
                F.col("id").alias("o_orderkey"),
                F.col("id").alias("o_custkey"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path / "orders.parquet"))
        )
        (
            spark.range(n_cust)
            .select(
                F.col("id").alias("o_orderkey"),
                F.explode(F.sequence(F.lit(0), F.lit(39))).alias("p"),
            )
            .select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.col("p").cast("long").alias("l_partkey"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(path / "lineitem.parquet"))
        )
        n_pairs = n_cust * (40 * 39 // 2)
        orders_adamic_adar_topk(spark, str(path)).count()  # warm
        t0 = time.perf_counter()
        orders_adamic_adar_topk(spark, str(path)).count()
        dt = time.perf_counter() - t0
        results.append((mult, n_pairs, dt, int(n_pairs / dt)))
        print(
            f"x{mult:<3d} pairs={n_pairs:>12,d}  wall={dt:6.2f}s"
            f"  pairs/sec={int(n_pairs/dt):,}"
        )
    r1, r16 = results[0][3], results[-1][3]
    print(
        f"\nthroughput ratio x16/x1 = {r16 / r1:.2f} "
        "(>= ~0.7 means linear despite 780 white-hot pair keys)"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    if which == "dedup":
        main_dedup()
    elif which == "dedup-worstcase":
        main_dedup_worstcase()
    elif which == "substring":
        main_substring()
    elif which == "bigram-worstcase":
        main_bigram_worstcase()
    elif which == "span-worstcase":
        main_span_worstcase()
    elif which == "dsir-worstcase":
        main_dsir_worstcase()
    elif which == "doremi-worstcase":
        main_doremi_worstcase()
    elif which == "affinity-worstcase":
        main_affinity_worstcase()
    elif which == "image-worstcase":
        main_image_worstcase()
    else:
        main()

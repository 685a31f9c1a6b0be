"""Plan evidence for the round-13 ``_lsh_sweep`` banding reshape.

The final plans of ``dedup_lsh_band_sweep`` / ``_xx`` start at the
``cand`` localCheckpoint, so ``explain_dump`` (final frame only) cannot
show the reshape — the difference lives inside the checkpoint
materialization job. This script dumps the pre-checkpoint plan of the
banded self-join candidate frame in BOTH shapes, over the real
``dedup_lsh_band_sweep`` upstream (md5 MinHash signatures on the
doc_id % 4 = 0 slice at $SPARK_GRAFT_SF_DIR), mirroring
``plans/scale_queries.py:_lsh_sweep`` line for line:

- ``union`` — the pre-reshape shape: one explode per band config,
  three selects over the signature checkpoint unioned, i.e. the
  checkpoint is traversed once per config;
- ``explode`` — the round-13 shape: ONE traversal, every (cfg, bi)
  slice emitted from a single struct-array explode (the shape the
  DuckDB twin's ``sigs CROSS JOIN bands`` already uses).

Usage: python tools/banding_shape_evidence.py <out_dir>
Writes ``lsh_sweep_banding_union.txt`` / ``_explode.txt``.

HONESTY PIN: the banding construction below is a hand copy of
``plans/scale_queries.py::_lsh_sweep`` (the signature/minhash head and
the per-(cfg, bi) struct-explode + banded self-join). The production
function takes a live SparkSession + the full sweep tail, so it cannot
be imported and truncated here; if ``_lsh_sweep``'s banding changes,
UPDATE THIS SCRIPT IN THE SAME COMMIT or the evidence it dumps stops
describing the shipped plan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from clashroyale_datapipeline_agent_spark.operators.dedup import (
        shingles_col,
    )
    from clashroyale_datapipeline_agent_spark.plans.scale_queries import (
        _LSH_CONFIGS,
        _LSH_N_HASHES,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
        spread_if_narrow,
    )

    spark = get_spark("banding_shape_evidence")
    d = spread_if_narrow(load_star_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 4 == 0
    )
    base = (
        d.select("doc_id", shingles_col(F.col("text"), 3).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .localCheckpoint(eager=True)
    )

    def _mh(seed: int):
        return F.array_min(
            F.transform(
                "shingles", lambda s: F.md5(F.concat(s, F.lit(f"#{seed}")))
            )
        )

    minh = F.array(*[_mh(i) for i in range(_LSH_N_HASHES)])
    sigs = base.select("doc_id", "shingles", minh.alias("sig")).localCheckpoint(
        eager=True
    )

    # pre-reshape: one leg per config, unioned
    parts = []
    for cfg, b, r in _LSH_CONFIGS:
        bb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("bi"),
                        F.concat_ws("|", F.slice("sig", bi * r + 1, r)).alias(
                            "bsig"
                        ),
                    )
                    for bi in range(b)
                ]
            )
        ).alias("bb")
        parts.append(
            sigs.select(F.lit(cfg).alias("cfg"), "doc_id", bb).select(
                "cfg", "doc_id", "bb.bi", "bb.bsig"
            )
        )
    union_banded = parts[0]
    for p in parts[1:]:
        union_banded = union_banded.unionByName(p)

    # round-13: one traversal, all (cfg, bi) slices from one explode
    bb_all = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(cfg).alias("cfg"),
                    F.lit(bi).alias("bi"),
                    F.concat_ws("|", F.slice("sig", bi * r + 1, r)).alias(
                        "bsig"
                    ),
                )
                for cfg, b, r in _LSH_CONFIGS
                for bi in range(b)
            ]
        )
    ).alias("bb")
    explode_banded = sigs.select("doc_id", bb_all).select(
        "bb.cfg", "doc_id", "bb.bi", "bb.bsig"
    )

    def _cand(banded):
        x, y = banded.alias("x"), banded.alias("y")
        return (
            x.join(
                y,
                (F.col("x.cfg") == F.col("y.cfg"))
                & (F.col("x.bi") == F.col("y.bi"))
                & (F.col("x.bsig") == F.col("y.bsig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.cfg").alias("cfg"),
                F.col("x.doc_id").alias("id_a"),
                F.col("y.doc_id").alias("id_b"),
            )
            .distinct()
        )

    for name, banded in (("union", union_banded), ("explode", explode_banded)):
        df = _cand(banded)
        path = os.path.join(out_dir, f"lsh_sweep_banding_{name}.txt")
        with open(path, "w") as fh:
            fh.write(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        with open(path) as fh:
            plan = fh.read()
        print(
            f"{name}: ScanRDD={plan.count('Scan ExistingRDD')} "
            f"Generate={plan.count('Generate')} "
            f"Union={plan.count('Union')} "
            f"Exchange={plan.count('Exchange')} -> {path}"
        )


if __name__ == "__main__":
    main()

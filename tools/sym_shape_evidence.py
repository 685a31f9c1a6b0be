"""Plan evidence for the round-13 graph-operator reshape (batch 6).

The final plans of the cc/LPA/triangle queries are UNCHANGED by the
round-13 explode reshape — the difference lives inside the
localCheckpoint materialization job, which ``explain_dump`` (final
frame only) cannot show. This script dumps the pre-checkpoint plan of
the symmetrized edge frame in BOTH shapes, over the real
``graph_connected_components`` upstream (the e1 near-dup pair lineage
at $SPARK_GRAFT_SF_DIR), mirroring ``operators/graph.py`` line for
line:

- ``union`` — the pre-round-13 shape: two selects over ``edges``
  unioned, i.e. the caller's whole pair-pipeline lineage appears (and
  executes) TWICE in the materialization job;
- ``explode`` — the round-13 shape: one pass over ``edges``, both
  orientations from a 2-struct array explode.

Usage: python tools/sym_shape_evidence.py <out_dir>
Writes ``connected_components_sym_union.txt`` / ``_explode.txt``.
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
        lsh_candidate_pairs,
        md5_salted_hash,
    )
    from clashroyale_datapipeline_agent_spark.session import get_spark
    from clashroyale_datapipeline_agent_spark.sources.readers import (
        load_star_table,
        spread_if_narrow,
    )

    spark = get_spark("sym_shape_evidence")
    # the graph_connected_components upstream: near-dup pairs over the
    # deterministic doc slice (plans/text_queries.py)
    d = spread_if_narrow(load_star_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 2 == 0
    )
    edges = lsh_candidate_pairs(
        d, num_hashes=8, bands=4, hash_fn=md5_salted_hash
    )

    src, dst = "id_a", "id_b"
    union_sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    explode_sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    for name, df in (("union", union_sym), ("explode", explode_sym)):
        path = os.path.join(
            out_dir, f"connected_components_sym_{name}.txt"
        )
        with open(path, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        plan = open(path).read()
        print(
            f"{name}: HashAggregate={plan.count('HashAggregate')} "
            f"Exchange={plan.count('Exchange')} "
            f"Scan={plan.count('Scan parquet')} -> {path}"
        )


if __name__ == "__main__":
    main()

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query at sf0.001 (smoke).
- ``queries()`` — named queries per SURVEY.md §2 operator inventory.
- ``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).

Implementations live in ``clashroyale_datapipeline_agent_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clashroyale_datapipeline_agent_spark.plans import star_queries
from clashroyale_datapipeline_agent_spark.plans import text_queries  # noqa: F401  (registers)
from clashroyale_datapipeline_agent_spark.plans import domain_queries  # noqa: F401  (registers)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star_queries.flagship_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return star_queries.queries()


def oracle_sql() -> dict[str, str]:
    return star_queries.oracle_sql()

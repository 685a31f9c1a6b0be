"""Format-generic table I/O (sources/sinks.py:write_table/read_table):
round-trip fidelity per format and the pushdown contract that decides
which formats may back an analytics zone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clashroyale_datapipeline_agent_spark.sources.sinks import (
    TABLE_FORMATS,
    read_table,
    write_table,
)

SCHEMA = "doc_id long, lang string, score double"


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], i / 7.0) for i in range(300)], SCHEMA
    )


@pytest.mark.parametrize("fmt", TABLE_FORMATS)
def test_round_trip_preserves_rows_and_schema(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"t_{fmt}")
    write_table(sample, path, format=fmt)
    back = read_table(spark, path, SCHEMA, format=fmt)
    assert back.schema == sample.schema
    assert sorted(back.collect()) == sorted(sample.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_formats_push_filters_down(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"p_{fmt}")
    write_table(sample, path, format=fmt)
    plan = (
        read_table(spark, path, SCHEMA, format=fmt)
        .filter(F.col("doc_id") > 250)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "GreaterThan(doc_id,250)" in plan


def test_partitioned_write_prunes_across_formats(spark, sample, tmp_path):
    for fmt in ("parquet", "orc"):
        path = str(tmp_path / f"part_{fmt}")
        write_table(sample, path, format=fmt, partition_by=["lang"])
        df = read_table(spark, path, SCHEMA, format=fmt).filter(
            F.col("lang") == "en"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert df.count() == 100


def test_unknown_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(sample, str(tmp_path / "x"), format="avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), SCHEMA, format="avro")


def test_schema_evolution_added_column_backfills_null(spark, tmp_path):
    """A zone written before a column existed must read cleanly under the
    evolved schema: the pinned read schema is the contract, old files
    backfill the new column with NULL (no mergeSchema inference pass)."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    v1.write.mode("append").parquet(path)
    v2 = spark.createDataFrame(
        [(2, "de", 0.9)], "doc_id long, lang string, score double"
    )
    v2.write.mode("append").parquet(path)
    evolved = "doc_id long, lang string, score double"
    rows = {
        r["doc_id"]: r
        for r in read_table(spark, path, evolved, format="parquet").collect()
    }
    assert rows[1]["score"] is None  # pre-evolution file backfills
    assert rows[2]["score"] == 0.9


def test_max_records_per_file_bounds_output_files(spark, sample, tmp_path):
    """Write-path file sizing: maxRecordsPerFile splits a single task's
    output so no downstream scan inherits monolithic files — the knob
    that pairs with maxPartitionBytes on the read side (SCALE.md)."""
    import os

    path = str(tmp_path / "sized")
    sample.repartition(1).write.option("maxRecordsPerFile", 100).parquet(path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 3  # 300 rows / 100 per file

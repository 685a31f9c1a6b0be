"""clashroyale_datapipeline_agent_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark (DataFrame/SQL/Catalyst/Structured Streaming)
engine with the query and data-processing capabilities of the reference
pipeline ``htran174/ClashRoyale-DataPipeline-Agent`` (read-only snapshot at
``/root/reference``), re-expressed Spark-first:

- the reference's row-at-a-time dict/pandas operators become lazy, columnar
  DataFrame expressions (whole-stage codegen, no Python UDFs on hot paths);
- its dict-lookup dimension "joins" become broadcast hash joins;
- its Phase-0 accumulate loop becomes a checkpointed driver loop / Structured
  Streaming ``foreachBatch``;
- beyond parity, the engine adds the large-scale training-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session      SparkSession factory tuned for scale (AQE, partitions).
    schemas      explicit StructTypes for every table (SURVEY.md §1.3).
    sources      readers for the synthetic star schema + domain fixtures.
    functions    scalar/column function library (deck classify, text, vec).
    operators    the reference's operator inventory (SURVEY.md §2) as
                 composable DataFrame -> DataFrame functions.
    plans        end-to-end query pipelines registered with the driver.
    streaming    Structured Streaming variants of the event operators.
    fixtures     deterministic domain fixture generators (battles, players).
"""

__version__ = "0.1.0"

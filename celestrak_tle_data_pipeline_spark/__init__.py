"""celestrak_tle_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic PySpark (DataFrame / Spark SQL / Catalyst /
Structured Streaming) engine with the query and data-processing
capabilities of the reference ETL pipeline
``Souma20/celestrak-tle-data-pipeline`` (see SURVEY.md), extended with
the LLM-data-pipeline operator set (dedup, similarity search, text
analysis, multimodal columns) and designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, tuned shuffle partitions)
- ``schemas``    explicit StructTypes for the warehouse + driver tables
- ``functions``  column-expression bundles (TLE parse, weather flux)
- ``operators``  composed DataFrame operators (assembly, dedup, multimodal)
- ``sources``    readers (TLE text payloads, weather JSON, parquet tables)
- ``sinks``      idempotent check-then-write append sinks
- ``plans``      analytics query layer (star joins, windows, top-k)
- ``streaming``  incremental Structured Streaming path
"""

__version__ = "0.1.0"

"""migdar_data_pipelines_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of
``hasadna/migdar-data-pipelines`` (a dataflows/datapackage-pipelines row-streaming
system) as idiomatic Spark DataFrame / SQL / Structured Streaming, plus
LLM-data-pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.

Layout:
  schema/     Frictionless Table Schema <-> StructType (+ es:* metadata), manifests
  sources/    file / inline / REST connectors (all stamp an ``__ord`` column)
  operators/  the operator library mirroring SURVEY.md §2
  functions/  reusable column-expression helpers (pure pyspark.sql.functions)
  sinks/      parquet/csv+manifest, ES (mapping gen, collate, revision GC), sitemap
  streaming/  Structured Streaming over event feeds (windows, watermark, AvailableNow)
  plans/      the seven reference pipelines re-expressed as DataFrame plans
  llm/        dedup, similarity search, text analysis, multimodal column plumbing
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401

"""flightframe — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine (DataFrame / Spark SQL / Structured
Streaming) with the query and data-processing capabilities of the reference
``dohmandjo/Real-Time-Flight-Data-Pipeline`` (surveyed in ``SURVEY.md``),
re-expressed Spark-first, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
  session       SparkSession factory tuned for local[N] and cluster use
  schemas       all explicit StructTypes (never infer)
  sources/      parquet table loaders, file-replay streaming source, Kafka conf
  functions/    scalar column expressions (timestamp normalization, text, vectors)
  operators/    relational operators (dedup, lookup joins, merge/upsert, similarity)
  plans/        named query builders + DuckDB oracle SQL (the verification catalog)
  streaming/    structured-streaming pipelines (ingest -> warehouse, watermark export)
"""

__version__ = "0.1.0"

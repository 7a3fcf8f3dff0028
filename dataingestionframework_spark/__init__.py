"""dataingestionframework_spark — a PySpark-native analytics/ingestion engine.

Re-expresses the capabilities of the reference configuration-driven
ingestion framework (ShamenParis/DataIngestionFrameWork, studied read-only)
as an idiomatic Apache Spark library:

- typed ``IngestionSpec`` config objects instead of f-string SQL over
  Delta "header/column/job" tables (reference:
  ``modules/validate_configurations.py``, ``modules/insert_config.py``)
- Structured Streaming file sources + ``Trigger.AvailableNow`` instead of
  the proprietary ``cloudFiles`` poll-and-stop loop (reference:
  ``modules/auto_loader_steps.py:85-114,500-528``)
- a parquet-backed ``ManagedTable`` layer with merge/update/delete
  semantics (Delta OSS plugs in where available)
- window functions / conditional aggregation instead of union+group-by
  pivots (reference: ``notebooks/Autoloader_daily_log_report.sql``)
- LLM-data-pipeline extensions designed for 100 TB scale: dedup
  (exact/MinHash-LSH/SimHash), embedding similarity search, multimodal
  binary columns, text analysis.

Everything here is built only on public Apache Spark / PySpark APIs.
"""

__version__ = "0.1.0"

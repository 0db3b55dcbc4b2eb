"""forex_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
the reference pipeline (ydemianenko/forex-data-pipeline: dbt + BigQuery +
GCS forex ETL) as an idiomatic Spark engine, plus the large-scale
training-data operators (dedup, similarity search, multimodal plumbing,
text analysis) the north star requires.

Layout
------
- ``session``    — SparkSession construction / runtime tuning
- ``tables``     — test-table loaders (TPC-H-ish synthetic parquet)
- ``catalog``    — the query registry backing ``__spark_entry__.py``
- ``queries/``   — query definitions (timeseries, relational, llm_ops)
- ``operators/`` — reusable operator implementations (candles, dedup, ...)
- ``functions/`` — column-expression helpers (vector math, text stats)
- ``sources/``   — readers and (incremental-merge) writers
- ``pipeline/``  — the medallion bronze→silver→gold pipeline
- ``streaming/`` — Structured Streaming variants
"""

__version__ = "0.1.0"

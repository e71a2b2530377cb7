"""PySpark-native analytics engine with the query/data-processing
capabilities of the MarketEye ETL reference (SARA-MAGGAG/ETL-marketeye_airflow).

Built from scratch on the public PySpark DataFrame/SQL API — a Spark-first
re-expression, not a port.  Blueprint: SURVEY.md at the repo root.

Layout
------
- ``session``     SparkSession factory tuned for local[N] and cluster use
- ``functions``   pure Column-expression builders (the reference's scalar
                  normalization logic: price/brand/model/condition/rating/
                  spec/id extraction) — no Python UDFs in the hot path
- ``sources``     tolerant JSON readers + parquet table loaders
- ``adapters``    per-source raw→master-schema projections
- ``operators``   merge / stats / anomaly / dedup / similarity / text /
                  multimodal operators as DataFrame transforms
- ``sinks``       json/csv/jdbc/mongo writers (network sinks import-gated)
- ``streaming``   Structured Streaming ingestion (Trigger.AvailableNow)
- ``plans``       plan-inspection helpers (explain / pushdown assertions)
"""

__version__ = "0.1.0"

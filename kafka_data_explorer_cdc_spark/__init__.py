"""PySpark-native analytics engine with the capabilities of the
``abhirockzz/kafka-data-explorer-cdc`` reference pipeline.

The reference (see SURVEY.md) is a CDC demo: Postgres → Debezium →
Kafka → ADX/Kusto, queried with KQL. This package re-expresses that
capability surface Spark-first:

- ``session``   — SparkSession factory with scale-conscious defaults
- ``io``        — declared schemas + parquet loaders for the testdata
- ``cdc``       — Debezium envelope schema, unwrap (SMT), latest-state apply
- ``operators`` — dedup / similarity / text-analysis / multimodal operators
- ``streaming`` — Structured Streaming pipelines (windows, watermark, CDC)
- ``queries``   — the declared query inventory (SURVEY.md §2) + DuckDB oracles
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (freddiemo/data-pipeline-python-aws-cdk).

The reference is a serverless ETL + analytics loop:
REST JSON -> flatten -> Hive-partitioned CSV on S3 -> Glue catalog -> Athena SQL.
This package re-expresses every stage Spark-first (see SURVEY.md):

- ``session``    SparkSession factory with scale-appropriate confs
- ``sources``    ingestion path: REST/JSON source, struct flatten, partitioned sinks
- ``catalog``    schema inference + table registration + partition recovery + drift
- ``operators``  the reference SQL corpus as DataFrame builders, plus the
                 LLM-data-pipeline extension tier (dedup, similarity, text,
                 multimodal)
- ``plans``      query executor harness (query-id, result artifacts, retention)
- ``streaming``  Structured Streaming equivalents (windowed aggs, sessionization)
"""

__version__ = "0.1.0"

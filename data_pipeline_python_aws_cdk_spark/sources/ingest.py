"""Ingest job: enrich + Hive-partitioned write (reference S4-S8).

Mirrors the reference Lambda end to end (reference
lambda_functions/data_extractor.py:14-102): fetch -> flatten -> timestamp
enrichment -> partitioned write -> status dict, including the error contract
(RequestException-ish -> 500 with "Error fetching data", anything else ->
500 generic).

Spark-native choices:
- ``extraction_timestamp`` is an ISO-8601 *string* (reference stores text;
  lexicographic MIN/MAX must stay chronologically correct — SURVEY §2.5(d)).
- partition columns year/month/day are zero-padded *strings* written with
  ``partitionBy`` — the exact `raw-data/year=Y/month=MM/day=DD/` layout the
  reference templates by hand (data_extractor.py:69-70). With
  partitionColumnTypeInference disabled (session.py) they read back as
  strings, so `WHERE year='2025' AND month='09'` prunes directories.
- format is parquet by default (the engine's native columnar format) with a
  CSV fidelity mode matching the reference's at-rest format.

Scale: the write is the only distributed stage; daily small batches create
the reference's small-file problem (SURVEY §4), so ``compact`` is provided
as the maintenance job that rewrites a partition subtree at a target file
count.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .objectstore import configure_s3a, is_object_store_path
from .rest import fetch_users, flatten_users, records_to_df

def enrich(df: DataFrame, now: datetime | None = None) -> DataFrame:
    """Add extraction_timestamp (ISO string) + zero-padded partition columns
    (reference data_extractor.py:56,69-70)."""
    if now is None:
        now = datetime.now(timezone.utc)
    ts = now.strftime("%Y-%m-%dT%H:%M:%S.%f")
    return (
        df.withColumn("extraction_timestamp", F.lit(ts))
        .withColumn("year", F.lit(f"{now.year:04d}"))
        .withColumn("month", F.lit(f"{now.month:02d}"))
        .withColumn("day", F.lit(f"{now.day:02d}"))
    )


def write_partitioned(
    df: DataFrame, root: str, fmt: str = "parquet", mode: str = "append"
) -> None:
    """Hive-layout append write: root/year=YYYY/month=MM/day=DD/part-*.

    ``fmt="csv"`` reproduces the reference's headered-CSV-at-rest; parquet is
    the native format (columnar, pushdown-friendly); ``fmt="orc"`` serves
    Hive/Trino-leaning downstreams with the same columnar properties
    (predicate pushdown, column pruning, splittable stripes) from Spark's
    built-in writer; ``fmt="json"`` emits JSON-lines for log-pipeline
    interop (schemaless readers, kafka-connect-style consumers).
    """
    writer = df.write.mode(mode).partitionBy("year", "month", "day")
    if fmt == "csv":
        writer.option("header", True).csv(root)
    elif fmt == "parquet":
        writer.parquet(root)
    elif fmt == "orc":
        writer.orc(root)
    elif fmt == "json":
        writer.json(root)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def ingest_job(
    spark: SparkSession,
    output_root: str,
    source_url: str | None = None,
    records: list[dict] | None = None,
    fmt: str = "parquet",
    now: datetime | None = None,
) -> dict[str, Any]:
    """End-to-end ingestion (reference lambda_handler, data_extractor.py:14-102).

    ``records`` injects a fixture (tests / offline); otherwise the driver
    fetches ``source_url``. Returns the reference's response contract.
    """
    try:
        if records is None:
            records = fetch_users(source_url) if source_url else fetch_users()
    except Exception as exc:  # noqa: BLE001 — fetch errors -> 500, reference :91-96
        return {"statusCode": 500, "body": f"Error fetching data: {exc}"}
    try:
        if is_object_store_path(output_root):
            # Object-store roots (reference S7 writes to S3) get the s3a
            # connector confs applied at the single entry point; the write
            # itself is URI-agnostic (Hadoop FileSystem resolves the scheme).
            configure_s3a(spark)
        df = flatten_users(records_to_df(spark, records))
        enriched = enrich(df, now=now)
        write_partitioned(enriched, output_root, fmt=fmt)
        n = len(records)
        return {
            "statusCode": 200,
            "records": n,
            "location": output_root,
        }
    except Exception as exc:  # noqa: BLE001 — generic errors -> 500, reference :97-102
        return {"statusCode": 500, "body": f"Error processing data: {exc}"}

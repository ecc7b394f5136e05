"""Ingestion path (reference entry point A).

``rest``    — REST/JSON user source: driver-side fetch, nested schema,
              pure-projection flatten, and a distributed mapInPandas fetch
              pattern for many-endpoint ingestion.
``ingest``  — enrichment + Hive-partitioned CSV/Parquet sinks + the
              end-to-end ingest job with the reference's error contract.
"""

from .ingest import ingest_job, write_partitioned
from .rest import fetch_users, flatten_users, records_to_df, users_schema

__all__ = [
    "fetch_users",
    "flatten_users",
    "records_to_df",
    "users_schema",
    "ingest_job",
    "write_partitioned",
]

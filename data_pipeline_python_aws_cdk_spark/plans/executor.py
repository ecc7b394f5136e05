"""Athena-style query executor harness (reference entry point C).

The reference submits SQL to Athena, polls QUEUED/RUNNING -> SUCCEEDED/
FAILED/CANCELLED, and collects results as ``<execution-id>.csv`` plus a
``.csv.metadata`` sidecar in a results location with a 7-day TTL (reference
test_pipeline.py:144-233, data_pipeline/data_pipeline_stack.py:40-52,152-163).

Spark-native: ``spark.sql`` replaces the Athena black box (parse/optimize/
execute all in-process via Catalyst); this harness reproduces the
*operational* contract around it — query ids, state machine, result
artifacts, retention sweep — because callers of the reference depend on it.

The submit is synchronous (a driver thread pool would make it async; the
state machine is the contract, not the threading), and
``sparkContext.setJobGroup`` tags all Spark jobs with the query id so the
Spark UI groups work per query like Athena's workgroup metrics (reference
data_pipeline_stack.py:160-161).
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from pathlib import Path

from pyspark.sql import SparkSession

RESULT_RETENTION_DAYS = 7  # reference data_pipeline_stack.py:45-51


@dataclass
class QueryStatus:
    query_id: str
    state: str  # QUEUED | RUNNING | SUCCEEDED | FAILED | CANCELLED
    submitted_at: str
    completed_at: str | None = None
    error: str | None = None
    output_location: str | None = None
    row_count: int | None = None
    stats: dict = field(default_factory=dict)


class QueryExecutor:
    def __init__(self, spark: SparkSession, results_root: str):
        self.spark = spark
        self.results_root = Path(results_root)
        self.results_root.mkdir(parents=True, exist_ok=True)
        self._statuses: dict[str, QueryStatus] = {}

    # -- submission (reference start_query_execution) ----------------------

    def submit(self, sql: str) -> str:
        query_id = str(uuid.uuid4())
        status = QueryStatus(
            query_id=query_id,
            state="QUEUED",
            submitted_at=datetime.now(timezone.utc).isoformat(),
        )
        self._statuses[query_id] = status
        self._run(query_id, sql)
        return query_id

    def _run(self, query_id: str, sql: str) -> None:
        status = self._statuses[query_id]
        status.state = "RUNNING"
        out_dir = self.results_root / query_id
        t0 = time.time()
        self.spark.sparkContext.setJobGroup(query_id, sql[:200])
        try:
            df = self.spark.sql(sql)
            n = df.count()
            # Single-file CSV result artifact, like Athena's <id>.csv.
            df.coalesce(1).write.option("header", True).mode("overwrite").csv(
                str(out_dir)
            )
            part = next(out_dir.glob("part-*.csv"))
            final = out_dir / f"{query_id}.csv"
            part.rename(final)
            elapsed = time.time() - t0
            metadata = {
                "query_id": query_id,
                "sql": sql,
                "row_count": n,
                "columns": df.columns,
                "schema": df.schema.jsonValue(),
                "execution_seconds": round(elapsed, 4),
            }
            (out_dir / f"{query_id}.csv.metadata").write_text(json.dumps(metadata))
            status.state = "SUCCEEDED"
            status.output_location = str(final)
            status.row_count = n
            status.stats = {"execution_seconds": round(elapsed, 4)}
        except Exception as exc:  # noqa: BLE001 — FAILED state carries the reason
            status.state = "FAILED"
            status.error = str(exc)
        finally:
            status.completed_at = datetime.now(timezone.utc).isoformat()
            self.spark.sparkContext.setJobGroup("", "")

    # -- polling (reference get_query_execution, test_pipeline.py:161-217) --

    def poll(self, query_id: str) -> QueryStatus:
        if query_id not in self._statuses:
            raise KeyError(f"unknown query id {query_id}")
        return self._statuses[query_id]

    def get_results(self, query_id: str) -> list[dict]:
        """Typed result rows (reference get_query_results parsing,
        test_pipeline.py:173-202): header row + string cells."""
        status = self.poll(query_id)
        if status.state != "SUCCEEDED":
            raise RuntimeError(f"query {query_id} is {status.state}")
        import csv

        with open(status.output_location, newline="") as f:
            return list(csv.DictReader(f))

    # -- retention janitor (reference S11: 7-day results TTL) ---------------

    def cleanup_results(self, retention_days: int = RESULT_RETENTION_DAYS, now: datetime | None = None) -> int:
        """Delete result directories older than the TTL; returns #removed."""
        now = now or datetime.now(timezone.utc)
        cutoff = now - timedelta(days=retention_days)
        removed = 0
        for qid, status in list(self._statuses.items()):
            sub = datetime.fromisoformat(status.submitted_at)
            if sub < cutoff:
                shutil.rmtree(self.results_root / qid, ignore_errors=True)
                del self._statuses[qid]
                removed += 1
        return removed

"""Athena-style query executor harness (reference entry point C).

The reference submits SQL to Athena, polls QUEUED/RUNNING -> SUCCEEDED/
FAILED/CANCELLED, and collects results as ``<execution-id>.csv`` plus a
``.csv.metadata`` sidecar in a results location with a 7-day TTL (reference
test_pipeline.py:144-233, data_pipeline/data_pipeline_stack.py:40-52,152-163).

Spark-native: ``spark.sql`` replaces the Athena black box (parse/optimize/
execute all in-process via Catalyst); this harness reproduces the
*operational* contract around it — query ids, the async state machine,
result artifacts, retention sweep — because callers of the reference depend
on it.

Submission is asynchronous (driver thread pool), so QUEUED and RUNNING are
observable while the query executes, exactly like the reference's polling
loop (test_pipeline.py:161-217). PySpark's pinned-thread mode makes
``setJobGroup`` thread-local, so each worker thread tags its Spark jobs
with the query id (the Spark UI groups work per query like Athena's
workgroup metrics) and ``cancel`` maps to ``cancelJobGroup``.
"""

from __future__ import annotations

import csv
import json
import shutil
import threading
import time
import uuid
from concurrent.futures import Future, ThreadPoolExecutor
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
    def __init__(self, spark: SparkSession, results_root: str, max_workers: int = 4):
        self.spark = spark
        self.results_root = Path(results_root)
        self.results_root.mkdir(parents=True, exist_ok=True)
        self._statuses: dict[str, QueryStatus] = {}
        self._futures: dict[str, Future] = {}
        self._lock = threading.Lock()
        # Concurrent queries share the SparkContext; the scheduler interleaves
        # their jobs (FIFO locally, FAIR on a shared cluster). A small pool
        # mirrors Athena's per-workgroup concurrency limit.
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="query-exec"
        )
        # latest SUCCEEDED execution per exact SQL text, for result reuse
        self._by_sql: dict[str, str] = {}

    # -- submission (reference start_query_execution) ----------------------

    def submit(self, sql: str, reuse_max_age_seconds: float | None = None) -> str:
        """Enqueue ``sql`` and return immediately with a query id.

        The query advances QUEUED -> RUNNING -> SUCCEEDED/FAILED on a pool
        thread; callers poll (reference polling contract) or ``wait``.

        ``reuse_max_age_seconds`` mirrors Athena's result-reuse-by-age
        option: when the SAME SQL text succeeded within the window, the
        new execution completes instantly with its own query id pointing
        at the prior result artifact (``stats["reused_from"]`` names the
        original execution) — zero Spark jobs run. Reuse is per-executor
        (in-memory index) and exact-text, like Athena's.
        """
        if reuse_max_age_seconds is not None:
            with self._lock:
                prior_id = self._by_sql.get(sql)
                prior = self._statuses.get(prior_id) if prior_id else None
            if (
                prior is not None
                and prior.state == "SUCCEEDED"
                and prior.completed_at is not None
                and prior.output_location
                and Path(prior.output_location).exists()
            ):
                age = (
                    datetime.now(timezone.utc)
                    - datetime.fromisoformat(prior.completed_at)
                ).total_seconds()
                if age <= reuse_max_age_seconds:
                    reused_id = str(uuid.uuid4())
                    now = datetime.now(timezone.utc).isoformat()
                    status = QueryStatus(
                        query_id=reused_id,
                        state="SUCCEEDED",
                        submitted_at=now,
                        completed_at=now,
                        output_location=prior.output_location,
                        row_count=prior.row_count,
                        stats={**prior.stats, "reused_from": prior.query_id},
                    )
                    with self._lock:
                        self._statuses[reused_id] = status
                    return reused_id
        query_id = str(uuid.uuid4())
        status = QueryStatus(
            query_id=query_id,
            state="QUEUED",
            submitted_at=datetime.now(timezone.utc).isoformat(),
        )
        with self._lock:
            self._statuses[query_id] = status
            self._futures[query_id] = self._pool.submit(self._run, query_id, sql)
        return query_id

    def _run(self, query_id: str, sql: str) -> None:
        status = self._statuses[query_id]
        with self._lock:
            if status.state == "CANCELLED":  # cancelled while queued
                return
            status.state = "RUNNING"
        out_dir = self.results_root / query_id
        t0 = time.time()
        self.spark.sparkContext.setJobGroup(query_id, sql[:200], interruptOnCancel=True)
        try:
            df = self.spark.sql(sql)
            # Single-file CSV result artifact, like Athena's <id>.csv. One
            # execution only: the row count is recovered from the written
            # artifact instead of a separate df.count() job (which would run
            # the whole query twice).
            df.coalesce(1).write.option("header", True).mode("overwrite").csv(
                str(out_dir)
            )
            part = next(out_dir.glob("part-*.csv"))
            final = out_dir / f"{query_id}.csv"
            part.rename(final)
            n = self._count_csv_rows(final)
            elapsed = time.time() - t0
            # Workgroup-metrics parity (reference data_pipeline_stack.py:
            # 160-161): per-query rows/bytes/stage totals from the app
            # status store, keyed by the job group set above. Best-effort —
            # {} if the store is unreachable.
            from .metrics import query_group_metrics

            metrics = query_group_metrics(self.spark, query_id)
            metadata = {
                "query_id": query_id,
                "sql": sql,
                "submitted_at": status.submitted_at,
                "row_count": n,
                "columns": df.columns,
                "schema": df.schema.jsonValue(),
                "execution_seconds": round(elapsed, 4),
                "metrics": metrics,
            }
            (out_dir / f"{query_id}.csv.metadata").write_text(json.dumps(metadata))
            with self._lock:
                if status.state == "CANCELLED":
                    return
                status.state = "SUCCEEDED"
                status.output_location = str(final)
                status.row_count = n
                status.stats = {
                    "execution_seconds": round(elapsed, 4),
                    "metrics": metrics,
                }
                self._by_sql[sql] = query_id
        except Exception as exc:  # noqa: BLE001 — FAILED state carries the reason
            with self._lock:
                if status.state != "CANCELLED":
                    status.state = "FAILED"
                    status.error = str(exc)
        finally:
            status.completed_at = datetime.now(timezone.utc).isoformat()
            self.spark.sparkContext.setJobGroup("", "")

    @staticmethod
    def _count_csv_rows(path: Path) -> int:
        """Record count of the written artifact (header excluded). csv.reader
        handles quoted embedded newlines, so this is exact, and it reads the
        single driver-local result file — no second Spark execution."""
        with open(path, newline="") as f:
            return max(0, sum(1 for _ in csv.reader(f)) - 1)

    # -- polling (reference get_query_execution, test_pipeline.py:161-217) --

    def poll(self, query_id: str) -> QueryStatus:
        if query_id not in self._statuses:
            raise KeyError(f"unknown query id {query_id}")
        return self._statuses[query_id]

    def wait(self, query_id: str, timeout: float | None = 300) -> QueryStatus:
        """Block until the query reaches a terminal state (helper over the
        polling contract for synchronous callers like the CLI)."""
        fut = self._futures.get(query_id)
        if fut is not None:
            fut.result(timeout=timeout)
        return self.poll(query_id)

    def cancel(self, query_id: str) -> QueryStatus:
        """Best-effort cancel (reference stop_query_execution): a queued
        query never starts; a running one has its Spark job group killed."""
        status = self.poll(query_id)
        with self._lock:
            if status.state in ("QUEUED", "RUNNING"):
                prior = status.state
                status.state = "CANCELLED"
                status.completed_at = datetime.now(timezone.utc).isoformat()
                if prior == "RUNNING":
                    self.spark.sparkContext.cancelJobGroup(query_id)
        return status

    def get_results(self, query_id: str) -> list[dict]:
        """Typed result rows (reference get_query_results parsing,
        test_pipeline.py:173-202): header row + string cells. Waits for a
        terminal state first, mirroring the reference's poll-then-fetch."""
        status = self.wait(query_id)
        if status.state != "SUCCEEDED":
            raise RuntimeError(f"query {query_id} is {status.state}")
        with open(status.output_location, newline="") as f:
            return list(csv.DictReader(f))

    # -- retention janitor (reference S11: 7-day results TTL) ---------------

    def cleanup_results(self, retention_days: int = RESULT_RETENTION_DAYS, now: datetime | None = None) -> int:
        """Delete result directories older than the TTL; returns #removed.

        Sweeps ``results_root`` on disk — NOT the in-memory status dict — so
        a fresh janitor process (the ``jobs.py janitor`` cron shape) removes
        artifacts written by earlier processes. Age comes from the metadata
        sidecar's ``submitted_at``, falling back to directory mtime for
        partial results without a sidecar.
        """
        now = now or datetime.now(timezone.utc)
        cutoff = now - timedelta(days=retention_days)
        removed = 0
        for sub in self.results_root.iterdir():
            if not sub.is_dir():
                continue
            meta_path = sub / f"{sub.name}.csv.metadata"
            submitted: datetime | None = None
            if meta_path.exists():
                try:
                    submitted = datetime.fromisoformat(
                        json.loads(meta_path.read_text()).get("submitted_at", "")
                    )
                except (ValueError, json.JSONDecodeError):
                    submitted = None
            if submitted is None:
                submitted = datetime.fromtimestamp(sub.stat().st_mtime, tz=timezone.utc)
            if submitted < cutoff:
                shutil.rmtree(sub, ignore_errors=True)
                with self._lock:
                    self._statuses.pop(sub.name, None)
                    self._futures.pop(sub.name, None)
                removed += 1
        # Terminal queries that never produced a result directory (FAILED
        # before the write, CANCELLED) have no on-disk artifact for the
        # sweep above to key on — purge them here or a long-lived executor
        # fed failing SQL grows its dicts without bound.
        with self._lock:
            dead = [
                qid
                for qid, st in self._statuses.items()
                if st.state in ("FAILED", "CANCELLED")
                and not (self.results_root / qid).exists()
            ]
            for qid in dead:
                self._statuses.pop(qid, None)
                self._futures.pop(qid, None)
        return removed

    def close(self, wait: bool = True) -> None:
        """Shut the worker pool down; idempotent. Long-lived services should
        call this (or use the executor as a context manager) so non-daemon
        pool threads don't pin interpreter exit."""
        self._pool.shutdown(wait=wait)

    def __enter__(self) -> "QueryExecutor":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()

"""Per-query execution metrics from Spark's application status store.

The reference's Athena workgroup runs with "publish CloudWatch metrics"
enabled (reference data_pipeline/data_pipeline_stack.py:160-161), so every
query execution reports data-scanned / runtime metrics a user can audit.
Spark-native parity: each QueryExecutor submission tags its jobs with the
query id via ``setJobGroup`` (plans/executor.py), and this module reads the
driver's AppStatusStore — the same store the Spark UI renders — to
aggregate that job group's stage metrics after the run. Driver-side
metadata only; no listener callback server, no extra jobs, nothing touches
the executed plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Metric fields emitted per query (all aggregated across the group's
#: stages). Bytes/records come from the stage-level task metric sums.
_FIELDS = (
    "jobs",
    "stages",
    "tasks",
    "input_bytes",
    "input_records",
    "output_bytes",
    "output_records",
    "shuffle_read_bytes",
    "shuffle_write_bytes",
    "executor_run_time_ms",
    "executor_cpu_time_ms",
)


def query_group_metrics(spark: SparkSession, group_id: str) -> dict:
    """Aggregate stage metrics for every Spark job tagged with ``group_id``.

    Returns a dict of the ``_FIELDS`` totals, or ``{}`` if the status store
    is unreachable (metrics are best-effort telemetry — a parity feature
    must never fail the query that produced the data).
    """
    try:
        sc = spark.sparkContext
        job_ids = sc.statusTracker().getJobIdsForGroup(group_id)
        if not job_ids:
            return {}
        store = sc._jsc.sc().statusStore()
        out = dict.fromkeys(_FIELDS, 0)
        out["jobs"] = len(job_ids)
        seen_stages: set[int] = set()
        for jid in job_ids:
            job = store.job(jid)
            sids = job.stageIds()
            for k in range(sids.size()):
                sid = int(sids.apply(k))
                # A stage shared between jobs (reused exchange) must count
                # its bytes once, not once per consuming job.
                if sid in seen_stages:
                    continue
                seen_stages.add(sid)
                try:
                    st = store.lastStageAttempt(sid)
                except Exception:  # noqa: BLE001 — skipped stage: no attempt
                    continue
                out["stages"] += 1
                out["tasks"] += st.numCompleteTasks()
                out["input_bytes"] += st.inputBytes()
                out["input_records"] += st.inputRecords()
                out["output_bytes"] += st.outputBytes()
                out["output_records"] += st.outputRecords()
                out["shuffle_read_bytes"] += st.shuffleReadBytes()
                out["shuffle_write_bytes"] += st.shuffleWriteBytes()
                out["executor_run_time_ms"] += st.executorRunTime()
                # nanoseconds in the store; report ms like runtime
                out["executor_cpu_time_ms"] += st.executorCpuTime() // 1_000_000
        return out
    except Exception:  # noqa: BLE001 — py4j internals; telemetry stays soft
        return {}

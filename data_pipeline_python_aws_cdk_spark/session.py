"""SparkSession factory.

Confs are chosen for the 100 TB design target (AQE on, skew handling on,
partition-type inference off per SURVEY.md §2.5(f)) while remaining correct on
``local[*]`` test runs. The reference delegates all of this to Athena
(reference: data_pipeline/data_pipeline_stack.py:152-163 — workgroup config is
its only "engine tuning" surface); here it is the engine's own session policy.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] / 128 GiB test harness. On a real cluster
# the same builder is used with master/shuffle-partitions overridden by the
# submitter; AQE coalescing makes the shuffle-partition number a ceiling, not
# a commitment, so 2x cores locally and ~2-3x total-cores on a cluster both
# resolve to sensible runtime partition counts.
_DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: runtime re-planning, partition coalescing, skew-join
    # splitting. This is the main lever that keeps static plans honest at
    # 100x the tested data volume.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Hive-style partition columns stay strings (year='2025', month='09');
    # inference would turn them into ints and break zero-padded equality.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # Arrow for every pandas<->Spark crossing (pandas UDFs in the extension
    # tier); row-at-a-time Python UDFs are banned in the hot path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: dimension tables (region/nation/supplier/part at
    # TPC-H shapes, query-vector sets in ANN) should broadcast; fact-fact
    # joins should not. 64 MiB is safe with 128 GiB executors and still
    # conservative for 8-16 GiB cluster executors.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Respect parquet row-group boundaries; 128 MiB split keeps one task per
    # HDFS-ish block at scale and ~32 tasks at sf0.1 locally.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Split-size floor when packing small files. The 4 MiB default leaves a
    # 10 MiB table at 3 tasks on 32 cores; 256 KiB lets small inputs use the
    # full core count (~20% on scan-bound aggs) while at scale the 128 MiB
    # ceiling above still governs split size.
    "spark.sql.files.openCostInBytes": str(256 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Prefer shuffled-hash over sort-merge when the planner's size gate
    # allows a per-partition hash build: skips BOTH sort passes on the
    # fact-fact joins (q3/q7/q18 measure 10-20% faster at sf0.1). This is
    # a size-gated PREFERENCE, not a hint — when neither side's stats fit
    # a local hash map (the 100 TB fact joins) the planner still emits
    # sort-merge, which spills gracefully. Residual risk: the gate is an
    # aggregate estimate, so a hot key can concentrate a passing build
    # side into one partition's in-memory map; AQE's skew-join split
    # (enabled below, and it rewrites shuffled-hash joins too since Spark
    # 3.2) divides exactly that partition before the build, and the
    # salting pattern (segment_revenue_salted) remains the manual
    # fallback for non-splittable cases. Hash builds do NOT spill, so a
    # build side that passes the size gate on bad stats (not skew — bad
    # cardinality/size estimates AQE cannot split) OOMs instead of
    # degrading: SPARK_GRAFT_PREFER_SMJ=true flips a deployment back to
    # sort-merge without a code change (same escape-hatch pattern as
    # SPARK_GRAFT_SHUFFLE).
    "spark.sql.join.preferSortMergeJoin": os.environ.get(
        "SPARK_GRAFT_PREFER_SMJ", "false"
    ),
    # Pre-AQE shuffle parallelism ceiling; AQE coalesces down.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "64"),
    "spark.sql.session.timeZone": "UTC",
    # The events testdata stores TIMESTAMP(NANOS) which Spark's vectorized
    # parquet reader rejects; read the raw int64 and convert in tables.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "data-pipeline-spark-engine",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and bench
    share one entry point; a cluster deployment passes its own master URL or
    relies on spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(_DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

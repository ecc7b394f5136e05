"""Object-store (s3a) readiness for the ingest/result writers (reference S7).

The reference writes its CSV batches straight to S3 via boto3
(reference lambda_functions/data_extractor.py:74-79). The Spark-native
equivalent is NOT an API call — it is (a) URI-addressed datasets
(``s3a://bucket/prefix`` anywhere a local path is accepted: Spark routes
every read/write through the Hadoop FileSystem layer, so the engine's
writers work on object stores without code changes) and (b) a *committer*
that is safe on a store with no atomic rename.

Why the committer matters at 100 TB: the default ``FileOutputCommitter``
commits by renaming ``_temporary/`` output into place. On HDFS a rename is
an O(1) metadata operation; on S3 it is a COPY+DELETE of every byte
(v1: twice — task then job commit) — a 100 TB write would copy 100 TB
again inside the "commit", and a failure mid-rename leaves partial output
visible. The S3A "magic" committer (public Hadoop S3A docs; shipped in
hadoop-aws + spark-hadoop-cloud) commits via S3 multipart-upload
completion instead: tasks write uncommitted multipart parts directly to
the destination and the job commit is one small POST per file — no copy,
no rename, atomic-enough task commit.

Split of responsibility:

- ``S3A_COMMITTER_CONFS``: Spark-level confs that must be set at session
  BUILD time (committer protocol classes are not runtime-settable) and
  require the ``spark-hadoop-cloud`` / ``hadoop-aws`` jars on the
  classpath. Pass to ``session.get_spark(extra_confs=...)`` in a cluster
  deployment.
- ``configure_s3a(spark, ...)``: fs.s3a.* Hadoop confs, runtime-settable
  on a live session (they live in the Hadoop Configuration, not the SQL
  conf). Credentials intentionally default to the provider chain — keys
  never appear in code or configs.

This container has no S3 endpoint or AWS jars, so tests assert the conf
wiring and drive the writers through scheme-qualified ``file://`` URIs —
the same Hadoop FileSystem resolution path an ``s3a://`` URI takes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Session-build-time confs (need spark-hadoop-cloud + hadoop-aws jars).
S3A_COMMITTER_CONFS: dict[str, str] = {
    # Route FileFormatWriter commits through the pluggable PathOutputCommitter.
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    # Parquet insists on a ParquetOutputCommitter subclass; this one binds to
    # whatever committer the factory below resolves.
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    # Resolve s3a:// paths to the S3A committer factory, select "magic".
    "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
        "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    ),
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
}


def s3a_hadoop_confs(
    endpoint: str | None = None,
    path_style_access: bool = False,
) -> dict[str, str]:
    """fs.s3a.* Hadoop confs for high-throughput, credential-chain access.

    ``endpoint``/``path_style_access`` support S3-compatible stores (MinIO,
    on-prem gateways); leave unset for AWS.
    """
    confs = {
        # Credential source: S3A's DEFAULT provider chain (env -> profile ->
        # instance role) — deliberately NOT pinned by class name, because the
        # v1 SDK class (com.amazonaws.auth.DefaultAWSCredentialsProviderChain)
        # breaks on Hadoop 3.4+/SDK v2 while omitting the key yields the
        # same chain on every Hadoop line. Never keys in config.
        #
        # Upload buffering on disk: bounded executor memory no matter how
        # wide the write is; multipart chunks sized so a 128 MiB part-file
        # is 1-2 parts.
        "fs.s3a.fast.upload.buffer": "disk",
        "fs.s3a.multipart.size": str(64 * 1024 * 1024),
        # Connection pool sized for 32 concurrent writer tasks per executor.
        "fs.s3a.connection.maximum": "96",
        "fs.s3a.threads.max": "64",
        # Keeping directory markers avoids O(depth) DELETE storms on every
        # file create (safe: all readers are Hadoop 3.1+).
        "fs.s3a.directory.marker.retention": "keep",
    }
    if endpoint:
        confs["fs.s3a.endpoint"] = endpoint
    if path_style_access:
        confs["fs.s3a.path.style.access"] = "true"
    return confs


def configure_s3a(
    spark: SparkSession,
    endpoint: str | None = None,
    path_style_access: bool = False,
) -> dict[str, str]:
    """Apply the fs.s3a.* confs to a live session's Hadoop configuration.

    Hadoop confs (unlike SQL confs) are runtime-mutable; this is the
    choke point an ingest job calls before writing to an s3a:// root.
    Returns the applied conf dict for logging/assertion.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    confs = s3a_hadoop_confs(endpoint=endpoint, path_style_access=path_style_access)
    for k, v in confs.items():
        hconf.set(k, v)
    return confs


def is_object_store_path(path: str) -> bool:
    """True for URIs the Hadoop S3A/cloud connectors serve."""
    return path.startswith(("s3a://", "s3://", "gs://", "abfs://", "abfss://"))


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through the session's Hadoop
    configuration — the scheme-agnostic way to do driver-side file metadata
    IO (exists/list/small writes) that works identically for local paths,
    hdfs:// and s3a://, where ``os.path``/``open()`` only understand the
    first."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small driver-side text artifact (manifest, metadata sidecar)
    through the Hadoop FileSystem API so any --output scheme the data write
    succeeded on also takes the sidecar. Single-file overwrite semantics."""
    fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text artifact back through the Hadoop FileSystem API."""
    fs, jpath = hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()

"""Completion markers for the persisted-index family.

Every ``*_build_index`` writes its artifact in two-plus steps — the
wholesale partitioned overwrite of the list files, then the sidecars
(``_centroids``/``_codebook``/``_stats``/``_meta``) the probe scores
against.  The overwrite deletes the PREVIOUS build's sidecars first, so a
failure between the two steps leaves lists without codebooks: a torn
artifact that a lenient probe could silently accept (the round-10 advice
finding).  The fix is a ``_SUCCESS``-style completion marker written LAST:

- builds call :func:`clear_index_complete` before touching the artifact
  (so a crash mid-build leaves NO marker) and :func:`mark_index_complete`
  only after every list file and sidecar is on disk;
- probes call :func:`assert_index_complete` first and fail loudly on a
  torn or in-progress artifact instead of degrading to stale or seed
  codebooks.

The marker is a one-row parquet under ``{index_dir}/_complete`` — the
underscore prefix keeps it invisible to readers of the Hive-partitioned
list files, the same sidecar convention the codebooks use, and parquet
(not an empty touch file) keeps the whole artifact readable through the
same Hadoop-FS-agnostic writer the lists use (local FS here, s3a on a
cluster).  Appends reuse the same discipline: clear, mutate the touched
partitions, re-mark.
"""

from __future__ import annotations

INDEX_COMPLETE_SIDECAR = "_complete"


def _marker_path(index_dir: str) -> str:
    return f"{index_dir.rstrip('/')}/{INDEX_COMPLETE_SIDECAR}"


def mark_index_complete(spark, index_dir: str) -> None:
    """Record that every list file and sidecar of the index is on disk.

    Called LAST by every build/append; the value is informational (the
    marker's presence is the contract), but carrying the index kind makes
    the artifact self-describing on inspection.
    """
    spark.createDataFrame([(True,)], "complete boolean").coalesce(1).write.mode(
        "overwrite"
    ).parquet(_marker_path(index_dir))


def clear_index_complete(spark, index_dir: str) -> None:
    """Drop the marker before mutating the artifact, so a crash mid-write
    leaves a loudly-incomplete index rather than a stale marker over torn
    contents.  Uses the JVM Hadoop FileSystem (the same API the writers
    use), so it works on any scheme the session can write to."""
    jvm = spark._jvm
    jsc = spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(_marker_path(index_dir))
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def assert_index_complete(spark, index_dir: str) -> None:
    """Fail fast when probing a torn or in-progress index.

    A missing marker means the last build/append died between its
    overwrite and its final sidecar write — the artifact may be lists
    without the codebooks they were built from, which a probe must never
    silently score against."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(_marker_path(index_dir)).collect()
    except AnalysisException as exc:
        raise ValueError(
            f"index at {index_dir} has no {INDEX_COMPLETE_SIDECAR} marker: "
            "the last build or append did not finish (torn artifact) — "
            "rebuild the index before probing"
        ) from exc

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
    # a completed artifact is by definition no longer torn: drop any
    # append-in-flight breadcrumb (see mark_torn_by_append) so it cannot
    # linger past the mutation it described — e.g. when a torn append is
    # repaired by a REBUILD rather than a resumed re-append
    clear_torn_by_append(spark, index_dir)


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


TORN_BY_APPEND_SIDECAR = "_torn_by_append"


def _breadcrumb_path(index_dir: str) -> str:
    return f"{index_dir.rstrip('/')}/{TORN_BY_APPEND_SIDECAR}"


def mark_torn_by_append(spark, index_dir: str) -> None:
    """Drop the append-in-flight breadcrumb BEFORE the append clears the
    completion marker; :func:`mark_index_complete` removes it again at
    the re-mark — so a marker-less artifact is attributable: with
    the breadcrumb it was torn by an APPEND (whose merge preserves every
    standing-corpus row — safe for a resuming screen to probe), without
    it by a build or compact (lists may be missing — nothing may probe
    it). One-row parquet, same sidecar convention as ``_complete``."""
    spark.createDataFrame([(True,)], "torn_by_append boolean").coalesce(
        1
    ).write.mode("overwrite").parquet(_breadcrumb_path(index_dir))


def clear_torn_by_append(spark, index_dir: str) -> None:
    jvm, jsc = spark._jvm, spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(_breadcrumb_path(index_dir))
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def torn_by_append(spark, index_dir: str) -> bool:
    jvm, jsc = spark._jvm, spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(_breadcrumb_path(index_dir))
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def assert_index_screenable(spark, index_dir: str) -> None:
    """The resume-path gate for the streaming ANN screen: accept a
    COMPLETE artifact or one torn specifically BY AN APPEND (breadcrumb
    present — the merge-only mutation whose torn lists still hold every
    standing-corpus row, the documented replay-recovery case). An
    artifact torn by a crashed BUILD or COMPACT (marker cleared, no
    breadcrumb) may be missing whole lists, so screening it would
    silently mis-verdict against a partial corpus — fail loudly instead
    of letting a blanket resume bypass turn that loud failure into
    silent corruption (the round-12 advice finding)."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(_marker_path(index_dir)).collect()
        return
    except AnalysisException:
        pass
    if not torn_by_append(spark, index_dir):
        raise ValueError(
            f"index at {index_dir} has no {INDEX_COMPLETE_SIDECAR} marker "
            f"and no {TORN_BY_APPEND_SIDECAR} breadcrumb: it was torn by a "
            "build or compact (lists may be missing) — rebuild or re-run "
            "the compaction before screening against it"
        )


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


def index_compact(
    spark,
    index_dir: str,
    target_file_bytes: int | None = None,
    resume: bool = False,
) -> dict:
    """Compact a persisted index's fragmented partitions in place — the
    maintenance pass that keeps the append path's economics honest.

    Fragmentation source: every partitioned write fans a leaf's rows
    across however many tasks hold them — a production-parallelism build
    or append leaves up to min(tasks, |list|) files per written leaf, and
    ``*_append_index``'s dynamic overwrite re-rolls that dice for every
    TOUCHED list on every batch. Probe cost then drifts from O(list
    bytes) toward O(list FILE OPENS), the same small-file decay
    :func:`maintenance.compact` exists to repair on datasets. This is
    that action under the index family's completion-marker discipline:
    assert the artifact is whole, drop the marker, rewrite each
    over-fragmented leaf to ~target-size files (underscore sidecars —
    ``_centroids``/``_codebook``/``_stats``/``_meta`` — are invisible to
    the leaf walk and ride through untouched), re-mark.
    Rows, schema, and the Hive partition layout are preserved exactly, so
    probes are result-equal before and after (pytest-gated); running it
    again on a stable artifact is a no-op.

    ``resume=True`` re-runs a torn compaction (crash mid-rewrite cleared
    the marker): each leaf rewrite preserves that leaf's rows, so
    re-running converges regardless of where the crash landed.

    Returns :class:`maintenance.CompactionStats` as a dict.
    """
    from ..maintenance import DEFAULT_TARGET_FILE_BYTES, compact

    if not resume:
        assert_index_complete(spark, index_dir)
    clear_index_complete(spark, index_dir)
    # Any torn-by-append breadcrumb is now stale: this mutation is a
    # COMPACT, so if it crashes mid-rewrite the artifact may be missing
    # whole lists and must NOT pass assert_index_screenable on the strength
    # of a breadcrumb describing an older append (the round-13 advice
    # finding). Cleared here — not in clear_index_complete — because the
    # append path writes its breadcrumb BEFORE clearing the marker.
    clear_torn_by_append(spark, index_dir)
    stats = compact(
        spark,
        index_dir,
        "parquet",
        target_file_bytes or DEFAULT_TARGET_FILE_BYTES,
    )
    mark_index_complete(spark, index_dir)
    return stats.as_dict()


def index_report(
    spark, index_dir: str, target_file_bytes: int | None = None
) -> dict:
    """Freshness/staleness report over a persisted index artifact: per
    Hive partition, its file count, byte size, row count, and whether
    :func:`index_compact` would rewrite it — plus the artifact-level
    completeness flag and the sidecars present. The operational answer to
    "how fragmented did N appends leave this index, and is it safe to
    probe" without reading codebooks or running a probe.

    Listing is metadata-scale (one entry per leaf via the directory walk)
    and goes through the Hadoop FileSystem API (the writers' path), so an
    object-store index (s3a/abfs) is reportable exactly like a local one;
    row counts come from ONE distributed parquet scan grouped by source
    file directory, never a per-partition job loop.
    """
    import posixpath
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    from ..maintenance import DEFAULT_TARGET_FILE_BYTES, _fs_data_files, _fs_leaf_dirs

    target = target_file_bytes or DEFAULT_TARGET_FILE_BYTES
    root = index_dir.rstrip("/")
    complete = True
    try:
        assert_index_complete(spark, index_dir)
    except ValueError:
        complete = False
    fs, root_path, _jvm = _hadoop_fs(spark, root)
    sidecars = sorted(
        name
        for st in fs.listStatus(root_path)
        for name in [st.getPath().getName()]
        if name.startswith("_") and name != INDEX_COMPLETE_SIDECAR
    )
    # leaf keys are scheme-stripped URI paths — the same normalization the
    # row-count scan's input_file_name URIs reduce to below, so local and
    # object-store leaves key identically
    root_uri = fs.getFileStatus(root_path).getPath().toUri().getPath()
    leaves = {}
    for leaf_path in _fs_leaf_dirs(fs, root_path):
        files = _fs_data_files(fs, leaf_path)
        n_bytes = sum(st.getLen() for st in files)
        leaf_uri = leaf_path.toUri().getPath()
        rel = posixpath.relpath(leaf_uri, root_uri)
        leaves[leaf_uri] = {
            "partition": "" if rel == "." else rel,
            "n_files": len(files),
            "n_bytes": n_bytes,
            "n_rows": 0,
            "needs_compaction": len(files) > max(1, -(-n_bytes // target)),
        }
    # Skip the row-count scan when NO leaf holds a visible data file (a
    # stage-only artifact: the committed _stage of a torn swap is the sole
    # copy) — spark.read.parquet(root) would raise AnalysisException on the
    # empty file set, crashing the freshness report on exactly the torn
    # state it exists to surface (the round-13 advice finding). n_rows
    # stays 0 for stage-only leaves; `complete` is already False.
    if leaves and any(p["n_files"] for p in leaves.values()):
        counts = (
            spark.read.parquet(root)
            .groupBy(
                F.regexp_replace(F.input_file_name(), "/[^/]*$", "").alias("dir")
            )
            .count()
            .collect()
        )
        for r in counts:
            # input_file_name is a URI (percent-encoded — a space in the
            # index path arrives as %20); leaf keys are decoded URI paths,
            # so decode the path component before keying into the map
            key = unquote(urlparse(r.dir).path)
            if key in leaves:
                leaves[key]["n_rows"] = int(r["count"])
    parts = sorted(leaves.values(), key=lambda p: p["partition"])
    return {
        "complete": complete,
        "sidecars": sidecars,
        "partitions": parts,
        "n_partitions": len(parts),
        "total_files": sum(p["n_files"] for p in parts),
        "total_bytes": sum(p["n_bytes"] for p in parts),
        "total_rows": sum(p["n_rows"] for p in parts),
        "fragmented_partitions": sum(p["needs_compaction"] for p in parts),
    }


# --- staged replacement for UNPARTITIONED index artifacts ---------------------
#
# The Hive-partitioned indexes mutate in place safely because dynamic
# partition overwrite touches only the leaves the write produces rows for:
# every other partition's files are never at risk, so a torn write plus the
# completion-marker discipline is recoverable by re-running the same op.
# An UNPARTITIONED artifact (the PQ code table) has no such locality — a
# plain `mode("overwrite")` DELETES the old file set before the new one is
# durable, so a crash mid-write loses the table and no re-run can converge
# (the rows it needed to merge against are gone). The staged protocol below
# makes full-table replacement crash-safe at every point:
#
#   1. write the complete post-op table under ``{index_dir}/_stage``
#      (underscore: invisible to readers of the artifact);
#   2. commit the stage by writing a ``_manifest`` (the staged data-file
#      names) INSIDE it — manifest present == stage complete == the swap
#      may proceed; a crash before this point leaves the old table intact
#      and the half-written stage is discardable garbage;
#   3. swap: delete every top-level data file whose name is NOT in the
#      manifest (the old table), move the staged files up, drop the stage.
#
# A resume re-run calls :func:`finish_staged_table_swap` first: with a
# committed stage it completes the swap idempotently (file names are
# task-UUID-unique, so manifest membership says exactly which top-level
# files are new); with an uncommitted stage it discards it and the old
# table re-merges from scratch. Callers own the completion-marker
# discipline around the whole operation.


_STAGE_DIR = "_stage"
_STAGE_MANIFEST = "_manifest"


def _hadoop_fs(spark, path_str: str):
    jvm, jsc = spark._jvm, spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(jsc.hadoopConfiguration()), path, jvm


def _list_data_files(fs, jvm, dir_path) -> list:
    """Names of data files directly under dir_path (no _/. metadata)."""
    if not fs.exists(dir_path):
        return []
    out = []
    for st in fs.listStatus(dir_path):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append(name)
    return out


def staged_table_replace(
    spark, index_dir: str, df, fmt: str = "parquet",
    options: dict | None = None,
) -> None:
    """Replace an unpartitioned artifact's data files with ``df``'s rows
    via the stage/commit/swap protocol above. ``df`` must not read from
    ``index_dir`` lazily at swap time — stage-writing it first (step 1)
    materializes it before anything is deleted, which is the point.

    ``fmt``/``options`` let non-parquet directories (``maintenance.compact``
    leaves in csv/json/orc) ride the same protocol; the manifest inside the
    stage stays parquet regardless — it never outlives the swap."""
    root = index_dir.rstrip("/")
    stage_str = f"{root}/{_STAGE_DIR}"
    fs, stage, jvm = _hadoop_fs(spark, stage_str)
    if fs.exists(stage):
        # an UNCOMMITTED previous stage is garbage (a committed one was
        # already folded in by the caller's finish_staged_table_swap)
        fs.delete(stage, True)
    writer = df.write.format(fmt).mode("overwrite")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(stage_str)
    names = _list_data_files(fs, jvm, stage)
    spark.createDataFrame(
        [(n,) for n in names], "name string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{stage_str}/{_STAGE_MANIFEST}"
    )
    finish_staged_table_swap(spark, index_dir)


def finish_staged_table_swap(spark, index_dir: str) -> bool:
    """Complete a pending staged replacement; idempotent, the torn-write
    recovery (call under ``resume=True`` before re-merging). Returns True
    when a committed stage was swapped in, False when there was nothing
    pending (no stage, or an uncommitted stage — discarded, old table
    intact)."""
    from pyspark.errors import AnalysisException

    root = index_dir.rstrip("/")
    stage_str = f"{root}/{_STAGE_DIR}"
    fs, stage, jvm = _hadoop_fs(spark, stage_str)
    if not fs.exists(stage):
        return False
    Path = jvm.org.apache.hadoop.fs.Path
    manifest = Path(f"{stage_str}/{_STAGE_MANIFEST}")
    if not fs.exists(manifest):
        # stage never committed: the old table is still whole — discard
        fs.delete(stage, True)
        return False
    try:
        names = {
            r.name
            for r in spark.read.parquet(
                f"{stage_str}/{_STAGE_MANIFEST}"
            ).collect()
        }
    except AnalysisException:
        # the manifest EXISTS but could not be read — an environmental
        # failure, not an uncommitted stage. The stage may be the only
        # complete copy (a prior interrupted swap can already have
        # deleted old-table files), so discarding it here would lose
        # rows. Surface the error and leave everything on disk for a
        # retried finish.
        raise
    root_path = Path(root)
    # old table out (manifest membership identifies the new files exactly:
    # parquet task files carry write-UUID names, never reused)
    for name in _list_data_files(fs, jvm, root_path):
        if name not in names:
            fs.delete(Path(f"{root}/{name}"), False)
    # staged files up (atomic per-file rename; a re-run skips the moved).
    # rename() reports failure by RETURN VALUE, not exception — an
    # unchecked False (quota, permissions, transient object-store error)
    # followed by the stage delete below would drop the un-renamed file
    # while its old-table predecessor is already gone: permanent row loss
    # inside the recovery protocol itself. Treat dest-already-present as
    # success (an idempotent re-run after a crash mid-loop), raise on
    # anything else.
    for name in _list_data_files(fs, jvm, stage):
        if name in names:
            src, dst = Path(f"{stage_str}/{name}"), Path(f"{root}/{name}")
            if not fs.rename(src, dst) and not fs.exists(dst):
                raise IOError(
                    f"staged swap: rename {src} -> {dst} failed; stage "
                    "left intact for a retried finish_staged_table_swap"
                )
    # only drop the stage once every manifest-listed file is durable at
    # root — the stage is the sole complete copy until then
    missing = [n for n in names if not fs.exists(Path(f"{root}/{n}"))]
    if missing:
        raise IOError(
            f"staged swap: {len(missing)} manifest-listed file(s) absent "
            f"at {root} after the move loop (e.g. {missing[0]}); stage "
            "left intact for a retried finish_staged_table_swap"
        )
    fs.delete(stage, True)
    return True


def pending_committed_stage(spark, index_dir: str) -> bool:
    """True when any leaf of the artifact holds a COMMITTED ``_stage``
    (manifest present) — the torn-swap state :func:`finish_staged_table_swap`
    converges idempotently. An uncommitted stage is discardable garbage and
    does not count: the visible table is still whole there."""
    from ..maintenance import _fs_leaf_dirs

    fs, root_path, jvm = _hadoop_fs(spark, index_dir.rstrip("/"))
    Path = jvm.org.apache.hadoop.fs.Path
    for leaf in _fs_leaf_dirs(fs, root_path):
        manifest = Path(f"{leaf.toString()}/{_STAGE_DIR}/{_STAGE_MANIFEST}")
        if fs.exists(manifest):
            return True
    return False


def discard_stale_stages(spark, index_dir: str) -> int:
    """Delete every leaf ``_stage`` dir (committed or not) under the
    artifact. For BUILDS only — a rebuild replaces the whole artifact, so
    any pending stage describes a table that is about to stop existing.

    Why builds must do this (the round-14 advice finding): a committed
    stage left by an older torn compact/append can survive a build, because
    a crashed build's partition overwrite only touches the leaves it wrote.
    ``index_maintain`` attributes "incomplete + any committed stage" to a
    torn SWAP and converges it — folding the pre-rebuild stage into a
    torn-BUILD artifact and marking complete an index missing whole lists,
    which probes then silently accept. Discarding stages at build start
    (the same discipline as :func:`clear_torn_by_append`) makes a pending
    committed stage attributable to the current artifact generation, never
    an older one. Returns the number of stages discarded."""
    from ..maintenance import _fs_leaf_dirs

    fs, root_path, jvm = _hadoop_fs(spark, index_dir.rstrip("/"))
    Path = jvm.org.apache.hadoop.fs.Path
    n = 0
    for leaf in _fs_leaf_dirs(fs, root_path):
        stage = Path(f"{leaf.toString()}/{_STAGE_DIR}")
        if fs.exists(stage):
            fs.delete(stage, True)
            n += 1
    return n


def index_maintain(
    spark, index_dir: str, target_file_bytes: int | None = None,
    resume: bool = False,
) -> dict:
    """Report -> compact-iff-fragmented -> report: the composition a
    scheduler (``jobs index --maintain``) invokes after each append
    window. Compacting a stable artifact would be a harmless no-op, but
    skipping it keeps scheduled maintenance READ-ONLY until there is
    work — no marker churn, no rewrite risk, on the 99% of runs where
    nothing fragmented.

    Torn-swap convergence (the round-13 advice finding): a compact or
    append that crashed mid-staged-swap leaves a COMMITTED ``_stage`` whose
    leaf can show ZERO visible files — so ``fragmented_partitions`` alone
    would skip the very compact that converges it, and a plain
    ``index_compact`` would raise on the cleared marker. When the artifact
    is incomplete AND a committed stage is pending, the compact runs with
    ``resume=True``: each leaf's :func:`finish_staged_table_swap` folds the
    stage in, the rewrite re-marks, and scheduled maintenance converges the
    tear instead of reporting it forever. An incomplete artifact WITHOUT a
    pending stage (torn build — lists may be missing) is left alone and
    surfaces as ``complete: False``; only a rebuild can repair that.

    Returns {compacted, fragmented_before, fragmented_after, total_rows,
    total_files, complete} — ``compacted`` is :func:`index_compact`'s
    stats dict when a rewrite ran, else None.
    """
    before = index_report(spark, index_dir, target_file_bytes)
    torn_swap = not before["complete"] and pending_committed_stage(
        spark, index_dir
    )
    compacted = None
    if before["fragmented_partitions"] > 0 or torn_swap:
        compacted = index_compact(
            spark, index_dir, target_file_bytes, resume=resume or torn_swap
        )
    after = (
        index_report(spark, index_dir, target_file_bytes)
        if compacted
        else before
    )
    return {
        "compacted": compacted,
        "fragmented_before": before["fragmented_partitions"],
        "fragmented_after": after["fragmented_partitions"],
        "total_rows": after["total_rows"],
        "total_files": after["total_files"],
        "complete": after["complete"],
    }

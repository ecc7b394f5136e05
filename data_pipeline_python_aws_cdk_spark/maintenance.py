"""Dataset maintenance: small-file compaction.

The reference accumulates one ~2 KB CSV per ingestion run per day partition
(reference lambda_functions/data_extractor.py:70) and never rewrites them —
the classic small-file anti-pattern (SURVEY.md §4). At 100 TB, scan cost is
dominated by file-open/footer overhead once partitions fragment into
thousands of tiny files; every serious table format ships an OPTIMIZE /
rewriteDataFiles maintenance action for exactly this reason.

``compact`` is that action for the engine's Hive-partitioned datasets:
rewrite each leaf partition whose file count exceeds what its byte size
justifies into ~target-size files, preserving layout, schema, and rows.

Scale notes:

- The per-partition loop is metadata-scale work (one entry per Hive leaf,
  not per row); the rewrites themselves are distributed Spark jobs. The
  directory walk goes through the Hadoop FileSystem API (``_fs_leaf_dirs``),
  so compaction runs against any scheme the session can write — local FS
  here, s3a/abfs on a cluster; partitions can be rewritten concurrently —
  the rewrite of one leaf never depends on another.
- Each leaf rewrite is read -> coalesce(ceil(bytes/target)) -> write to a
  sibling temp dir -> atomic-ish swap. coalesce (not repartition) avoids a
  shuffle: compaction is IO-bound; adding an exchange would double it.
- Leaves at or under one target file, or already at the computed file
  count, are skipped — compaction must be safe to run on a schedule
  (idempotent once stable).
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionStats:
    partitions_seen: int = 0
    partitions_compacted: int = 0
    files_before: int = 0
    files_after: int = 0
    bytes_total: int = 0

    def as_dict(self) -> dict:
        return {
            "partitions_seen": self.partitions_seen,
            "partitions_compacted": self.partitions_compacted,
            "files_before": self.files_before,
            "files_after": self.files_after,
            "bytes_total": self.bytes_total,
        }


def _is_data_file(name: str) -> bool:
    return not name.startswith(("_", ".")) and not name.endswith(".crc")


def _leaf_partitions(root: str) -> list[str]:
    """Directories under ``root`` that hold data files directly (Hive
    leaves); ``root`` itself for unpartitioned datasets. Hidden trees
    (``.versions`` snapshots, ``_temporary`` commit dirs) are pruned — they
    are invisible to readers and must be invisible to maintenance too.

    A directory holding a pending ``_stage`` (a compaction rewrite that
    crashed between its commit and its swap) counts as a leaf even when
    the crash window left it with zero visible data files — otherwise the
    staged rows would be unreachable by the very maintenance pass that
    converges them."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(root):
        has_stage = "_stage" in dirnames
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        if has_stage or any(_is_data_file(f) for f in filenames):
            leaves.append(dirpath)
    return leaves


def _fs_leaf_dirs(fs, root_path) -> list:
    """:func:`_leaf_partitions` over the Hadoop FileSystem API — the walk
    ``compact`` and ``index_report`` use so the index-family maintenance
    ops work on ANY scheme the session can reach (local here, s3a/abfs on
    a cluster), not just the local filesystem. Same leaf rule: a
    directory holding data files directly, or a pending ``_stage``
    (a torn rewrite the next compact must converge). Hidden trees are
    pruned. Returns qualified ``Path`` objects."""
    if not fs.exists(root_path):
        return []
    out = []
    stack = [fs.getFileStatus(root_path).getPath()]
    while stack:
        d = stack.pop()
        files_here = stage_here = False
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if st.isDirectory():
                if name == "_stage":
                    stage_here = True
                elif not name.startswith(("_", ".")):
                    stack.append(st.getPath())
            elif st.isFile() and _is_data_file(name):
                files_here = True
        if files_here or stage_here:
            out.append(d)
    return out


def _fs_data_files(fs, dir_path) -> list:
    """FileStatus of data files directly under dir_path (no _/. names)."""
    return [
        st
        for st in fs.listStatus(dir_path)
        if st.isFile() and _is_data_file(st.getPath().getName())
    ]


def compact(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> CompactionStats:
    """Rewrite fragmented leaf partitions of a dataset into ~target-size
    files. Returns per-run stats; running again on the output is a no-op."""
    from .functions.indexing import (
        _hadoop_fs,
        finish_staged_table_swap,
        staged_table_replace,
    )

    opts = {"header": True} if fmt == "csv" else None
    stats = CompactionStats()
    fs, root_path, _jvm = _hadoop_fs(spark, path)
    for leaf_path in _fs_leaf_dirs(fs, root_path):
        leaf = leaf_path.toString()
        # Converge any rewrite a prior run left torn in this leaf: a
        # committed stage swaps in idempotently, an uncommitted one is
        # discarded (old fragments intact). Only after this is the file
        # listing below the leaf's true current state.
        finish_staged_table_swap(spark, leaf)
        files = _fs_data_files(fs, leaf_path)
        n_bytes = sum(st.getLen() for st in files)
        want = max(1, -(-n_bytes // target_file_bytes))  # ceil
        stats.partitions_seen += 1
        stats.files_before += len(files)
        stats.bytes_total += n_bytes
        if len(files) <= want:
            stats.files_after += len(files)
            continue

        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", True)
        df = reader.load(leaf)

        # Rewrite through the stage/commit/swap protocol (same one the
        # unpartitioned PQ code table uses): the compacted files land
        # durably under {leaf}/_stage with a manifest BEFORE any old
        # fragment is deleted, so a crash at any point either leaves the
        # old fragments whole (uncommitted stage, discarded on re-run) or
        # finishes idempotently from the manifest (committed stage) — the
        # delete-before-move window the old swap shared with Hive's
        # INSERT OVERWRITE is gone.
        staged_table_replace(
            spark, leaf, df.coalesce(int(want)), fmt=fmt, options=opts
        )
        stats.partitions_compacted += 1
        stats.files_after += len(_fs_data_files(fs, leaf_path))
    return stats


VERSIONS_DIR = ".versions"
VERSION_RETENTION_DAYS = 30  # reference data_pipeline_stack.py:30-36


def upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    partition_cols: list[str] | None = None,
    fmt: str = "parquet",
    keep_versions: bool = True,
) -> dict:
    """MERGE-style last-writer-wins upsert into a raw-directory dataset.

    The reference is strictly append-only (SURVEY.md §2.4 — no
    UPDATE/DELETE/MERGE anywhere); re-ingesting a day duplicates it. This
    is the missing idempotent-write primitive: rows with the same
    ``key_cols`` collapse to the highest ``version_col`` winner.

    Execution shape (the part that must survive 100 TB):

    - **Only partitions touched by the updates are rewritten.** The
      update set's distinct partition values prune the base read — a
      day's update to a year of data reads and rewrites one day, not the
      year (classic dynamic-partition-overwrite semantics, done
      explicitly so it works on raw directories).
    - The winner-per-key pass is one window (row_number over key, ordered
      by version desc) — a single shuffle of base∪updates *within the
      affected partitions only*.
    - Without ``partition_cols`` the whole dataset is the one "partition"
      — correct, but a full rewrite; partition your data.

    **Versioned retention** (``keep_versions``, default on): the reference
    bucket keeps noncurrent object versions for 30 days before expiry
    (reference data_pipeline/data_pipeline_stack.py:30-36). Mirroring that,
    every partition this merge replaces is moved — a rename, no data copy —
    into ``<path>/.versions/<utc-stamp>-<runid>/<relative-partition>/``
    instead of being deleted. The dot-prefixed directory is invisible to
    Spark/DuckDB readers, so queries see only current data; a bad merge is
    recoverable by moving the snapshot back until ``vacuum_versions``
    (jobs.py janitor, 30-day default) expires it.

    A table format (Iceberg/Delta) would commit this as a snapshot with
    file-level conflict detection; the raw-directory variant has the same
    overwrite window as Hive's INSERT OVERWRITE (`compact` no longer does:
    its per-leaf rewrite rides the stage/commit/swap protocol).
    """
    from pyspark.sql import Window as W

    partition_cols = partition_cols or []
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    base = reader.load(path)

    if partition_cols:
        parts = [tuple(r) for r in updates.select(*partition_cols).distinct().collect()]
        pred = None
        for vals in parts:
            clause = F.lit(True)
            for c, v in zip(partition_cols, vals):
                if v is None or v == "":
                    # Hive's path layout renders NULL and '' to the same
                    # __HIVE_DEFAULT_PARTITION__ directory (and reading it
                    # back yields NULL), so the prune must treat them as one
                    # partition — a plain equality is never true for NULL
                    # and would silently exclude the base rows whose
                    # directory the swap below then replaces (data loss).
                    clause = clause & (F.col(c).isNull() | (F.col(c) == ""))
                else:
                    clause = clause & F.col(c).eqNullSafe(F.lit(v))
            pred = clause if pred is None else (pred | clause)
        affected_base = base.filter(pred) if pred is not None else base.limit(0)
    else:
        parts = []
        affected_base = base

    merged = affected_base.select(updates.columns).unionByName(updates)
    w = W.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    winners = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from datetime import datetime as _dt
    from datetime import timezone as _tz

    def _retire(replaced: str, rel: str, snapshot_root: list[str | None]) -> None:
        """Move a to-be-replaced partition dir (or file) into the versions
        area instead of deleting it. One snapshot directory per upsert run:
        every partition the run replaces lands under the same stamp."""
        if snapshot_root[0] is None:
            stamp = _dt.now(_tz.utc).strftime("%Y%m%dT%H%M%S")
            snapshot_root[0] = _os.path.join(
                path, VERSIONS_DIR, f"{stamp}-{uuid.uuid4().hex[:8]}"
            )
        dst = _os.path.join(snapshot_root[0], rel)
        _os.makedirs(_os.path.dirname(dst), exist_ok=True)
        _shutil.move(replaced, dst)

    snapshot: list[str | None] = [None]
    tmp = _tempfile.mkdtemp(prefix="upsert-", dir=_os.path.dirname(path.rstrip("/")))
    try:
        writer = winners.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.save(tmp)

        if partition_cols:
            # The tmp output's partition directories are authoritative: Spark
            # renders the paths itself (URL-escaped special chars, NULL as
            # __HIVE_DEFAULT_PARTITION__, its own value formatting), so
            # rebuilding f"{c}={v}" from collected Python values can miss —
            # and a missed partition would silently discard its updates when
            # tmp is cleaned up. Walk what was actually written and swap
            # each leaf in at the same relative path.
            rels = [
                _os.path.relpath(leaf, tmp)
                for leaf in _leaf_partitions(tmp)
            ]
            # The written directories are authoritative; distinct Python
            # tuples can legitimately collapse into fewer directories (NULL
            # and '' both render __HIVE_DEFAULT_PARTITION__), so an exact
            # count match would abort valid merges. The dangerous state is
            # updates that produced NO directories at all.
            if parts and not rels:
                raise RuntimeError(
                    "upsert wrote no partition directories for a non-empty "
                    f"update set spanning {len(parts)} partitions; refusing "
                    "to swap"
                )
            for rel in rels:
                src, dst = _os.path.join(tmp, rel), _os.path.join(path, rel)
                if _os.path.isdir(dst):
                    if keep_versions:
                        _retire(dst, rel, snapshot)
                    else:
                        _shutil.rmtree(dst)
                _os.makedirs(_os.path.dirname(dst), exist_ok=True)
                _shutil.move(src, dst)
            return {
                "mode": "partitioned",
                "partitions_rewritten": len(rels),
                "version_snapshot": snapshot[0],
            }
        for f in _os.listdir(path):
            full = _os.path.join(path, f)
            if _is_data_file(f) and _os.path.isfile(full):
                if keep_versions:
                    _retire(full, f, snapshot)
                else:
                    _os.remove(full)
        for f in _os.listdir(tmp):
            if _is_data_file(f):
                _shutil.move(_os.path.join(tmp, f), _os.path.join(path, f))
        return {
            "mode": "full",
            "partitions_rewritten": 1,
            "version_snapshot": snapshot[0],
        }
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)


def vacuum_versions(
    path: str,
    retention_days: int = VERSION_RETENTION_DAYS,
    now=None,
) -> dict:
    """Expire upsert version snapshots older than the retention window.

    The noncurrent-version lifecycle rule of the reference bucket
    (data_pipeline/data_pipeline_stack.py:30-36: versioned=True, noncurrent
    versions expire after 30 days) as a maintenance action over the
    ``.versions`` area ``upsert`` writes. Snapshot age comes from the
    directory-name stamp (``YYYYMMDDTHHMMSS-<runid>``), falling back to
    mtime for foreign directories. Returns kept/removed counts; removal is
    irreversible — after vacuum, a replaced partition is gone for good,
    before it, `restore` is a directory move.
    """
    from datetime import datetime as _dt
    from datetime import timedelta as _td
    from datetime import timezone as _tz

    root = os.path.join(path, VERSIONS_DIR)
    now = now or _dt.now(_tz.utc)
    cutoff = now - _td(days=retention_days)
    kept = removed = 0
    if not os.path.isdir(root):
        return {"kept": 0, "removed": 0}
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if not os.path.isdir(full):
            continue
        try:
            stamped = _dt.strptime(name.split("-")[0], "%Y%m%dT%H%M%S").replace(
                tzinfo=_tz.utc
            )
        except ValueError:
            stamped = _dt.fromtimestamp(os.stat(full).st_mtime, tz=_tz.utc)
        if stamped < cutoff:
            shutil.rmtree(full, ignore_errors=True)
            removed += 1
        else:
            kept += 1
    return {"kept": kept, "removed": removed}


def list_versions(path: str) -> list[dict]:
    """Enumerate the upsert version snapshots still inside the retention
    window, oldest first: snapshot directory name plus the relative
    partitions (or top-level files) it holds — what an operator inspects
    before deciding which state to restore."""
    root = os.path.join(path, VERSIONS_DIR)
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        snap = os.path.join(root, name)
        if not os.path.isdir(snap):
            continue
        leaves = _leaf_partitions(snap)
        items = sorted(
            os.path.relpath(leaf, snap) for leaf in leaves
        )
        out.append({"snapshot": name, "items": items})
    return out


def restore_version(path: str, snapshot: str) -> dict:
    """Roll back an upsert: move a ``.versions`` snapshot's partitions (or
    full-mode files) back into place — the recovery action the versioned
    retention exists for (reference noncurrent-version semantics:
    data_pipeline/data_pipeline_stack.py:30-36 keeps replaced object
    versions restorable for 30 days).

    The state being displaced is itself retired into a NEW snapshot, so a
    restore is always undoable until vacuum — no destructive step exists
    between an upsert and ``vacuum_versions``. Directory moves only, no
    data copies; partitions absent from the snapshot are untouched.
    """
    from datetime import datetime as _dt
    from datetime import timezone as _tz

    snap = os.path.join(path, VERSIONS_DIR, snapshot)
    if not os.path.isdir(snap):
        raise FileNotFoundError(f"no version snapshot at {snap}")
    undo: list[str | None] = [None]

    def _retire_current(current: str, rel: str) -> None:
        if undo[0] is None:
            stamp = _dt.now(_tz.utc).strftime("%Y%m%dT%H%M%S")
            undo[0] = os.path.join(
                path, VERSIONS_DIR, f"{stamp}-{uuid.uuid4().hex[:8]}"
            )
        dst = os.path.join(undo[0], rel) if rel != "." else undo[0]
        os.makedirs(os.path.dirname(dst) if rel != "." else undo[0], exist_ok=True)
        shutil.move(current, dst)

    leaves = _leaf_partitions(snap)
    rels = sorted(os.path.relpath(leaf, snap) for leaf in leaves)
    if not rels:
        raise ValueError(f"version snapshot {snapshot} holds no data")
    restored = 0
    if rels == ["."]:
        # full-mode snapshot: swap the dataset's top-level data files
        for f in sorted(os.listdir(path)):
            full = os.path.join(path, f)
            if _is_data_file(f) and os.path.isfile(full):
                _retire_current(full, os.path.join(".", f))
        for f in sorted(os.listdir(snap)):
            if _is_data_file(f):
                shutil.move(os.path.join(snap, f), os.path.join(path, f))
                restored += 1
    else:
        for rel in rels:
            current = os.path.join(path, rel)
            if os.path.isdir(current):
                _retire_current(current, rel)
            os.makedirs(os.path.dirname(current), exist_ok=True)
            shutil.move(os.path.join(snap, rel), current)
            restored += 1
    shutil.rmtree(snap, ignore_errors=True)
    return {
        "restored": restored,
        "undo_snapshot": undo[0],
        "mode": "full" if rels == ["."] else "partitioned",
    }


def cluster(
    spark: SparkSession,
    path: str,
    by: list[str],
    out: str,
    files_per_partition: int = 1,
) -> dict:
    """Rewrite a dataset sorted by ``by`` within each output file so parquet
    row-group min/max statistics become selective — the data-layout half of
    predicate pushdown. A pushed filter can only *skip* row groups whose
    stat range excludes it; on unclustered data every row group spans the
    full key range and nothing skips. At 100 TB, clustering hot filter keys
    turns full-table scans into touch-one-file scans.

    ``repartitionByRange`` assigns DISJOINT key ranges to output files via
    sampled boundaries (a hash repartition would scatter overlapping
    ranges across every file and skip nothing) — global range clustering
    without a global sort; ``sortWithinPartitions`` then orders rows so
    row groups inside a file hold narrow sub-ranges. The write is the one
    shuffle; no driver-side data movement.
    """
    df = spark.read.parquet(path)
    (
        df.repartitionByRange(max(1, files_per_partition), *[F.col(c) for c in by])
        .sortWithinPartitions(*by)
        .write.mode("overwrite")
        .parquet(out)
    )
    return {"input": path, "output": out, "clustered_by": by}


def zorder_cluster(
    spark: SparkSession,
    path: str,
    by: list[str],
    out: str,
    files: int = 8,
    bits: int | None = None,
) -> dict:
    """Multi-dimensional clustering: rewrite the dataset ordered by the
    Z-order (Morton) interleave of ``by``, so row-group min/max stats are
    selective on EVERY listed column at once. Lexicographic clustering
    (``cluster``) serves only its leading key — a filter on the second
    column still touches every file; bit-interleaving gives each file a
    hyper-rectangle of the key space instead, the layout Delta/Iceberg
    expose as OPTIMIZE ZORDER BY.

    Shape: one cheap min/max aggregate fixes the per-column scale (2n
    scalars to the driver), the Z-value is a pure column expression
    (scale to ``bits`` bits, interleave — no UDF, codegen fuses it into
    the scan), and ``repartitionByRange`` over that value is the single
    shuffle, exactly like linear clustering. NULLs scale to 0 and sort
    first. ``bits`` defaults to the most that fit 62 bits across the
    dimensions (16 for 2-3 cols) — plenty: resolution beyond
    files x row-groups adds nothing.
    """
    df = spark.read.parquet(path)
    nd = len(by)
    if nd < 2:
        raise ValueError("zorder_cluster needs >= 2 columns; use cluster() for one")
    bits = bits or min(16, 62 // nd)
    aggs = []
    for c in by:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    cap = (1 << bits) - 1
    scaled = []
    for c in by:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        rng = (mx - mn) if (mn is not None and mx is not None) else 0.0
        if not rng:
            scaled.append(F.lit(0).cast("bigint"))
            continue
        s = F.floor(
            (F.col(c).cast("double") - F.lit(mn)) / F.lit(rng) * (cap + 1)
        ).cast("bigint")
        scaled.append(
            F.coalesce(F.least(F.lit(cap), F.greatest(F.lit(0), s)), F.lit(0))
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for d, s in enumerate(scaled):
            z = z + F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * nd + d)
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(max(1, files), "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(out)
    )
    return {"input": path, "output": out, "zorder_by": by, "bits": bits}


def incremental_rollup(
    spark: SparkSession,
    data_path: str,
    rollup_path: str,
    partition_col: str,
    group_cols: list[str],
    sum_col: str,
) -> dict:
    """Materialized-view-style delta refresh: maintain a persisted
    (partition, group) aggregate table by processing ONLY the source
    partitions not yet present in the rollup — the incremental-ETL
    primitive that turns "re-aggregate 100 TB nightly" into "aggregate
    yesterday's partition and append".

    Contract: source partitions are immutable once rolled (the engine's
    append-only daily ingest — reference data_extractor.py:70 — satisfies
    this; an upsert-revised partition should be re-rolled by deleting its
    rollup rows first). Both sides are Hive-partitioned on
    ``partition_col``, so (a) discovering done/new partitions is a
    directory listing, no data scan, and (b) the delta read is a
    partition-pruned scan — Catalyst's PruneFileSourcePartitions keeps
    every already-rolled file unopened. The refresh appends one new
    rollup partition per source partition: idempotent re-runs are no-ops,
    and a crash between partitions resumes where it left off.

    Returns {"partitions_processed": int, "partitions": [values...]}.
    """
    from .sources.objectstore import hadoop_fs

    def _parts(root: str) -> set:
        fs, p = hadoop_fs(spark, root)
        if not fs.exists(p):
            return set()
        out = set()
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(f"{partition_col}="):
                out.add(name.split("=", 1)[1])
        return out

    new = sorted(_parts(data_path) - _parts(rollup_path))
    if not new:
        return {"partitions_processed": 0, "partitions": []}
    delta = spark.read.parquet(data_path).filter(
        F.col(partition_col).isin([*new])
    )
    agg = delta.groupBy(partition_col, *group_cols).agg(
        F.count("*").alias("rows"),
        F.sum(sum_col).alias(f"sum_{sum_col}"),
    )
    agg.write.mode("append").partitionBy(partition_col).parquet(rollup_path)
    return {"partitions_processed": len(new), "partitions": new}


def inspect(path: str) -> dict:
    """Storage-health report for a (possibly Hive-partitioned) parquet
    dataset: file/byte/row-group totals, per-file averages, and the
    small-file fraction — the numbers `compact` and `cluster` decisions
    read. Pure footer metadata (pyarrow), no Spark job, no data pages
    decoded. Like compact's walker, local-filesystem paths (tests /
    single-node); the cluster version lists through the Hadoop FS API.
    """
    import os

    import pyarrow.parquet as pq

    files = rows = row_groups = total_bytes = small = 0
    for root, _dirs, names in os.walk(path):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(root, name)
            size = os.path.getsize(fp)
            md = pq.ParquetFile(fp).metadata
            files += 1
            rows += md.num_rows
            row_groups += md.num_row_groups
            total_bytes += size
            if size < 16 * 1024 * 1024:
                small += 1
    return {
        "path": path,
        "files": files,
        "rows": rows,
        "row_groups": row_groups,
        "total_bytes": total_bytes,
        "avg_file_bytes": total_bytes // files if files else 0,
        "avg_rows_per_row_group": rows // row_groups if row_groups else 0,
        "small_file_fraction": round(small / files, 4) if files else 0.0,
    }

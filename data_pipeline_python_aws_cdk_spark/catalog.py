"""Catalog path (reference entry point B): crawl, register, evolve.

The reference delegates schema management to a Glue crawler (reference
data_pipeline/data_pipeline_stack.py:104-123): scan the partitioned files,
infer types, upsert the table, discover partitions, with drift policy
UPDATE_IN_DATABASE / deleteBehavior=LOG. Spark-native equivalents:

- ``crawl``        inferSchema read -> CREATE DATABASE + saveAsTable (or a
                   path-registered table) + recoverPartitions
- ``introspect``   listTables/listColumns (reference test_pipeline.py:85-103)
- ``diff_schemas`` the drift engine: added columns are applied, removed
                   columns are kept-and-logged — exactly the crawler policy

All metadata ops are driver-side catalog calls; nothing here touches data
paths beyond one schema-inference scan (which samples, not reads, parquet).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

log = logging.getLogger("engine.catalog")

DEFAULT_DB = "data_pipeline_db"
DEFAULT_TABLE = "raw_data"


def crawl(
    spark: SparkSession,
    path: str,
    database: str = DEFAULT_DB,
    table: str = DEFAULT_TABLE,
    fmt: str = "parquet",
) -> str:
    """Infer schema from the partitioned dataset at ``path`` and register
    ``database.table`` over it. Re-running updates the schema (crawler
    upsert semantics) and re-discovers partitions."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    qualified = f"{database}.{table}"
    if "'" in path:
        # LOCATION is a quoted SQL string literal; refuse rather than build
        # a broken (or injectable) statement — especially since a failed
        # re-create after DROP would lose the existing registration.
        raise ValueError(f"dataset path must not contain a single quote: {path!r}")
    # listTables also returns session TEMP VIEWS (empty namespace); matching
    # on bare names would both false-positive here and crash the qualified
    # spark.table() lookup below, so consult the persistent catalog only.
    # deleteBehavior=LOG: a column removed from NEW files must stay
    # queryable as long as old files still carry it. Parquet inference
    # normally reads one footer; merging all footers keeps the union
    # schema — the same retention a Glue crawler provides — both for the
    # drift comparison and for the schema CREATE TABLE stores.
    #
    # The merge toggle runs in a CLONED session (shared SparkContext and
    # persistent catalog, isolated SQLConf): QueryExecutor runs queries
    # concurrently on the caller's session, and flipping the session-global
    # mergeSchema there would silently make an overlapping query pay
    # merge-all-footers cost (or change its inferred schema) mid-flight.
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.mergeSchema", "true")
    if s.catalog.tableExists(qualified):
        old = s.table(qualified).schema
        reader = s.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", True)
        new = reader.load(path).schema
        drift = diff_schemas(old, new)
        same_location = _table_location(s, qualified) == _norm_path(path)
        if same_location and not (
            drift["added"] or drift["removed"] or drift["changed"]
        ):
            # Zero drift over the SAME location: re-registering would
            # only destroy ANALYZE statistics and partition metadata.
            # A crawl that re-points the table at a different path must
            # always re-create, identical schema or not.
            _recover_partitions(s, qualified)
            return qualified
        s.sql(f"DROP TABLE {qualified}")
    opts = "OPTIONS (header 'true', inferSchema 'true')" if fmt == "csv" else ""
    s.sql(
        f"CREATE TABLE {qualified} USING {fmt} {opts} LOCATION '{path}'"
    )
    _recover_partitions(s, qualified)
    return qualified


def _norm_path(p: str) -> str:
    """Scheme-insensitive path normalization ('file:/x', 'file:///x', '/x'
    compare equal; trailing slashes ignored)."""
    for prefix in ("file:///", "file://", "file:"):
        if p.startswith(prefix):
            p = "/" + p[len(prefix):].lstrip("/")
            break
    return p.rstrip("/")


def _table_location(spark: SparkSession, qualified: str) -> str | None:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect()
    loc = next((r.data_type for r in rows if r.col_name == "Location"), None)
    return _norm_path(loc) if loc else None


def _recover_partitions(spark: SparkSession, qualified: str) -> None:
    """MSCK for partitioned layouts; a non-partitioned dataset is a valid
    crawl target and simply has no partitions to recover."""
    from pyspark.errors import AnalysisException

    try:
        spark.catalog.recoverPartitions(qualified)
    except AnalysisException:
        pass


def introspect(spark: SparkSession, database: str = DEFAULT_DB) -> dict[str, list[str]]:
    """Table -> column-name listing (reference get_tables parity,
    test_pipeline.py:85-103,389-391)."""
    out: dict[str, list[str]] = {}
    for t in spark.catalog.listTables(database):
        if t.tableType == "TEMPORARY":
            # listTables(db) also returns session temp views, whose
            # db-qualified name does NOT resolve in listColumns (verified:
            # TABLE_OR_VIEW_NOT_FOUND) — introspection covers the
            # persistent catalog.
            continue
        out[t.name] = [c.name for c in spark.catalog.listColumns(f"{database}.{t.name}")]
    return out


def diff_schemas(old: T.StructType, new: T.StructType) -> dict[str, list[str]]:
    """Crawler drift policy: UPDATE_IN_DATABASE for adds/changes, LOG for
    deletes (reference data_pipeline_stack.py:119-122)."""
    old_fields = {f.name: f.dataType.simpleString() for f in old.fields}
    new_fields = {f.name: f.dataType.simpleString() for f in new.fields}
    added = sorted(set(new_fields) - set(old_fields))
    removed = sorted(set(old_fields) - set(new_fields))
    changed = sorted(
        n for n in set(old_fields) & set(new_fields) if old_fields[n] != new_fields[n]
    )
    for name in removed:
        # deleteBehavior=LOG: never drop, only record.
        log.warning("schema drift: column %r removed upstream (kept, logged)", name)
    for name in added:
        log.info("schema drift: column %r added", name)
    for name in changed:
        log.info("schema drift: column %r type %s -> %s", name, old_fields[name], new_fields[name])
    return {"added": added, "removed": removed, "changed": changed}


def register_view_over(df: DataFrame, name: str) -> None:
    df.createOrReplaceTempView(name)


def analyze_table(
    spark: SparkSession, qualified: str, columns: list[str] | None = None
) -> dict[str, str | None]:
    """Collect table- and column-level statistics into the metastore —
    the ANALYZE step a 100 TB warehouse runs after ingest/compaction so
    Catalyst's cost-based optimizer has real cardinalities: join
    reordering, broadcast decisions past the static size threshold, and
    aggregate estimates all consume these stats (spark.sql.cbo.enabled).

    The reference's crawler records row counts in Glue table properties as
    a side effect of crawling (reference data_pipeline_stack.py:104-123);
    this is the Spark-native equivalent, split from ``crawl`` because at
    scale statistics collection is a scan-bearing job you schedule, not a
    metadata call you make implicitly.
    """
    spark.sql(f"ANALYZE TABLE {qualified} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {qualified} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect()
    stats = next((r.data_type for r in rows if r.col_name == "Statistics"), None)
    return {"table": qualified, "statistics": stats}

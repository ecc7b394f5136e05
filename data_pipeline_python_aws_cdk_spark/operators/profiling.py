"""One-pass column profiling: the statistics a pipeline checks before
trusting a new data drop.

The reference's closest feature is its per-field completeness query
(reference sql/sample_athena_queries.sql:131-163 — three scans UNION ALLed,
one per column). This generalizes that to any column set in ONE scan: all
per-column aggregates land in a single ``agg`` (Catalyst plans one
aggregation with map-side partials; COUNT(DISTINCT x, y, ...) sets expand
the input but never add extra scans), then the 1-row wide result is
unpivoted to the long (column, metric...) shape with ``stack`` — a
projection, not a shuffle.

At 100 TB the difference between this and the reference's shape is a
factor of |columns| in bytes scanned.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column (rows, nulls, distinct, min, max) in a single scan.

    min/max are cast to string so heterogeneous column types stack into one
    result schema — the engine-side mirror of what catalog UIs display.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            # coalesce: SUM over zero rows is NULL, but an empty data drop
            # must profile as 0 nulls (the oracle's COUNT(*)-COUNT(c) does)
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0)).alias(
                f"{c}__nulls"
            ),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    ).orderBy("column")


_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS "column",
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


@_register("documents_profile", oracle=_profile_oracle())
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the documents table's metadata columns in one scan."""
    return profile(load_table(spark, sf_dir, "documents"), _PROFILE_COLS)


_CUSTOMER_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _customer_profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS "column",
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM customer
        """
        for c in _CUSTOMER_COLS
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


@_register("customer_profile", oracle=_customer_profile_oracle())
def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the customer dimension with the same generic one-scan
    profiler as documents_profile — the point of ``profile(df, cols)`` is
    that any table drops in with zero per-table code."""
    return profile(load_table(spark, sf_dir, "customer"), _CUSTOMER_COLS)

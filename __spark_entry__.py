"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``data_pipeline_python_aws_cdk_spark``
package; this module only assembles the registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_python_aws_cdk_spark.operators import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's flagship is "users by city" (reference README.md:137,
    sql/sample_athena_queries.sql:23-29): scan -> filter -> groupBy -> count
    -> orderBy desc.
    """
    return corpus.users_by_city(spark, "/root/testdata/sf0.001")


def _registries() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    q.update(corpus.CORPUS_QUERIES)
    o.update(corpus.CORPUS_ORACLES)
    for extra in _optional_registries():
        q.update(extra[0])
        o.update(extra[1])
    return q, o


def _optional_registries():
    """Extension modules register (queries, oracles) pairs; imported lazily
    so a broken extension never takes down the core corpus."""
    out = []
    modpaths = [
        f"data_pipeline_python_aws_cdk_spark.operators.{m}"
        for m in ("analytics", "text", "dedup", "similarity", "multimodal", "profiling")
    ] + ["data_pipeline_python_aws_cdk_spark.streaming.events"]
    for modpath in modpaths:
        try:
            mod = __import__(modpath, fromlist=["QUERIES", "ORACLES"])
            out.append((getattr(mod, "QUERIES", {}), getattr(mod, "ORACLES", {})))
        except ImportError:
            pass
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each key in ``queries()``.

    Keys present in ``queries()`` but absent here are non-SQL-expressible
    ops (streaming/stateful/approximate); the driver records a weaker
    rows-only check for those.
    """
    return _registries()[1]

"""Bucketed (co-located) fact tables: shuffle-free fact-fact joins.

The reference stores raw CSVs with no clustering (reference
lambda_functions/data_extractor.py:69-70 — layout is date partitions only),
so every Athena join-equivalent would reshuffle. At 100 TB the dominant
cost of the orders x lineitem class of joins IS the shuffle: both sides are
fact-scale, so neither broadcasts, and every query pays a full exchange of
both tables on the join key.

Bucketing pays that shuffle ONCE, at write time: ``bucketBy(n, key)``
hash-partitions rows into a fixed bucket layout recorded in the catalog.
Two tables bucketed on their join key with the same bucket count are
co-located by construction — Catalyst drops both Exchanges from the join,
and any aggregation keyed on the same column reuses the distribution too
(`tests/test_plans.py::test_bucketed_join_is_shuffle_free` pins this).

Scale notes:

- Bucket count is a layout decision frozen at write time: pick
  ``target table size / bucket count ~ one task's worth`` (128-512 MB per
  bucket per partition at cluster scale). 16 here matches the local[32]
  test harness, not a 100 TB deployment (there: thousands).
- ``sortBy(key)`` makes each bucket file key-sorted, letting the
  sort-merge join skip its sort when buckets are single-file.
- The write itself shuffles (that's the point — it's the one prepaid
  exchange); repartitioning by the bucket key first keeps one file per
  bucket per partition instead of one per upstream task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

DEFAULT_BUCKETS = 16


def bucketize_facts(
    spark: SparkSession,
    sf_dir: str,
    location: str,
    n_buckets: int = DEFAULT_BUCKETS,
    suffix: str = "",
) -> tuple[str, str]:
    """Write orders and lineitem as orderkey-bucketed catalog tables.

    Returns the two table names. ``location`` roots the external table
    paths so callers (tests, jobs) control where data lands.
    """
    specs = [
        ("orders", "o_orderkey", f"orders_bucketed{suffix}"),
        ("lineitem", "l_orderkey", f"lineitem_bucketed{suffix}"),
    ]
    names = []
    for table, key, name in specs:
        df = load_table(spark, sf_dir, table)
        (
            df.repartition(n_buckets, F.col(key))
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", f"{location}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    return names[0], names[1]


def colocated_order_lines(
    spark: SparkSession, orders_table: str, lineitem_table: str
) -> DataFrame:
    """Join the bucketed facts and aggregate on the bucket key.

    With both inputs bucketed on orderkey, the plan has NO Exchange: the
    sort-merge join consumes bucket-aligned scans directly, and the
    per-order aggregation inherits the join's hash distribution. This is
    the query shape whose shuffle bucketing exists to delete.
    """
    o = spark.table(orders_table)
    li = spark.table(lineitem_table)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )

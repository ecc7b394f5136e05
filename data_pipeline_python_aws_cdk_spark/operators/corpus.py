"""The reference query corpus, Spark-first.

Every query in the reference's conformance corpus
(reference: sql/sample_athena_queries.sql:1-208, README.md:109-142,
test_pipeline.py:113-132) is re-expressed here as a DataFrame builder over the
driver's synthetic tables (FIXTURES.md maps users-table columns to TPC-H-ish
ones). Builders return lazy DataFrames; all computed columns are aliased to
match the DuckDB oracle SQL kept next to each builder (CORPUS_ORACLES).

Scale notes apply per-builder. The common shape — scan, filter, groupBy, agg,
orderBy — is all Catalyst built-ins: partial (map-side) aggregation, predicate
pushdown into parquet, and whole-stage codegen come for free; the only shuffle
is the single hash-aggregate exchange on the group key, which is the minimum
possible for these semantics.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

CORPUS_QUERIES: dict[str, QueryFn] = {}
CORPUS_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        CORPUS_QUERIES[name] = fn
        if oracle is not None:
            CORPUS_ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# 1. Basic data exploration (reference sql/sample_athena_queries.sql:4-19)
# ---------------------------------------------------------------------------


@_register(
    "count_total",
    oracle="SELECT COUNT(*) AS total_rows FROM lineitem",
)
def count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped COUNT(*) (reference sql:6-7; test_pipeline.py:117).

    Scale: parquet row-group metadata counts — with
    spark.sql.parquet.aggregatePushdown the scan reads footers only.
    """
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("total_rows")
    )


@_register(
    "sample_rows",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer ORDER BY c_custkey LIMIT 10
    """,
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N records (reference sql:10-12, README.md:126).

    The reference's LIMIT has no ORDER BY (row-nondeterministic, SURVEY.md
    §2.5(e)); an explicit key order makes the result testable. Catalyst plans
    TakeOrderedAndProject: per-partition top-N, then a driver-side merge of
    N-row heaps — no full sort, no full shuffle, scales with N not data size.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(10)
    )


@_register(
    "data_freshness",
    oracle="""
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS earliest_data,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_data,
           COUNT(*) AS total_records
    FROM events
    """,
)
def data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX timestamp + COUNT in one pass (reference sql:15-19).

    The reference relies on lexicographic MIN/MAX over ISO-8601 strings
    (SURVEY.md §2.5(d)); here the column is a real timestamp and the string
    rendering happens post-agg. Single partial-agg pass, no shuffle beyond
    the final 1-row reduce; min/max also push down to parquet footers.
    """
    ev = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.agg(
        F.date_format(F.min("ts"), fmt).alias("earliest_data"),
        F.date_format(F.max("ts"), fmt).alias("latest_data"),
        F.count("*").alias("total_records"),
    )


# ---------------------------------------------------------------------------
# 2. Geographic analysis (reference sql:21-40)
# ---------------------------------------------------------------------------


@_register(
    "users_by_city",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS user_count
    FROM customer
    WHERE c_mktsegment IS NOT NULL
    GROUP BY c_mktsegment
    ORDER BY user_count DESC
    """,
)
def users_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: single-key GROUP BY count, desc (reference sql:23-29,
    README.md:137, test_pipeline.py:129). Mapping: address_city ->
    c_mktsegment (FIXTURES.md §B).

    Scale: low-cardinality group key -> partial aggregation collapses each
    map task to ~5 rows before the exchange; shuffle traffic is O(distinct
    keys x tasks), independent of row count.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isNotNull())
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.col("user_count").desc())
    )


@_register(
    "unique_locations",
    oracle="""
    SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
           COUNT(*) AS users_at_location
    FROM customer
    WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY users_at_location DESC
    """,
)
def unique_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY as distinct-combinations finder (reference
    sql:31-40; lat/lng/city -> nationkey/segment). Conjunctive IS NOT NULL
    predicates push down to the parquet scan."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey").isNotNull() & F.col("c_mktsegment").isNotNull())
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("users_at_location"))
        .orderBy(F.col("users_at_location").desc())
    )


# ---------------------------------------------------------------------------
# 3. Contact information analysis (reference sql:42-80)
# ---------------------------------------------------------------------------


@_register(
    "email_domains",
    oracle="""
    SELECT substr(p_type, strpos(p_type, ' ') + 1) AS domain,
           COUNT(*) AS count
    FROM part
    WHERE p_type IS NOT NULL
    GROUP BY substr(p_type, strpos(p_type, ' ') + 1)
    ORDER BY count DESC
    """,
)
def email_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY computed expression: SUBSTR(x, STRPOS(x, sep)+1) (reference
    sql:44-50; '@'-domain -> first-space suffix of p_type). Trino STRPOS ==
    Spark instr (1-based, 0 when absent; SURVEY.md Q27/Q28); two-arg SUBSTR
    runs to end-of-string in both dialects."""
    p = load_table(spark, sf_dir, "part")
    domain = F.expr("substr(p_type, instr(p_type, ' ') + 1)").alias("domain")
    return (
        p.filter(F.col("p_type").isNotNull())
        .groupBy(domain)
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc())
    )


@_register(
    "users_with_websites",
    oracle="""
    SELECT c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IS NOT NULL AND c_mktsegment != ''
    ORDER BY c_name
    """,
)
def users_with_websites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + dual NULL/empty filter + ORDER BY (reference sql:53-60).
    The `IS NOT NULL AND != ''` double-check is the corpus's CSV-era
    defensive idiom (SURVEY.md §2.5(a)) — preserved verbatim."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").isNotNull() & (F.col("c_mktsegment") != ""))
        .select("c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_name")
    )


@_register(
    "phone_patterns",
    oracle="""
    SELECT CASE
             WHEN o_orderpriority LIKE '1-%' THEN 'Urgent Format'
             WHEN o_orderpriority LIKE '2-%' THEN 'High Format'
             WHEN regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$')
               THEN 'Coded Format'
             ELSE 'Other Format'
           END AS priority_format,
           COUNT(*) AS count
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY 1
    ORDER BY count DESC
    """,
)
def phone_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-branch CASE bucketing with LIKE-prefix and anchored-regex predicates
    (reference sql:62-80: phone-format families; REGEXP_LIKE -> rlike). The
    whole CASE is both the projection and the group key, as in the corpus."""
    o = load_table(spark, sf_dir, "orders")
    pr = F.col("o_orderpriority")
    bucket = (
        F.when(pr.like("1-%"), "Urgent Format")
        .when(pr.like("2-%"), "High Format")
        .when(pr.rlike("^[0-9]-[A-Z ]+$"), "Coded Format")
        .otherwise("Other Format")
        .alias("priority_format")
    )
    return (
        o.filter(pr.isNotNull())
        .groupBy(bucket)
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc())
    )


# ---------------------------------------------------------------------------
# 4. Company analysis (reference sql:82-109)
# ---------------------------------------------------------------------------


@_register(
    "company_employees",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS employee_count
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY o_orderpriority
    ORDER BY employee_count DESC
    """,
)
def company_employees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-common-value count (reference sql:84-90: company_name)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("employee_count"))
        .orderBy(F.col("employee_count").desc())
    )


@_register(
    "catchphrase_usage",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS usage_count
    FROM orders
    WHERE o_orderstatus IS NOT NULL
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY usage_count DESC
    """,
)
def catchphrase_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key GROUP BY (reference sql:93-100: catchphrase x company)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isNotNull())
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("usage_count"))
        .orderBy(F.col("usage_count").desc())
    )


@_register(
    "business_types",
    oracle="""
    SELECT p_brand AS brand, COUNT(*) AS count
    FROM part
    WHERE p_brand IS NOT NULL
    GROUP BY p_brand
    ORDER BY count DESC
    """,
)
def business_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-frequency analysis (reference sql:103-109: company_bs)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isNotNull())
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc())
    )


# ---------------------------------------------------------------------------
# 5. Data quality checks (reference sql:111-163)
# ---------------------------------------------------------------------------


@_register(
    "duplicate_emails",
    oracle="""
    SELECT o_custkey AS custkey, COUNT(*) AS count
    FROM orders
    WHERE o_custkey IS NOT NULL
    GROUP BY o_custkey
    HAVING COUNT(*) > 1
    """,
)
def duplicate_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING post-aggregation filter (reference sql:113-119: duplicate
    emails -> customers with repeat orders)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") > 1)
    )


@_register(
    "missing_fields",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing_langs,
      CAST(SUM(CASE WHEN source IS NULL OR source = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing_sources,
      CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing_texts,
      COUNT(*) AS total_records
    FROM documents
    """,
)
def missing_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation SUM(CASE WHEN ...) (reference sql:122-128)."""
    d = load_table(spark, sf_dir, "documents")

    def missing(col: str):
        return F.sum(
            F.when(F.col(col).isNull() | (F.col(col) == ""), 1).otherwise(0)
        )

    return d.agg(
        missing("lang").alias("missing_langs"),
        missing("source").alias("missing_sources"),
        missing("text").alias("missing_texts"),
        F.count("*").alias("total_records"),
    )


_COMPLETENESS_ORACLE_BLOCK = """
    SELECT '{field}' AS field_name,
           COUNT(*) AS total_records,
           CAST(SUM(CASE WHEN {field} IS NOT NULL AND {field} != '' THEN 1 ELSE 0 END)
             AS BIGINT) AS non_null_records,
           ROUND(100.0 * SUM(CASE WHEN {field} IS NOT NULL AND {field} != ''
                             THEN 1 ELSE 0 END) / COUNT(*), 2)
             AS completeness_percentage
    FROM documents
"""


@_register(
    "completeness_by_field",
    oracle=" UNION ALL ".join(
        _COMPLETENESS_ORACLE_BLOCK.format(field=f) for f in ("lang", "source", "text")
    ),
)
def completeness_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of per-field completeness ratios (reference sql:130-163):
    ratio-of-aggregates ROUND(100.0 * SUM(CASE)/COUNT(*), 2), stacked 3-way.

    Scale: the reference scans the table once per UNION branch; each branch
    here is an independent 1-row aggregate so the plan is three parallel
    scans unioned — same shape, and each scan prunes to its single column.
    """
    d = load_table(spark, sf_dir, "documents")

    def branch(field: str) -> DataFrame:
        present = F.sum(
            F.when(F.col(field).isNotNull() & (F.col(field) != ""), 1).otherwise(0)
        )
        return d.agg(
            F.lit(field).alias("field_name"),
            F.count("*").alias("total_records"),
            present.alias("non_null_records"),
            F.round(F.lit(100.0) * present / F.count("*"), 2).alias(
                "completeness_percentage"
            ),
        )

    out = branch("lang")
    for f in ("source", "text"):
        out = out.unionAll(branch(f))
    return out


# ---------------------------------------------------------------------------
# 6. Time-based analysis (reference sql:165-172)
# ---------------------------------------------------------------------------


@_register(
    "extraction_trends",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS extraction_date,
           COUNT(*) AS records_extracted
    FROM events
    GROUP BY 1
    ORDER BY extraction_date DESC
    """,
)
def extraction_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE(ts) truncation + daily counts, newest first (reference
    sql:167-172). Rendered as a string so Spark and the oracle hash
    identically."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("extraction_date")
    return (
        ev.groupBy(day)
        .agg(F.count("*").alias("records_extracted"))
        .orderBy(F.col("extraction_date").desc())
    )


# ---------------------------------------------------------------------------
# 7. Advanced queries (reference sql:174-199)
# ---------------------------------------------------------------------------


@_register(
    "user_profiles",
    oracle="""
    SELECT c_custkey, c_name,
           c_mktsegment || ', nation-' || CAST(c_nationkey AS VARCHAR)
             AS profile,
           c_acctbal
    FROM customer
    WHERE c_name IS NOT NULL
    ORDER BY c_name
    """,
)
def user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCAT-assembled profile projection (reference sql:176-187:
    full_address = CONCAT(street, ', ', city)). Spark's CONCAT (like
    Trino's) is NULL-propagating; DuckDB's concat() function SKIPS NULLs,
    so the oracle spells it with the NULL-propagating || operator — a NULL
    segment yields a NULL profile in both engines."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").isNotNull())
        .select(
            "c_custkey",
            "c_name",
            F.concat(
                F.col("c_mktsegment"),
                F.lit(", nation-"),
                F.col("c_nationkey").cast("string"),
            ).alias("profile"),
            "c_acctbal",
        )
        .orderBy("c_name")
    )


@_register(
    "same_city_diff_company",
    oracle="""
    SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
           COUNT(*) AS user_count,
           string_agg(c_name, ', ' ORDER BY c_name) AS users
    FROM customer
    WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) >= 1
    ORDER BY nationkey, user_count DESC
    """,
)
def same_city_diff_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped string aggregation (reference sql:189-199). The reference
    writes STRING_AGG — not actually a Trino function (SURVEY.md §2.5(b));
    the *intent* is per-group name concatenation, implemented as
    array_join(array_sort(collect_list(...))) so element order is
    deterministic on both engines.

    Scale: collect_list is the one agg here whose state grows with group
    size; acceptable for name-list reporting, but callers grouping by
    high-skew keys should cap with slice() or pre-aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey").isNotNull() & F.col("c_mktsegment").isNotNull())
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("user_count"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ", ").alias("users"),
        )
        .filter(F.col("user_count") >= 1)
        .orderBy(F.col("nationkey"), F.col("user_count").desc())
    )


@_register(
    "partition_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE strftime(o_orderdate, '%Y') = '1995'
      AND strftime(o_orderdate, '%m') = '03'
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-projection-style date filter (reference sql:201-208:
    WHERE year='2025' AND month='09' AND day='14' LIMIT 100, on zero-padded
    string partition columns). On ingest-written datasets the same predicate
    hits real Hive partitions and Catalyst prunes directories
    (tests/test_ingest.py asserts PartitionFilters); here it is expressed on
    the date column of the flat testdata."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.date_format("o_orderdate", "yyyy") == "1995")
            & (F.date_format("o_orderdate", "MM") == "03")
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@_register(
    "top_segments",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS user_count
    FROM customer
    WHERE c_mktsegment IS NOT NULL
    GROUP BY c_mktsegment
    ORDER BY user_count DESC, segment
    LIMIT 3
    """,
)
def top_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after aggregation (reference test_pipeline.py:129: top-3
    cities). Catalyst plans TakeOrderedAndProject over the agg output; the
    secondary key makes ties deterministic."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isNotNull())
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.col("user_count").desc(), F.col("segment"))
        .limit(3)
    )

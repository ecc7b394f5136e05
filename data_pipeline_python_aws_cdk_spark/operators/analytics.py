"""Join / window / sessionization analytics over the TPC-H-shaped testdata.

The reference's own corpus is single-table (SURVEY.md §2.4 — zero JOIN
tokens), but the engine's bench and the 100 TB north star need the full
relational tier: broadcast + shuffle joins, window functions, and
event-stream sessionization. Everything is Catalyst built-ins; the craft is
in join-strategy and shuffle placement, called out per query.

Join-strategy ground rules applied here:
- dimension tables (region/nation/customer at TPC-H ratios) -> ``broadcast``
  hints: no shuffle of the fact side, map-side hash join;
- fact-fact joins (orders x lineitem) shuffle on the join key once, and
  aggregations that follow are keyed on the same column so AQE reuses the
  exchange;
- windows partition by high-cardinality keys (custkey/user_id), so state per
  partition stays small and skew-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import hash60_sql
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


@_register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan of the fact table.

    One pass, partial aggregation to 4-6 groups before the exchange — the
    canonical map-side-combine showcase. The shipdate predicate pushes into
    the parquet scan (min/max row-group skipping).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim ⨝ fact ⨝ fact with selective filters + top-k.

    Fact-first join order: lineitem (the largest scan) is the streaming
    side throughout, so it is never serialized into a broadcast hash-table
    build. customer (filtered to one segment) joins into orders with NO
    explicit broadcast hint — customer scales with the corpus (~2.5 TB at
    the 100 TB letter) and Spark honors user hints unconditionally (AQE
    never demotes them), so a hard hint would OOM at scale. Under
    autoBroadcastJoinThreshold the optimizer still picks a broadcast hash
    join at bench scale from parquet size stats, and AQE degrades to a
    shuffle join when the runtime size exceeds the threshold. The groupBy
    key includes l_orderkey, so the orderkey exchange is reused. Top-k via
    TakeOrderedAndProject.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    joined = li.join(
        o.join(c, F.col("c_custkey") == F.col("o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@_register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join (3 dims + 2 facts) with a co-nation
    constraint.

    Join order is fact-first — lineitem is the STREAMING side and every
    smaller relation hangs off it as a broadcast build. Written dim-first
    (region→nation→…→lineitem), Catalyst keeps the 5-row region chain as
    the streamed side and builds broadcast hash tables over orders AND
    lineitem — the biggest scans serialized into single-threaded hash-map
    builds while 31 cores idle, and an OOM at cluster scale. Fact-first,
    the 600 k-row scan is what parallelizes, probing small maps; the
    orders side auto-broadcasts under the threshold locally and degrades
    to a shuffle join at real scale (AQE re-plans from runtime sizes).
    The supplier co-nation predicate rides the join as a composite key.
    nation/region keep explicit broadcast hints (fixed-size: 25/5 rows at
    any SF); customer and supplier carry NO hint — they scale with the
    corpus and a user hint is honored unconditionally, so the size-based
    threshold must make that call."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@_register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS orders
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, custkey
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-fact join + top-k. At TPC-H ratios customer is ~10x smaller
    than orders; under the broadcast threshold orders never shuffles for
    the join — only the 10-row top-k crosses the wire after partial agg.
    No explicit hint: customer is SF-scaled, so the size-based threshold
    (not an unconditional user hint) decides broadcast vs shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(10)
    )


@_register(
    "window_latest_order",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice AS totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT custkey, orderkey, orderdate, totalprice FROM r WHERE rn = 1
    """,
)
def window_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: latest order per customer (row_number = 1).

    Partitioned by custkey — high cardinality, so window state distributes
    evenly; deterministic tie-break on orderkey.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@_register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate: per-customer running revenue. ROWS frame
    (not RANGE) so duplicate dates accumulate deterministically with the
    orderkey tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    )


SESSION_GAP_MINUTES = 30


@_register(
    "events_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions, COUNT(*) AS events
    FROM g GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 30 min starts a new session (lag window +
    conditional sum). The streaming twin lives in streaming/events.py using
    session_window; this is the replayable batch path.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap: the oracle compares the full interval, and a
    # floor-to-second cast would miss true gaps in (1800s, 1801s) — same
    # precision contract as events_asof_purchase.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("sessions"), F.count("*").alias("events"))
    )


@_register(
    "events_hourly_windows",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (batch form of the streaming
    windowed count in streaming/events.py). date_trunc keys the window so
    the oracle matches the streaming window-start semantics exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@_register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + ungrouped aggregate over the fact.

    The canonical pushdown benchmark: every predicate (date range, discount
    band, quantity cap) must reach the parquet scan as PushedFilters so row
    groups outside the year are never decoded. No shuffle at all — partial
    sums combine map-side into a single scalar row. At 100 TB this is scan
    bandwidth times selectivity, nothing else.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("qualifying_lines"),
        )
    )


@_register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-table join + grouped revenue + top-20.

    Join discipline: the quarter filter cuts orders first (pushed to its
    scan), lineitem keeps only returned lines (also pushed), the o x l
    fact-fact join shuffles once on orderkey, and customer/nation join
    onto the joined fact — nation with an explicit broadcast hint (25 rows
    at any SF), customer WITHOUT one (SF-scaled; the size threshold picks
    broadcast at bench scale, shuffle at 100 TB). The final ORDER BY ...
    LIMIT plans
    TakeOrderedAndProject — no global sort. Deterministic tie-break on
    c_custkey so the top-20 edge is stable across engines.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    o_f = o.filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    l_f = li.filter(F.col("l_returnflag") == "R")
    joined = (
        l_f.join(o_f, l_f.l_orderkey == o_f.o_orderkey)
        .join(c, o_f.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "events_asof_purchase",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts,
           epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
    FROM c ASOF JOIN p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the latest purchase by the same user at
    or before it — an operator Spark has no native join type for.

    Implemented as a single-pass carry-forward instead of a join: union the
    two event kinds, sort per user by (ts, kind) with purchases first on
    ties, and run last(purchase_ts, ignorenulls) over an unbounded-preceding
    frame. One shuffle on user_id, no pair enumeration, no range probe —
    the classic Spark-idiomatic as-of. The DuckDB oracle uses its native
    ASOF JOIN, so two entirely different algorithms must agree row-for-row.

    At 100 TB: the shuffle is one row per click+purchase keyed by user;
    window state is a single carried value per user — O(1) per key. A
    sort-merge range join would touch the same data but with a per-row
    binary search; the carry-forward form is strictly cheaper when the
    probe side ('click') needs ALL rows matched.
    """
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
    )
    # Purchases sort before clicks at identical ts, so "at or before"
    # includes same-instant purchases — matching ASOF's p.ts <= c.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lastp = F.last(
        F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        both.withColumn("last_purchase_ts", lastp)
        .filter((F.col("is_click") == 1) & F.col("last_purchase_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("last_purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "last_purchase_ts"
            ),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_purchase_ts"))).alias(
                "gap_us"
            ),
        )
    )


@_register(
    "events_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS events
    FROM events GROUP BY event_type
    """,
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group: Catalyst rewrites it as a two-phase
    expand+aggregate, so the distinct set is never collected to one node.

    At 100 TB you trade the exact two-phase shuffle for
    approx_count_distinct(user_id, 0.01) — an HLL sketch that cuts the
    shuffle to one fixed-size buffer per (group, partition). Kept exact
    here so the oracle can hash-match; the swap is a one-token change.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("events"),
    )


@_register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                   / SUM(l.l_extendedprice * (1 - l.l_discount)), 4
           ) AS promo_revenue_pct,
           COUNT(*) AS lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-06-01'
      AND l.l_shipdate < TIMESTAMP '1995-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional ratio-of-aggregates over a dim join.

    part joins onto the month-filtered lineitem slice (filter pushed to
    the scan, so only one month of row groups is decoded before the
    join) — UNfiltered part is SF-scaled, so no hard broadcast hint; the
    size threshold decides. The CASE folds into the partial aggregation,
    so the shuffle is two doubles + a count — regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            # try_divide: an all-zero-revenue slice yields NULL like the
            # oracle, not an ANSI DIVIDE_BY_ZERO crash
            F.round(F.try_divide(F.lit(100.0) * F.sum(promo), F.sum(rev)), 4).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("lines"),
        )
    )


@_register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           ROUND(MAX(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (p50/p95/p99 of event value).

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the same
    linear-interpolation definition, so the oracle matches exactly at 6 dp.
    Exact percentile buffers each group's values once — fine per
    event_type; at 100 TB (or high-cardinality groups) the one-token swap
    is ``percentile_approx(value, p, accuracy)``, a fixed-size QDigest
    per group that makes the shuffle O(accuracy), not O(rows).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@_register(
    "events_time_rollup",
    oracle="""
    SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           COALESCE(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),
                    'ALL') AS hour,
           COUNT(*) AS events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day and hour granularities
    plus the grand total in ONE scan via ROLLUP grouping sets.

    Catalyst expands the rollup with Expand (one pass over the input
    produces all three grouping levels before the shuffle), so adding a
    granularity costs an extra partial-agg row per input row — not an
    extra scan. This is the batch form of a timescale-style cagg; at
    100 TB the day/hour outputs are what you'd persist and incrementally
    refresh per ingest batch, partitioned by day.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.select(day.alias("d"), hour.alias("h"), "value")
        .rollup("d", "h")
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.coalesce(F.col("d"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("h"), F.lit("ALL")).alias("hour"),
            "events",
            "total_value",
        )
    )


@_register(
    "events_props_extract",
    oracle="""
    WITH kx AS (
      SELECT event_type,
             CAST(ROUND(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                  AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS events,
           ROUND(AVG(k), 6) AS avg_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM kx
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of a JSON string
    column and aggregate it.

    The reference flattens JSON in Python before storage (its S2/S3
    operators); this is the query-time equivalent for payloads that stay
    nested. ``get_json_object`` evaluates inside codegen with a cached
    JSON path — no UDF; at scale prefer ``from_json`` with an explicit
    schema once the field set stabilizes (one parse, many fields, columnar
    after the projection).
    """
    ev = load_table(spark, sf_dir, "events")
    # Extraction contract (shared with the oracle): try_cast to DOUBLE, so a
    # non-numeric k becomes NULL instead of an ANSI CAST_INVALID_INPUT crash,
    # then ROUND half-away-from-zero to BIGINT (both engines round the same
    # way at this spelling; a direct string->bigint cast truncates in one
    # engine and rounds in the other).
    k = F.round(F.get_json_object("props", "$.k").try_cast("double")).cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


RANGE_JOIN_WINDOW_S = 300  # |error.ts - purchase.ts| <= 5 minutes


@_register(
    "events_range_join",
    oracle=f"""
    WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT ts FROM events WHERE event_type = 'purchase')
    SELECT e.event_id,
           COUNT(*) AS nearby_purchases
    FROM e JOIN p
      ON p.ts >= e.ts - INTERVAL {RANGE_JOIN_WINDOW_S} SECOND
     AND p.ts <= e.ts + INTERVAL {RANGE_JOIN_WINDOW_S} SECOND
    GROUP BY e.event_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): purchases within ±5 min of each error.

    Spark has no range-join optimizer, and a raw theta join on the interval
    plans a nested-loop cartesian. The scalable formulation buckets both
    sides into window-sized time bins and equi-joins on (bin, bin±1) — the
    candidate space shrinks from |errors| x |purchases| to pairs sharing
    adjacent bins (~density x window), and the exact interval predicate
    runs as a post-join filter. The same trick Databricks' range-join hints
    and KDB's window joins apply; bin width = window size guarantees every
    qualifying pair lands in a shared-or-adjacent bin exactly once.

    The DuckDB oracle states the naive theta join (its IEJoin handles it) —
    two different algorithms, one result.
    """
    ev = load_table(spark, sf_dir, "events")
    w = RANGE_JOIN_WINDOW_S
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("ts").alias("e_ts"),
        (F.unix_micros("ts") / F.lit(1_000_000 * w)).cast("bigint").alias("bin"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        (F.unix_micros("ts") / F.lit(1_000_000 * w)).cast("bigint").alias("p_bin"),
    )
    # each error probes its own bin and both neighbors
    probes = err.select(
        "event_id", "e_ts", F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)).alias("p_bin")
    )
    pairs = probes.join(pur, "p_bin").filter(
        (F.col("p_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {w} SECOND"))
        & (F.col("p_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {w} SECOND"))
    )
    return pairs.groupBy("event_id").agg(F.count("*").alias("nearby_purchases"))


@_register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS idle_customers,
           ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                        AND o.o_orderdate < TIMESTAMP '1995-07-01')
      AND c.c_acctbal > 0
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order in 1995 H1, by
    segment — the TPC-H Q22 shape.

    left_anti keeps only the probe side: no orders columns survive the
    join, so nothing from the (large) orders table is projected or
    shuffled beyond its join key. Catalyst plans a broadcast/shuffled hash
    anti join — never a subquery-per-row.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("idle_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("segment")
    )


@_register(
    "suppliers_with_large_lines",
    oracle="""
    SELECT s.s_nationkey AS nationkey, COUNT(*) AS active_suppliers
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 45)
    GROUP BY s.s_nationkey
    ORDER BY nationkey
    """,
)
def suppliers_with_large_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): suppliers with at least one bulk line.

    left_semi deduplicates the build side implicitly — each supplier
    emits once no matter how many qualifying lines exist, and only the
    l_suppkey/l_quantity columns of lineitem are read (pruning visible in
    ReadSchema). The quantity filter pushes to the scan.
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    active = s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
    return (
        active.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("active_suppliers"))
        .orderBy("nationkey")
    )


@_register(
    "events_daily_pivot",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY 1
    """,
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one column per event type.

    The value list is explicit, so the plan is a single hash aggregation
    with conditional counts — no second pass to discover pivot values (an
    extra distinct-collect job when the list is omitted, and a 100 TB
    anti-pattern when the pivot column is unbounded).
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


@_register(
    "orders_status_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def orders_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (status, priority) in one scan.

    Spark expands the cube during partial aggregation, so the fact table is
    read once and each input row contributes to all 2^k grouping sets
    map-side — one shuffle total, vs 4 scans if each rollup level were a
    separate query. Subtotal NULLs are labeled 'ALL' (both columns are
    NULL-free in the data, so COALESCE is unambiguous) to keep the output
    total-orderable for the driver's multiset compare.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@_register(
    "lineitem_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY returnflag, linestatus
    """,
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-flag, per-status, and grand totals in one
    pass — the general form behind ROLLUP/CUBE (`events_time_rollup` is the
    ROLLUP special case).

    Only the requested 3 sets are expanded (not the 2^k cube), so the
    map-side expansion factor is exactly len(sets). Two narrow columns are
    read (ReadSchema pruning); one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@_register(
    "users_click_and_purchase",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
)
def users_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set op): users who both clicked and purchased.

    Catalyst rewrites intersect() into a left-semi join over pre-aggregated
    (distinct) inputs, so each side is deduplicated map-side before the
    single shuffle on user_id — no full cross-side materialization. The
    event_type filters push to the scan and only user_id is read.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys).orderBy("user_id")


@_register(
    "users_click_not_purchase",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND value >= 100
    ORDER BY user_id
    """,
)
def users_click_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set op): users who clicked but never made a big
    (value >= 100) purchase — the set-algebra twin of the
    `customers_without_orders` anti join.

    subtract() is EXCEPT DISTINCT — both sides deduplicate before the
    left-anti join, so multiplicity on either side can't leak through
    (exceptAll would keep a user whose click count exceeds their purchase
    count). One shuffle on user_id; both filters push to the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    big_buys = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") >= 100))
        .select("user_id")
    )
    return clicks.subtract(big_buys).orderBy("user_id")


_SKEW_SALT_N = 8


@_register(
    "segment_revenue_salted",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def segment_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: revenue per market segment.

    Technique demo with byte-identical semantics to the plain join (the
    oracle IS the plain join): the fact side gets a uniform salt derived
    from its row key, the dimension side is exploded SALT_N ways, and the
    join key becomes (custkey, salt). A single hot custkey that would pin
    one reducer now spreads across SALT_N tasks. Cost: the dimension is
    replicated SALT_N x — cheap for true dimensions, and the reason the
    salt factor is a small constant, not partition count.

    At 100 TB this is the manual fallback when AQE's skewedJoin split
    (enabled in the session factory) can't help — e.g. a skewed *build*
    side or a non-splittable downstream aggregation on the same key.
    No broadcast hint on the exploded dimension: salting pays off exactly
    when the join SHUFFLES (a broadcast join has no reducer to skew), and
    customer is SF-scaled — an unconditional hint would OOM at the scale
    where salting matters. At bench scale the optimizer may still choose
    broadcast from size stats; at real scale the salted composite key
    spreads the hot custkey across SALT_N reducers of a shuffle join.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.hash("o_orderkey"), F.lit(_SKEW_SALT_N))
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SKEW_SALT_N)]))
    )
    joined = o.join(
        c,
        (o.o_custkey == c.c_custkey) & (o.salt == c.salt),
        "inner",
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("segment")
    )


@_register(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           ROUND(AVG(gap_s), 2) AS avg_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM (
        SELECT o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT)
                 - CAST(epoch(LAG(o_orderdate) OVER w) AS BIGINT) AS gap_s
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2
    ORDER BY custkey
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: seconds between consecutive orders per customer.

    Partitioned by high-cardinality o_custkey, so window state is a few
    rows per partition and the single shuffle is skew-safe. o_orderkey
    tie-breaks equal order dates to keep LAG deterministic across engines.
    The COUNT >= 2 HAVING drops single-order customers (whose only gap is
    NULL); note COUNT(*) counts rows, not non-NULL gaps, in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.unix_timestamp("o_orderdate") - F.unix_timestamp(
        F.lag("o_orderdate").over(w)
    )
    return (
        o.select(F.col("o_custkey").alias("custkey"), gap.alias("gap_s"))
        .groupBy("custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("gap_s"), 2).alias("avg_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .filter(F.col("n_orders") >= 2)
        .orderBy("custkey")
    )


@_register(
    "customer_spend_quartiles",
    oracle="""
    SELECT quartile, COUNT(*) AS n_customers,
           ROUND(MIN(spend), 2) AS min_spend,
           ROUND(MAX(spend), 2) AS max_spend
    FROM (
        SELECT NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS quartile,
               spend, o_custkey
        FROM (SELECT o_custkey, SUM(o_totalprice) AS spend
              FROM orders GROUP BY o_custkey)
    )
    GROUP BY quartile
    ORDER BY quartile
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE: bucket customers into spend quartiles, then profile each.

    The inner aggregation shrinks the fact table to one row per customer
    BEFORE the unpartitioned NTILE window, so the single-task global sort
    only ever sees |customers| rows — the pattern that keeps global
    windows viable at scale (window over an aggregate, never over raw
    facts). o_custkey tie-breaks equal spends for cross-engine determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    return (
        spend.withColumn("quartile", F.ntile(4).over(w).cast("bigint"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
        .orderBy("quartile")
    )


@_register(
    "events_approx_sketch",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS users_within_eps,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: HyperLogLog distinct users + quantile sketch of
    value, per event type — emitted as deterministic error-bound verdicts.

    approx_count_distinct (HLL++, rsd 2%) and approx_percentile keep
    constant-size state per group instead of the full value set — at 100 TB
    these replace `events_distinct_users` / `events_value_percentiles`
    whenever a ~2% error is acceptable, trading an exact-but-huge shuffle
    of distinct keys for fixed-size mergeable sketches (pure map-side
    combine, tiny exchange).

    Raw sketch estimates are implementation-defined (merge-order sensitive
    for the quantile sketch), so the registered query emits the published
    error bounds as booleans the oracle can assert hard:
    - `users_within_eps`: |HLL - exact| <= 3*rsd*exact (3 sigma of the
      configured 2% relative standard deviation);
    - `p50/p95_within_tol`: a RANK-domain check — the sketch value's rank
      interval [#(< v)+1, #(<= v)] within its group must intersect
      [(q-tol)*n, (q+tol)*n] with tol=1%. approx_percentile always returns
      an actual element with rank error <= n/accuracy = 0.01% << tol, so
      this holds for ANY merge order; unlike a value-domain band between
      interpolated exact percentiles, it cannot be vacuously empty on tiny
      groups (at n=4 the interpolated [p49, p51] interval contains no
      element at all, so any actual element would "fail" a value check).
    The rank counts need the sketch value per row, so the plan re-scans
    events once and broadcast-joins the 5-row aggregate back (null-safe on
    event_type so a NULL group keeps its verdict); the second aggregation
    map-side combines to |event_type| rows. A wrong sketch configuration
    flips a boolean and fails the hash. The error-magnitude test in
    tests/test_extensions.py stays as the tighter local gate;
    `approx_sketch_estimates` (below, rows-only) keeps the raw estimates
    available as an operator output.
    """
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95], 10_000)
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("au"),
        pcts.getItem(0).alias("ap50"),
        pcts.getItem(1).alias("ap95"),
        F.count("value").alias("n"),
    )
    agg = agg.withColumnRenamed("event_type", "g_event_type")
    ranks = (
        ev.select("event_type", "value")
        .join(
            F.broadcast(agg),
            F.col("event_type").eqNullSafe(F.col("g_event_type")),
        )
        .groupBy("g_event_type", "exact_users", "au", "ap50", "ap95", "n")
        .agg(
            F.count(F.when(F.col("value") <= F.col("ap50"), 1)).alias("le50"),
            F.count(F.when(F.col("value") < F.col("ap50"), 1)).alias("lt50"),
            F.count(F.when(F.col("value") <= F.col("ap95"), 1)).alias("le95"),
            F.count(F.when(F.col("value") < F.col("ap95"), 1)).alias("lt95"),
        )
    )

    def rank_ok(le, lt, q):
        tol = 0.01
        lo = F.floor((q - tol) * F.col("n"))
        hi = F.ceil((q + tol) * F.col("n"))
        return F.when(F.col("n") == 0, F.lit(True)).otherwise(
            (F.col(le) >= lo) & (F.col(lt) <= hi)
        )

    return ranks.select(
        F.col("g_event_type").alias("event_type"),
        "exact_users",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        ).alias("users_within_eps"),
        rank_ok("le50", "lt50", 0.5).alias("p50_within_tol"),
        rank_ok("le95", "lt95", 0.95).alias("p95_within_tol"),
    ).orderBy("event_type")


@_register("approx_sketch_estimates")
def approx_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates (HLL users + approx p50/p95 of value) per event
    type — the production operator surface behind `events_approx_sketch`.

    Deliberately no SQL oracle: the estimates themselves are
    implementation-defined; their error bounds are driver-verified via
    `events_approx_sketch` and magnitude-tested in tests/test_extensions.py.
    """
    ev = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95], 10_000)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            pcts.getItem(0).alias("p50_value"),
            pcts.getItem(1).alias("p95_value"),
        )
        .orderBy("event_type")
    )


@_register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           o.o_orderkey AS orderkey,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(q.qty, 2) AS qty
    FROM orders o
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 200) q ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customers — the aggregate-then-join pattern.

    The IN-subquery of the official Q18 is decorrelated into an inner join
    against the pre-aggregated (orderkey, qty) table: the lineitem
    aggregation reduces the fact table BEFORE any join (map-side combine,
    then one shuffle on orderkey that the orders join reuses); customer
    joins without a hard hint (SF-scaled — size threshold decides, not an
    unconditional user hint). Joining — not semi-joining — keeps the qty
    column without a second pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
    )
    return (
        o.join(q, o.o_orderkey == q.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("qty"),
        )
        .orderBy(F.col("totalprice").desc(), "orderkey")
    )


@_register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 2, 3, 4)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, brand, size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group with
    negated + IN predicates (lineitem stands in for partsupp — the
    testdata has no partsupp table).

    Both part predicates push to the broadcast build side before the join,
    so the fact scan only carries (l_partkey, l_suppkey) and the
    COUNT(DISTINCT) expansion happens after the dimension filter has cut
    the rows. IN-list and <> become scan-level filters (visible in
    PushedFilters).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4))
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "size")
    )


@_register(
    "events_conversion_funnel",
    oracle="""
    WITH fc AS (
      SELECT user_id, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
      SELECT fc.user_id,
             MIN(e.ts) AS first_purchase
      FROM fc LEFT JOIN events e
        ON e.user_id = fc.user_id
       AND e.event_type = 'purchase' AND e.ts >= fc.first_click
      GROUP BY fc.user_id
    )
    SELECT COUNT(*) AS clicked_users,
           COUNT(first_purchase) AS converted_users,
           ROUND(AVG(CAST(FLOOR(epoch(first_purchase)) AS BIGINT)
                     - CAST(FLOOR(epoch(fc.first_click)) AS BIGINT)), 2) AS avg_conversion_s
    FROM fc JOIN conv USING (user_id)
    """,
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: of users who clicked, how many later purchased,
    and how long the first click->first purchase took on average.

    Two keyed aggregations on user_id back to back — AQE reuses the
    exchange, so the funnel costs one shuffle of the (already filtered)
    click/purchase rows. The purchase side left-joins on the SAME key with
    a time residual, keeping non-converters in the denominator. At 100 TB
    the events scan prunes to two event types and three columns.
    """
    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        fc.join(
            buys,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") >= F.col("first_click")),
            "left",
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return conv.agg(
        F.count("*").alias("clicked_users"),
        F.count("first_purchase").alias("converted_users"),
        F.round(
            F.avg(
                F.unix_timestamp("first_purchase") - F.unix_timestamp("first_click")
            ),
            2,
        ).alias("avg_conversion_s"),
    )


@_register(
    "orders_revenue_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           ROUND(revenue, 2) AS revenue,
           ROUND(AVG(revenue) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS revenue_7d_avg
    FROM daily
    ORDER BY day
    """,
)
def orders_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue — the sliding-frame window.

    Same discipline as `customer_spend_quartiles`: aggregate the fact
    table down to one row per day FIRST (map-side combine, one shuffle),
    then run the unpartitioned sliding frame over |days| rows only. The
    ROWS frame is O(1) per row (running sum, not re-scan); a global
    window directly over raw orders would serialize the whole fact table
    through one task.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("rev", 2).alias("revenue"),
            F.round(F.avg("rev").over(w), 2).alias("revenue_7d_avg"),
        )
        .orderBy("day")
    )


@_register(
    "cheapest_line_per_part",
    oracle="""
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           ROUND(l_extendedprice, 2) AS price
    FROM (
      SELECT l_partkey, l_suppkey, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice, l_suppkey) AS rk
      FROM lineitem
    )
    WHERE rk = 1
    ORDER BY partkey
    """,
)
def cheapest_line_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-per-group with the winning row's attributes — the TPC-H Q2
    correlated-subquery shape (price = MIN(price) per part), decorrelated
    into one ranking window.

    The correlated form would re-scan per outer row; the window form is a
    single shuffle on l_partkey (high-cardinality, skew-safe) with O(1)
    state per group. l_suppkey tie-breaks equal prices so the winner is
    deterministic across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy("l_extendedprice", "l_suppkey")
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.round("l_extendedprice", 2).alias("price"),
        )
        .orderBy("partkey")
    )


@_register(
    "events_hourly_gapfill",
    oracle="""
    WITH day AS (
      SELECT user_id, date_trunc('hour', ts) AS hr
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
    ),
    bounds AS (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi FROM day
               GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
             FROM bounds),
    cnt AS (SELECT user_id, hr, COUNT(*) AS n FROM day GROUP BY user_id, hr)
    SELECT g.user_id, strftime(g.hr, '%Y-%m-%d %H:00') AS hour,
           COALESCE(c.n, 0) AS n_events
    FROM grid g
    LEFT JOIN cnt c ON g.user_id = c.user_id AND g.hr = c.hr
    ORDER BY g.user_id, hour
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per-user dense hourly grid with zero-filled
    counts — the resample/asfreq operator relational engines lack natively,
    built from sequence + explode + outer join.

    The grid derives from each user's own [min, max] hour (no global-span
    cartesian): bounds is a per-user aggregate, the hour series explodes
    map-side from one row per user, and the left join runs on the same
    (user_id, hr) key the count aggregation just shuffled on. Output is
    users x active-hours — never rows x hours. The one-day slice predicate
    pushes to the scan.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
        )
        .select("user_id", F.date_trunc("hour", "ts").alias("hr"))
    )
    bounds = ev.groupBy("user_id").agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hr"),
    )
    cnt = (
        ev.groupBy("user_id", "hr")
        .agg(F.count("*").alias("n"))
        .withColumnsRenamed({"user_id": "c_user", "hr": "c_hr"})
    )
    return (
        grid.join(
            cnt,
            (F.col("user_id") == F.col("c_user")) & (F.col("hr") == F.col("c_hr")),
            "left",
        )
        .select(
            "user_id",
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
        )
        .orderBy("user_id", "hour")
    )


@_register(
    "events_cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    marked AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM activity
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
           COUNT(DISTINCT user_id) AS active_users
    FROM marked
    WHERE date_diff('day', cohort_day, day) <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    on each subsequent day-offset (the product-analytics staple).

    Single-shuffle formulation: the naive plan joins a per-user MIN(day)
    aggregate back onto activity (two shuffles + a user-cardinality join);
    here the cohort day comes from a window MIN over the (user_id, day)
    distinct set, so the user_id exchange that dedup already required is
    the ONLY corpus shuffle and the retention rollup aggregates
    cohort x offset keys (tiny). The offset cap bounds output width.
    """
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    marked = activity.withColumn("cohort_day", F.min("day").over(w)).withColumn(
        "day_offset", F.datediff(F.col("day"), F.col("cohort_day"))
    )
    return (
        marked.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            "day_offset",
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort", "day_offset")
    )


@_register(
    "events_key_skew_profile",
    oracle="""
    WITH kc AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n, COUNT(*) AS n_keys FROM kc)
    SELECT kc.user_id, kc.cnt,
           ROUND(kc.cnt / tot.n, 6) AS share,
           ROUND(kc.cnt * tot.n_keys / tot.n, 6) AS skew_factor
    FROM kc CROSS JOIN tot
    ORDER BY kc.cnt DESC, kc.user_id
    LIMIT 10
    """,
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter / skew diagnostics for a join-or-group key: the top
    keys by row count with their corpus share and skew factor (ratio to
    the uniform per-key expectation) — the measurement that decides
    whether a key needs salting (operators/analytics.segment_revenue_salted)
    or AQE skew splitting before a 100 TB join.

    One map-combined aggregation to key cardinality; the scalar totals
    come from re-aggregating that (tiny) key-count table and broadcast
    back as a one-row cross join; top-10 plans TakeOrderedAndProject.
    The corpus is scanned once and only (key, count) pairs ever shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = kc.agg(
        F.sum("cnt").cast("double").alias("n"), F.count("*").alias("n_keys")
    )
    return (
        kc.join(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("n"), 6).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id"))
        .limit(10)
    )


ZSCORE_THRESHOLD = 3.0


@_register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_POP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS events,
           CAST(SUM(CASE WHEN ABS((e.value - s.mu) / s.sigma) >= {ZSCORE_THRESHOLD}
                    THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
           ROUND(MAX(ABS((e.value - s.mu) / s.sigma)), 4) AS max_abs_z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier summary per event type — the monitoring pass that
    flags value anomalies before they poison downstream aggregates.

    Two-pass shape: a tiny per-type moment aggregation (map-side combined,
    |event types| rows) broadcasts back onto the stream, so the corpus is
    scanned twice but shuffled never beyond the per-type partials — the
    standard trade when the stats table is broadcastable. No global
    window, no per-row state.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    # try_divide: sigma=0 (constant group) yields NULL like the oracle's
    # division, instead of an ANSI DIVIDE_BY_ZERO crash
    z = F.abs(F.try_divide(F.col("value") - F.col("mu"), F.col("sigma")))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.sum(F.when(z >= ZSCORE_THRESHOLD, 1).otherwise(0)).alias("outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@_register(
    "orders_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm
    )
    SELECT r * 100 + f * 10 + m AS segment,
           COUNT(*) AS customers
    FROM scored
    GROUP BY 1
    ORDER BY 1
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartile codes.

    Classic marketing-analytics shape: reduce the fact table to one row
    per customer, then three unpartitioned NTILE windows score each
    dimension 1-4 and concatenate into a segment code (111 = best across
    the board). Same global-window discipline as customer_spend_quartiles
    — the sort only ever sees |customers| rows, never raw orders; custkey
    tie-breaks make every quartile boundary deterministic cross-engine.
    """
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    r_w = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    f_w = Window.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
    return (
        rfm.withColumn("r", F.ntile(4).over(r_w))
        .withColumn("f", F.ntile(4).over(f_w))
        .withColumn("m", F.ntile(4).over(m_w))
        .select(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("bigint")
            .alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").alias("customers"))
        .orderBy("segment")
    )


@_register(
    "events_user_features",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
             AS purchase_value,
           CAST(COUNT(DISTINCT DATE_TRUNC('day', ts)) AS BIGINT) AS active_days,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector — the feature-store export for a
    propensity/churn model: per-type event counts, purchase value, days
    active, last-seen timestamp.

    ONE aggregation pass computes every feature (conditional sums instead
    of a pivot or per-type scans), so the corpus is read once and the only
    shuffle carries per-user partials. COUNT(DISTINCT day) rides the same
    groupBy — Spark plans the distinct via a partial expand, still one
    scan. At 100 TB this is the shape that matters: feature count grows
    the projection, never the number of passes.
    """
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    return (
        ev.groupBy("user_id")
        .agg(
            cnt("click").alias("clicks"),
            cnt("view").alias("views"),
            cnt("purchase").alias("purchases"),
            cnt("signup").alias("signups"),
            cnt("error").alias("errors"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                ),
                4,
            ).alias("purchase_value"),
            F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("active_days"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        )
        .orderBy("user_id")
    )


HIST_BIN_WIDTH = 50.0


@_register(
    "events_value_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(FLOOR(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the distribution view
    behind dashboards and drift monitors.

    Binning is a pure projection (floor division), so the histogram is ONE
    map-side-combined aggregation on (type, bin): shuffle volume is bounded
    by |types| x |occupied bins| regardless of corpus size — the reason
    fixed-width bins beat exact percentiles for continuous monitoring
    (events_value_percentiles exists for the exact one-off).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / HIST_BIN_WIDTH).cast("bigint").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


COOC_TOP = 20


@_register(
    "events_item_cooccurrence",
    oracle=f"""
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(ROUND(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                  AS BIGINT) AS item
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS users
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, users
    FROM pairs
    ORDER BY users DESC, item_a, item_b
    LIMIT {COOC_TOP}
    """,
)
def events_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence: the recsys data-prep join ("users who clicked X
    also clicked Y"), top pairs by shared-user count.

    Shape: dedupe to the distinct (user, item) incidence first — the
    self-join then blows up per-user as activity^2, so the dedup is what
    bounds the pair space (a user clicking one item 1000 times contributes
    once, not 10^6 pairs). The join co-partitions on user_id (one shuffle
    each side, and Spark reuses the single distinct's exchange for both),
    pair counting is map-side combined, and the global top-N is
    TakeOrderedAndProject. Skewed power-users are the known hot key at
    100 TB — cap per-user activity upstream or salt, as
    events_key_skew_profile measures.
    """
    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.round(
                F.get_json_object("props", "$.k").try_cast("double")
            ).cast("bigint").alias("item"),
        )
        .distinct()
    )
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("users"))
    )
    return pairs.orderBy(F.col("users").desc(), "item_a", "item_b").limit(COOC_TOP)


PATHS_TOP = 15


@_register(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           COUNT(*) AS occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM seq
    WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY occurrences DESC, path
    LIMIT {PATHS_TOP}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step event-type paths — funnel discovery over raw streams.

    Each event pairs with its two successors via LEAD over the per-user
    time order (ties broken by event_id for cross-engine determinism), so
    path extraction is one per-user window pass — the shuffle carries
    (user, type, ts) tuples once, and every 3-gram is materialized as a
    skinny string. Counting is map-side combined; the global top-N plans
    TakeOrderedAndProject. The same shape extends to k-step paths by
    adding LEAD offsets, never extra shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            "user_id",
            # F.concat (NULL-propagating, like the oracle's ||) — concat_ws
            # would silently skip a NULL event_type and fabricate 2-step paths
            F.concat("e1", F.lit(">"), "e2", F.lit(">"), "e3").alias("path"),
        )
        .groupBy("path")
        .agg(
            F.count("*").alias("occurrences"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy(F.col("occurrences").desc(), "path")
        .limit(PATHS_TOP)
    )


# --- round-3 additions: session funnel + temporal backlog ------------------


@_register(
    "events_session_funnel",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    ),
    v AS (SELECT user_id, session_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS mv
          FROM sess GROUP BY 1, 2),
    c AS (SELECT s.user_id, s.session_id,
                 MIN(CASE WHEN s.event_type = 'click' AND s.ts >= v.mv
                          THEN s.ts END) AS mc
          FROM sess s JOIN v ON v.user_id = s.user_id
                            AND v.session_id = s.session_id
          GROUP BY 1, 2),
    p AS (SELECT s.user_id, s.session_id,
                 MIN(CASE WHEN s.event_type = 'purchase' AND s.ts >= c.mc
                          THEN s.ts END) AS mp
          FROM sess s JOIN c ON c.user_id = s.user_id
                            AND c.session_id = s.session_id
          GROUP BY 1, 2)
    SELECT COUNT(*) AS sessions,
           CAST(SUM(CASE WHEN v.mv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS with_view,
           CAST(SUM(CASE WHEN c.mc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS view_then_click,
           CAST(SUM(CASE WHEN p.mp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS view_click_purchase
    FROM v JOIN c ON c.user_id = v.user_id AND c.session_id = v.session_id
           JOIN p ON p.user_id = v.user_id AND p.session_id = v.session_id
    """,
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-session ordered funnel: of all sessions (30-min gap), how many
    contain a view, a click at-or-after that view, and a purchase
    at-or-after that click — the strict-ordering conversion metric (a
    purchase *before* the first view does not count, unlike the global
    funnel in events_conversion_funnel).

    Shape: sessionize with two windows (lag + running sum) on ONE
    (user_id, ts) sort, then ONE (user_id, session_id) aggregation packs
    each session's (ts, type) events into a sorted array; the dependent
    funnel milestones (click-after-view needs the view time first) are
    higher-order-function projections over that array — no second pass.
    The naive three-stage spelling (aggregate mv, join back, aggregate mc,
    join back, ...) re-references the sessionized subtree, and window
    results are not exchanges, so Catalyst re-EXECUTES the corpus sort per
    reference — six sorts at test scale; the gate
    tests/test_plans.py::test_session_funnel_single_sessionize_sort pins
    the single-sort shape. Session arrays are session-sized (bounded by
    the 30-min gap), so collect_list state stays small at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("user_id", "session_id", "ts", "event_type")
    packed = sess.groupBy("user_id", "session_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    # F.get is NULL out-of-bounds (vs ANSI element_at, which raises), so an
    # empty filter result propagates NULL through the milestone chain.
    mv = F.get(
        F.filter("evs", lambda e: e["event_type"] == F.lit("view")), 0
    )["ts"]
    milestones = packed.select(
        F.col("evs").alias("evs"), mv.alias("mv")
    ).select(
        "mv",
        F.get(
            F.filter(
                "evs",
                lambda e: (e["event_type"] == F.lit("click"))
                & (e["ts"] >= F.col("mv")),
            ),
            0,
        )["ts"].alias("mc"),
        "evs",
    ).select(
        "mv",
        "mc",
        F.get(
            F.filter(
                "evs",
                lambda e: (e["event_type"] == F.lit("purchase"))
                & (e["ts"] >= F.col("mc")),
            ),
            0,
        )["ts"].alias("mp"),
    )
    return milestones.agg(
        F.count("*").alias("sessions"),
        F.sum(F.when(F.col("mv").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("with_view"),
        F.sum(F.when(F.col("mc").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("view_then_click"),
        F.sum(F.when(F.col("mp").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("view_click_purchase"),
    )


@_register(
    "orders_backlog_asof",
    oracle="""
    WITH shipped AS (
      SELECT l_orderkey AS orderkey, MAX(l_shipdate) AS shipped_at
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS placed_m,
             strftime(date_trunc('month', s.shipped_at), '%Y-%m') AS shipped_m
      FROM orders o LEFT JOIN shipped s ON s.orderkey = o.o_orderkey
    ),
    months AS (SELECT DISTINCT placed_m AS m FROM o),
    placed AS (SELECT placed_m AS m, COUNT(*) AS n FROM o GROUP BY 1),
    shipped_c AS (SELECT shipped_m AS m, COUNT(*) AS n FROM o
                  WHERE shipped_m IS NOT NULL GROUP BY 1)
    SELECT months.m AS month,
           CAST(COALESCE(SUM(p.n) OVER w, 0) AS BIGINT) AS placed_cum,
           CAST(COALESCE(SUM(s.n) OVER w, 0) AS BIGINT) AS shipped_cum,
           CAST(COALESCE(SUM(p.n) OVER w, 0)
                - COALESCE(SUM(s.n) OVER w, 0) AS BIGINT) AS backlog
    FROM months
    LEFT JOIN placed p ON p.m = months.m
    LEFT JOIN shipped_c s ON s.m = months.m
    WINDOW w AS (ORDER BY months.m ROWS UNBOUNDED PRECEDING)
    ORDER BY month
    """,
)
def orders_backlog_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end open-order backlog: for each month, orders placed up to
    then minus orders fully shipped up to then — the as-of temporal
    rollup, computed WITHOUT a range join.

    The naive spelling (orders x month-ends, inequality join) builds an
    O(orders x months) intermediate; this one reduces each side to
    per-month counts first (one shuffle each, both map-side combined;
    the max-shipdate pre-aggregate rides the orderkey shuffle), then runs
    the cumulative window over |months| rows — a few dozen — so the
    global sort the window needs is metadata-scale. Orders never shipped
    stay in the backlog forever, which is the semantics a fulfillment
    audit wants.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    shipped = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.max("l_shipdate").alias("shipped_at")
    )
    om = (
        o.join(shipped, o["o_orderkey"] == shipped["orderkey"], "left")
        .select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "placed_m"
            ),
            F.date_format(F.date_trunc("month", "shipped_at"), "yyyy-MM").alias(
                "shipped_m"
            ),
        )
    )
    months = om.select(F.col("placed_m").alias("m")).distinct()
    placed = om.groupBy(F.col("placed_m").alias("m")).agg(F.count("*").alias("pn"))
    shipped_c = (
        om.filter(F.col("shipped_m").isNotNull())
        .groupBy(F.col("shipped_m").alias("m"))
        .agg(F.count("*").alias("sn"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        months.join(placed, "m", "left")
        .join(shipped_c, "m", "left")
        .select(
            F.col("m").alias("month"),
            F.coalesce(F.sum("pn").over(w), F.lit(0)).cast("bigint").alias("placed_cum"),
            F.coalesce(F.sum("sn").over(w), F.lit(0)).cast("bigint").alias("shipped_cum"),
            (
                F.coalesce(F.sum("pn").over(w), F.lit(0))
                - F.coalesce(F.sum("sn").over(w), F.lit(0))
            ).cast("bigint").alias("backlog"),
        )
        .orderBy("month")
    )


@_register(
    "events_sliding_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE ts IS NOT NULL
    ),
    d1 AS (SELECT day, COUNT(DISTINCT user_id) AS users_1d FROM du GROUP BY day),
    cov AS (
      SELECT dd.day, u.user_id
      FROM (SELECT DISTINCT day FROM du) dd
      JOIN du u ON u.day BETWEEN dd.day - 6 AND dd.day
    ),
    d7 AS (SELECT day, COUNT(DISTINCT user_id) AS users_7d FROM cov GROUP BY day)
    SELECT d1.day, d1.users_1d, d7.users_7d
    FROM d1 JOIN d7 ON d1.day = d7.day
    ORDER BY d1.day
    """,
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per event day (rolling DAU/WAU).

    COUNT(DISTINCT) over a sliding time window has no native window-function
    form (distinct aggregates are not framable), and the naive spelling is a
    day x events range self-join — quadratic in window width. The scalable
    formulation inverts it: reduce events to distinct (day, user) pairs
    first, then EXPLODE each pair onto the <=7 target days it covers
    (`sequence(day, day+6)`) and run one plain distinct-count per target
    day. Shuffle volume is bounded by 7 x |distinct day-user pairs| — rows
    of 12 bytes, never event payloads — regardless of corpus size, and both
    aggregations are map-side combinable. The inner join back to observed
    event days drops the phantom trailing days the explode fabricates past
    the last event. The oracle replays the semantics as the range join,
    proving the explode-rollup is equivalent.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    day1 = du.groupBy("day").agg(F.count_distinct("user_id").alias("users_1d"))
    cover = du.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"),
        "user_id",
    )
    day7 = cover.groupBy("day").agg(F.count_distinct("user_id").alias("users_7d"))
    return day1.join(day7, "day").select(
        "day", "users_1d", "users_7d"
    ).orderBy("day")


@_register(
    "events_drift_report",
    oracle="""
    WITH b AS (
      SELECT (epoch(MIN(ts)) + epoch(MAX(ts))) / 2.0 AS cut
      FROM events WHERE ts IS NOT NULL
    ),
    lab AS (
      SELECT event_type, value,
             CASE WHEN epoch(ts) < (SELECT cut FROM b) THEN 0 ELSE 1 END AS half
      FROM events WHERE ts IS NOT NULL
    ),
    per AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             AVG(CASE WHEN half = 0 THEN value END) AS mean_a,
             AVG(CASE WHEN half = 1 THEN value END) AS mean_b
      FROM lab GROUP BY event_type
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM per)
    SELECT event_type, n_a, n_b,
           ROUND(CAST(n_a AS DOUBLE) / ta, 6) AS share_a,
           ROUND(CAST(n_b AS DOUBLE) / tb, 6) AS share_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             ROUND((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
                   * LN((CAST(n_a AS DOUBLE) / ta) / (CAST(n_b AS DOUBLE) / tb)), 6)
           END AS psi_term,
           ROUND(mean_a, 6) AS mean_a,
           ROUND(mean_b, 6) AS mean_b
    FROM per, tot
    ORDER BY event_type
    """,
)
def events_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: split the event stream at the midpoint of
    its time range and compare the event-type mix and per-type value means
    between the two halves — population-stability-index (PSI) terms per
    type, the standard "did yesterday's data change shape?" alarm a
    production ingest pipeline runs before training on a new slice.

    Shape: one cheap min/max scan produces the 1-row cut, broadcast into a
    second scan's CASE label; everything after is ONE map-side-combinable
    groupBy at |event_type| cardinality plus a 1-row totals broadcast. No
    wide shuffle ever carries event rows — at 100 TB both passes are scans
    with scalar-sized exchanges. PSI terms are NULL when a type is absent
    from either half (ln undefined); the alarm condition is
    SUM(psi_term) > 0.2 over non-null terms.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bounds = ev.agg(
        (
            (
                F.min("ts").cast("double") + F.max("ts").cast("double")
            ) / 2.0
        ).alias("cut")
    )
    lab = ev.join(F.broadcast(bounds)).select(
        "event_type",
        "value",
        F.when(F.col("ts").cast("double") < F.col("cut"), 0).otherwise(1).alias("half"),
    )
    per = lab.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.avg(F.when(F.col("half") == 0, F.col("value"))).alias("m_a"),
        F.avg(F.when(F.col("half") == 1, F.col("value"))).alias("m_b"),
    )
    tot = per.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    sa = F.col("n_a").cast("double") / F.col("ta")
    sb = F.col("n_b").cast("double") / F.col("tb")
    return (
        per.join(F.broadcast(tot))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(sa, 6).alias("share_a"),
            F.round(sb, 6).alias("share_b"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round((sa - sb) * F.log(sa / sb), 6),
            ).alias("psi_term"),
            F.round("m_a", 6).alias("mean_a"),
            F.round("m_b", 6).alias("mean_b"),
        )
        .orderBy("event_type")
    )


BOT_BURST_60S = 5      # >= this many events inside any 60 s window
BOT_RATE_PER_MIN = 2.0  # or >= this sustained events/active-minute


@_register(
    "events_bot_detection",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(epoch(ts) * 1000000 AS BIGINT) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    w AS (
      SELECT user_id, us,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW
             ) AS burst
      FROM e
    ),
    per AS (
      SELECT user_id, COUNT(*) AS n_events,
             MAX(burst) AS max_burst_60s,
             (MAX(us) - MIN(us)) / 1e6 AS span_secs
      FROM w GROUP BY user_id
    )
    SELECT user_id, n_events, max_burst_60s,
           ROUND(CASE WHEN span_secs > 0
                      THEN n_events / (span_secs / 60.0)
                      ELSE CAST(n_events AS DOUBLE) END, 6) AS events_per_min,
           (max_burst_60s >= {BOT_BURST_60S} OR
            (CASE WHEN span_secs > 0 THEN n_events / (span_secs / 60.0)
                  ELSE CAST(n_events AS DOUBLE) END) >= {BOT_RATE_PER_MIN})
             AS is_bot
    FROM per
    ORDER BY user_id
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated-traffic screen: per user, the max event count inside any
    sliding 60 s window plus the sustained events-per-active-minute rate;
    either over threshold flags the user — the spam/bot filter a
    training-data pipeline runs before user-generated text is admitted.

    Shape: ONE shuffle of (user_id, timestamp) pairs — 16-byte rows, never
    event payloads — then a per-user sort-window (RANGE frame over
    microseconds, so the window is exact to the event clock's resolution)
    and a map-side-combinable rollup on the same partitioning, which Spark
    serves without a second exchange. Microsecond integers, not float
    seconds: CAST(double AS BIGINT) rounds in DuckDB but truncates in
    Spark, and epoch-micros is the resolution where both are integral and
    therefore identical.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    e = ev.select(
        "user_id", (F.col("ts").cast("double") * 1_000_000).cast("bigint").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-59_999_999, 0)
    b = e.withColumn("burst", F.count("*").over(w))
    per = b.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("burst").alias("max_burst_60s"),
        ((F.max("us") - F.min("us")) / 1e6).alias("span_secs"),
    )
    rate = F.when(
        F.col("span_secs") > 0,
        F.col("n_events") / (F.col("span_secs") / 60.0),
    ).otherwise(F.col("n_events").cast("double"))
    return per.select(
        "user_id",
        "n_events",
        "max_burst_60s",
        F.round(rate, 6).alias("events_per_min"),
        (
            (F.col("max_burst_60s") >= BOT_BURST_60S)
            | (rate >= BOT_RATE_PER_MIN)
        ).alias("is_bot"),
    ).orderBy("user_id")


@_register(
    "data_quality_audit",
    oracle="""
    WITH lj AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS orphans,
             SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
               AS early_ship,
             SUM(CASE WHEN l.l_quantity IS NULL OR l.l_quantity <= 0
                      THEN 1 ELSE 0 END) AS bad_qty,
             SUM(CASE WHEN l.l_discount < 0 OR l.l_discount > 1
                      THEN 1 ELSE 0 END) AS bad_disc
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    oj AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans,
             SUM(CASE WHEN o.o_totalprice IS NULL OR o.o_totalprice <= 0
                      THEN 1 ELSE 0 END) AS bad_price
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cu AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END)
               AS no_name
      FROM customer
    ),
    checks AS (
      SELECT 'lineitem_discount_in_unit_range' AS check_name, total,
             CAST(bad_disc AS BIGINT) AS violations FROM lj
      UNION ALL
      SELECT 'lineitem_orderkey_references_orders', total,
             CAST(orphans AS BIGINT) FROM lj
      UNION ALL
      SELECT 'lineitem_quantity_positive', total, CAST(bad_qty AS BIGINT) FROM lj
      UNION ALL
      SELECT 'lineitem_ships_on_or_after_order', total,
             CAST(early_ship AS BIGINT) FROM lj
      UNION ALL
      SELECT 'orders_custkey_references_customer', total,
             CAST(orphans AS BIGINT) FROM oj
      UNION ALL
      SELECT 'orders_totalprice_positive', total, CAST(bad_price AS BIGINT) FROM oj
      UNION ALL
      SELECT 'customer_name_present', total, CAST(no_name AS BIGINT) FROM cu
    )
    SELECT check_name, total, violations, violations = 0 AS passed
    FROM checks ORDER BY check_name
    """,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-validation suite (the Deequ/dbt-test shape): one
    audit row per constraint — positivity, unit-range, referential
    integrity, temporal ordering, presence — each with total/violation
    counts and a pass verdict. The gate a pipeline runs before promoting
    a batch into the curated zone.

    Shape: ALL lineitem checks share one scan + one left equi-join to
    orders (conditional aggregation folds the four constraints into a
    single map-side-combined pass; the join also serves the referential
    check, so integrity costs no extra pass); likewise orders+customer;
    customer's presence check is a bare scan. Three 1-row aggregates then
    unpivot to audit rows — at 100 TB the shuffles are the two equi-joins
    a fact-dimension validation inherently needs, and every exchange
    beyond them is scalar-sized.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    lj = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left")
        .agg(
            F.count("*").alias("total"),
            cnt(F.col("o_orderkey").isNull()).alias("orphans"),
            cnt(F.col("l_shipdate") < F.col("o_orderdate")).alias("early_ship"),
            cnt(
                F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)
            ).alias("bad_qty"),
            cnt(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ).alias("bad_disc"),
        )
        .selectExpr(
            "stack(4, "
            "'lineitem_discount_in_unit_range', total, bad_disc, "
            "'lineitem_orderkey_references_orders', total, orphans, "
            "'lineitem_quantity_positive', total, bad_qty, "
            "'lineitem_ships_on_or_after_order', total, early_ship"
            ") AS (check_name, total, violations)"
        )
    )
    oj = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .agg(
            F.count("*").alias("total"),
            cnt(F.col("c_custkey").isNull()).alias("orphans"),
            cnt(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
            ).alias("bad_price"),
        )
        .selectExpr(
            "stack(2, "
            "'orders_custkey_references_customer', total, orphans, "
            "'orders_totalprice_positive', total, bad_price"
            ") AS (check_name, total, violations)"
        )
    )
    cu = c.agg(
        F.count("*").alias("total"),
        cnt(F.col("c_name").isNull() | (F.col("c_name") == "")).alias("no_name"),
    ).selectExpr(
        "stack(1, 'customer_name_present', total, no_name)"
        " AS (check_name, total, violations)"
    )
    return (
        lj.unionByName(oj)
        .unionByName(cu)
        .select(
            "check_name",
            "total",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


@_register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    t AS (
      SELECT src, dst, COUNT(*) AS transitions
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, transitions,
           ROUND(CAST(transitions AS DOUBLE)
                 / SUM(transitions) OVER (PARTITION BY src), 6) AS p
    FROM t
    ORDER BY src, dst
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    counts and conditional probabilities P(next type | current type) — the
    behavioral fingerprint that feeds journey simulation, next-action
    models, and change detection (a shifted row of this matrix is a
    product change or a bot).

    Shape: ONE per-user sort window produces successor pairs (the same
    single-shuffle discipline as events_top_paths — (user, ts, type)
    tuples only), then the matrix is a |types|^2 map-side-combined
    aggregate and the probability normalization is a window over that
    already-tiny table. The (ts, event_id) tie-break makes simultaneous
    events order identically in both engines.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count("*").alias("transitions"))
    wn = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "transitions",
        F.round(
            F.col("transitions").cast("double") / F.sum("transitions").over(wn), 6
        ).alias("p"),
    ).orderBy("src", "dst")


@_register(
    "orders_monthly_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             ROUND(SUM(o_totalprice), 4) AS revenue,
             COUNT(*) AS orders
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY 1
    )
    SELECT month, orders, revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY month), 4) AS delta,
           ROUND(
             100.0 * (revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month), 4
           ) AS pct_growth
    FROM m
    ORDER BY month
    """,
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: per-month totals with absolute and
    percentage deltas against the prior month — the standard KPI series.

    Shape: revenue pre-aggregates to |months| rows BEFORE the LAG window
    (the pre-aggregation-before-global-window rule the plan gates pin for
    window_running_revenue) — the unpartitioned window sees a few dozen
    rows, never order rows, so the single-partition window stage is
    scalar-sized at any corpus scale. Revenue is rounded once at the
    month level and deltas derive from the rounded series, keeping both
    engines' float exposure identical.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.count("*").alias("orders"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "orders",
        "revenue",
        F.round(F.col("revenue") - prev, 4).alias("delta"),
        F.round(F.lit(100.0) * (F.col("revenue") - prev) / prev, 4).alias(
            "pct_growth"
        ),
    ).orderBy("month")


@_register(
    "events_sketch_rollup_merge",
    oracle="""
    SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
           CAST(COUNT(DISTINCT CASE WHEN user_id IS NOT NULL
                                    THEN user_id END) AS BIGINT) AS exact_users,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS days_merged,
           TRUE AS merged_within_eps
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1
    ORDER BY month
    """,
)
def events_sketch_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability — the pre-aggregated rollup-table pattern: build
    one DataSketches HLL sketch per (month, day), then answer the monthly
    distinct-users question by UNIONING the daily sketches, never
    re-touching raw events. This is how a 100 TB pipeline serves
    arbitrary-range distinct counts: materialize small daily sketch rows
    once; any rollup window is then a merge of |days| fixed-size binaries
    — the property exact distinct counts fundamentally lack (daily exact
    counts cannot be added).

    The estimate is implementation-defined, so the registered output is
    the deterministic verdict (same contract as events_approx_sketch):
    merged estimate within 3 sigma of the sketch's configured precision
    (lgConfigK=12 -> rsd ~1.6%, bound 5%) of the exact month count. The
    exact count and day cardinality ride along as hard-hashable columns.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = ev.select(
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    daily = base.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    monthly = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("days_merged"),
    )
    exact = base.groupBy("month").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        monthly.join(exact, "month")
        .select(
            "month",
            "exact_users",
            F.col("days_merged").cast("bigint").alias("days_merged"),
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_eps"),
        )
        .orderBy("month")
    )


@_register(
    "events_gap_distribution",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(epoch(ts) * 1000000 AS BIGINT)
             - LAG(CAST(epoch(ts) * 1000000 AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    b AS (
      SELECT event_type,
             CAST(FLOOR(ln(gap_us / 1e6 + 1) / ln(2)) AS BIGINT) AS bucket
      FROM g WHERE gap_us IS NOT NULL
    )
    SELECT event_type, bucket,
           CAST(POW(2, bucket) - 1 AS BIGINT) AS gap_secs_lo,
           COUNT(*) AS n
    FROM b
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def events_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event arrival profile: log2 histogram of the time gap between
    a user's consecutive events, per event type — the arrival-process
    fingerprint that sets session-gap thresholds (the sessionizer's
    30-minute cut should fall in this histogram's valley) and flags
    machine cadence (a spike in the sub-second buckets).

    Shape: the same ONE per-user sort window as the sessionizer
    (16-byte (user, ts) tuples), gaps bucket by a pure log2 projection,
    and the rollup is a map-side-combined aggregate at |types| x ~40
    buckets. Gaps compute on integer epoch-micros (the truncation-vs-
    rounding rule events_bot_detection documents); the +1 inside the log
    keeps zero-gaps (simultaneous events) in bucket 0 rather than -inf.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    us = (F.col("ts").cast("double") * 1_000_000).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.floor(
        F.log(F.col("gap_us") / 1e6 + 1) / F.log(F.lit(2.0))
    ).cast("bigint")
    return (
        g.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.pow(F.lit(2.0), F.col("bucket")) - 1).cast("bigint").alias(
                "gap_secs_lo"
            ),
            "n",
        )
        .orderBy("event_type", "bucket")
    )


@_register(
    "users_activity_reconciliation",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS clicks FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL GROUP BY user_id
    ),
    p AS (
      SELECT user_id, COUNT(*) AS purchases FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.clicks, 0) AS clicks,
           COALESCE(p.purchases, 0) AS purchases,
           CASE WHEN c.user_id IS NULL THEN 'purchase_only'
                WHEN p.user_id IS NULL THEN 'click_only'
                ELSE 'both' END AS status
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    ORDER BY user_id
    """,
)
def users_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation via FULL OUTER join: every user appearing
    on EITHER side of the click/purchase ledgers, with per-side counts
    and a both/click_only/purchase_only verdict — the cross-system audit
    shape (billing vs usage, crawl A vs crawl B) where inner/left joins
    silently drop exactly the disagreement rows you are looking for.

    Shape: both sides pre-aggregate to per-user counts BEFORE the join
    (map-side combined; the full-outer then carries one skinny row per
    user per side, co-partitioned on the join key — one shuffle each).
    A full outer can't broadcast either side by definition, so this is
    the sort-merge case; at 100 TB both inputs arrive already reduced to
    their key cardinality.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("purchases"))
        .withColumnRenamed("user_id", "p_user_id")
    )
    j = c.join(p, c.user_id == p.p_user_id, "full_outer")
    return j.select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        F.coalesce("clicks", F.lit(0)).alias("clicks"),
        F.coalesce("purchases", F.lit(0)).alias("purchases"),
        F.when(F.col("user_id").isNull(), "purchase_only")
        .when(F.col("p_user_id").isNull(), "click_only")
        .otherwise("both")
        .alias("status"),
    ).orderBy("user_id")


@_register(
    "events_ab_test_summary",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             ({hash60_sql("CAST(user_id AS VARCHAR)", salt="ab")}) % 2 AS variant
      FROM events WHERE user_id IS NOT NULL
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT a.variant,
           COUNT(*) AS users,
           CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS converters,
           ROUND(CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS conversion_rate
    FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
    GROUP BY a.variant
    ORDER BY a.variant
    """,
)
def events_ab_test_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with hash-deterministic assignment: users
    split into variants by a salted hash of their id (the replayable
    bucketing every experimentation platform uses — re-running the
    analysis or adding late data never reassigns anyone), then per-variant
    user counts, converters, and conversion rate.

    Shape: assignment is a projection on the distinct-user reduction (one
    map-side-combined shuffle at user cardinality); conversion attaches
    via an equi-join of two per-user sets; the readout is a 2-row
    aggregate. The deterministic hash is the same salted family the
    samplers use — at 100 TB assignment is stateless, needs no
    assignment table, and is identical on every engine and every re-run.
    """
    from ..functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (hash60(F.col("user_id").cast("string"), salt="ab") % 2).alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    j = assign.join(conv, "user_id", "left")
    return (
        j.groupBy("variant")
        .agg(
            F.count("*").alias("users"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("bigint").alias("converters"),
            F.round(
                F.sum(F.coalesce("converted", F.lit(0))).cast("double")
                / F.count("*"),
                6,
            ).alias("conversion_rate"),
        )
        .orderBy("variant")
    )


@_register(
    "events_pareto_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    ranked AS (
      SELECT n,
             ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rnk,
             SUM(n) OVER (ORDER BY n DESC, user_id
                          ROWS UNBOUNDED PRECEDING) AS cum_events,
             COUNT(*) OVER () AS total_users,
             SUM(n) OVER () AS total_events
      FROM per_user
    )
    SELECT CAST(decile AS BIGINT) AS user_decile,
           MAX(cum_share) AS cum_event_share
    FROM (
      SELECT CAST(CEIL(10.0 * rnk / total_users) AS BIGINT) AS decile,
             ROUND(CAST(cum_events AS DOUBLE) / total_events, 6) AS cum_share
      FROM ranked
    )
    GROUP BY decile
    ORDER BY user_decile
    """,
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (the 80/20 audit): rank users by event count
    and report the cumulative share of all events produced by each user
    decile — decile 1's share near 0.8 means a handful of accounts
    dominate the corpus, the signal to cap per-user contributions before
    the dataset becomes a mirror of its power users.

    Shape: the fact table reduces to per-user counts first (map-side
    combined), the running total is ONE unpartitioned window over
    |users| skinny rows (the pre-aggregate-before-global-window rule),
    and the decile rollup is 10 rows. The (count desc, user_id)
    tie-break pins both the ranking and the running sum cross-engine.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "user_id")
    wall = Window.partitionBy()
    ranked = per_user.select(
        "n",
        F.row_number().over(w).alias("rnk"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_events"
        ),
        F.count("*").over(wall).alias("total_users"),
        F.sum("n").over(wall).alias("total_events"),
    )
    dec = ranked.select(
        F.ceil(10.0 * F.col("rnk") / F.col("total_users")).cast("bigint").alias(
            "user_decile"
        ),
        F.round(
            F.col("cum_events").cast("double") / F.col("total_events"), 6
        ).alias("cum_share"),
    )
    return (
        dec.groupBy("user_decile")
        .agg(F.max("cum_share").alias("cum_event_share"))
        .orderBy("user_decile")
    )


@_register(
    "events_forecast_backtest",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hb,
             COUNT(*) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    cut AS (SELECT MAX(hb) - 167 AS c FROM h),
    train AS (
      SELECT event_type, hb % 168 AS how, AVG(CAST(cnt AS DOUBLE)) AS fc
      FROM h CROSS JOIN cut WHERE hb < c
      GROUP BY 1, 2
    ),
    eval_ AS (
      SELECT event_type, hb % 168 AS how, cnt
      FROM h CROSS JOIN cut WHERE hb >= c
    )
    SELECT e.event_type,
           COUNT(*) AS n_hours,
           ROUND(AVG(ABS(e.cnt - t.fc)), 4) + 0 AS mae,
           ROUND(AVG(e.cnt - t.fc), 4) + 0 AS bias
    FROM eval_ e JOIN train t
      ON e.event_type = t.event_type AND e.how = t.how
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-seasonal forecast backtest: predict each of the final week's
    hourly event counts from the average of the same hour-of-week in the
    training weeks, and report per-type MAE and bias — the baseline every
    capacity/traffic forecasting model must beat, and the cheapest
    \"did the data's weekly shape just change?\" alarm.

    Shape: the corpus reduces to (type, hour-bucket) counts in one
    map-side-combined pass; the train/eval split is a 1-row max-hour
    broadcast; the seasonal profile is |types| x 168 rows joined back to
    one week of eval rows. Hour buckets are integer epoch-hours and the
    week position is hb % 168 — no calendar/timezone functions, so both
    engines bucket identically. Hours with zero events are absent from
    both the profile and the eval set (documented: the backtest scores
    observed hours).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    h = ev.groupBy(
        "event_type",
        F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 3600").alias("hb"),
    ).agg(F.count("*").alias("cnt"))
    cut = h.agg((F.max("hb") - 167).alias("c"))
    train = (
        h.join(F.broadcast(cut))
        .filter(F.col("hb") < F.col("c"))
        .groupBy("event_type", (F.col("hb") % 168).alias("how"))
        .agg(F.avg(F.col("cnt").cast("double")).alias("fc"))
    )
    ev_week = (
        h.join(F.broadcast(cut))
        .filter(F.col("hb") >= F.col("c"))
        .select("event_type", (F.col("hb") % 168).alias("how"), "cnt")
    )
    j = ev_week.join(train, ["event_type", "how"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            (F.round(F.avg(F.abs(F.col("cnt") - F.col("fc"))), 4) + F.lit(0.0)).alias(
                "mae"
            ),
            (F.round(F.avg(F.col("cnt") - F.col("fc")), 4) + F.lit(0.0)).alias("bias"),
        )
        .orderBy("event_type")
    )


@_register(
    "orders_sla_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             CAST(FLOOR(epoch(MIN(l.l_shipdate))) AS BIGINT)
             - CAST(FLOOR(epoch(ANY_VALUE(o.o_orderdate))) AS BIGINT)
               AS first_ship_secs
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY o.o_orderkey, o.o_orderpriority
    )
    SELECT o_orderpriority,
           COUNT(*) AS orders,
           ROUND(quantile_cont(first_ship_secs / 86400.0, 0.50), 6) AS p50_days,
           ROUND(quantile_cont(first_ship_secs / 86400.0, 0.95), 6) AS p95_days,
           ROUND(MAX(first_ship_secs / 86400.0), 6) AS max_days
    FROM lat
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def orders_sla_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA report: time from order placement to FIRST shipment,
    p50/p95/max per order priority — the ops dashboard that answers "are
    urgent orders actually shipping faster?" and the input to any SLA
    breach alert.

    Shape: lineitem reduces to one MIN-shipdate row per order in the
    fact-fact equi-join's own aggregation (map-side combined, keyed on
    the join key so AQE serves both from one exchange), then exact
    percentiles buffer only |orders-per-priority| latency scalars — with
    percentile_approx as the one-token 100 TB swap, same note as
    events_value_percentiles. Latencies are integer epoch-seconds before
    the divide so both engines interpolate identical values.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    secs = lambda c: F.expr(f"CAST(FLOOR(CAST({c} AS DOUBLE)) AS BIGINT)")  # noqa: E731
    lat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            (F.min(secs("l_shipdate")) - F.first(secs("o_orderdate"))).alias(
                "first_ship_secs"
            )
        )
    )
    days = F.col("first_ship_secs") / 86400.0
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("orders"),
            F.round(F.expr("percentile(first_ship_secs / 86400.0, 0.50)"), 6).alias(
                "p50_days"
            ),
            F.round(F.expr("percentile(first_ship_secs / 86400.0, 0.95)"), 6).alias(
                "p95_days"
            ),
            F.round(F.max(days), 6).alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "orders_basket_lift",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS total FROM ot),
    tc AS (SELECT t, COUNT(*) AS ct FROM ot GROUP BY t),
    pairs AS (
      SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS together
      FROM ot a JOIN ot b ON a.okey = b.okey AND a.t < b.t
      GROUP BY a.t, b.t
    )
    SELECT p.type_a, p.type_b, p.together,
           ROUND(p.together / n.total, 6) AS support,
           ROUND((p.together / n.total)
                 / ((ca.ct / n.total) * (cb.ct / n.total)), 6) AS lift
    FROM pairs p
    JOIN tc ca ON ca.t = p.type_a
    JOIN tc cb ON cb.t = p.type_b
    CROSS JOIN n
    ORDER BY p.type_a, p.type_b
    """,
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: for every pair of part types appearing in
    the same order, co-occurrence support and lift (observed / expected
    under independence) — lift > 1 is the cross-sell signal, lift < 1 the
    cannibalization signal; the classic association-rule statistic over
    the order fact.

    Shape: the basket table reduces each order to its DISTINCT types
    first (map-side combined through the part join — unfiltered part is
    SF-scaled, so no hard hint), so the
    pair self-join is co-partitioned on orderkey with per-order fan-out
    bounded by |types|^2, never line-item^2; type marginals and the
    order total are |types|- and 1-row broadcasts over the pair rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ot = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("t"))
        .distinct()
    )
    n = ot.agg(F.count_distinct("okey").cast("double").alias("total"))
    tc = ot.groupBy("t").agg(F.count("*").alias("ct"))
    a = ot.select(F.col("okey"), F.col("t").alias("type_a"))
    b = ot.select(F.col("okey"), F.col("t").alias("type_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("together"))
    )
    ca = tc.select(F.col("t").alias("type_a"), F.col("ct").alias("ct_a"))
    cb = tc.select(F.col("t").alias("type_b"), F.col("ct").alias("ct_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .join(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "together",
            F.round(F.col("together") / F.col("total"), 6).alias("support"),
            F.round(
                (F.col("together") / F.col("total"))
                / ((F.col("ct_a") / F.col("total")) * (F.col("ct_b") / F.col("total"))),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@_register(
    "events_new_vs_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN f.first_day < d.day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM daily d JOIN first_seen f ON f.user_id = d.user_id
    GROUP BY d.day
    ORDER BY day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: each active user counts as new on
    their first-seen day and returning after — the growth-vs-retention
    decomposition every DAU chart hides.

    Shape: one per-user MIN reduction plus one (day, user) distinct
    reduction, equi-joined on user — both map-side combined, both skinny;
    the rollup is |days| rows. Same first-seen skeleton as cohort
    retention, folded to the two-column daily readout.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    return (
        daily.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("first_day") == F.col("day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("first_day") < F.col("day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "new_users", "returning_users")
        .orderBy("day")
    )


@_register(
    "events_seasonality_strength",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hb,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    prof AS (
      SELECT event_type, hb % 168 AS how, AVG(cnt) AS m
      FROM h GROUP BY 1, 2
    ),
    g AS (SELECT event_type, AVG(cnt) AS gm FROM h GROUP BY event_type)
    SELECT h.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(1.0 - SUM((h.cnt - p.m) * (h.cnt - p.m))
                 / NULLIF(SUM((h.cnt - g.gm) * (h.cnt - g.gm)), 0), 4) + 0
             AS seasonal_r2
    FROM h JOIN prof p ON p.event_type = h.event_type AND p.how = h.hb % 168
           JOIN g ON g.event_type = h.event_type
    GROUP BY h.event_type
    ORDER BY h.event_type
    """,
)
def events_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength: the fraction of hourly-count variance
    explained by the hour-of-week profile (R^2 of the seasonal-mean
    model), per event type — near 1 means the weekly rhythm IS the
    signal (forecast with the profile, alert on deviation); near 0 means
    arrivals are memoryless and the seasonal forecast is no better than
    the global mean.

    Shape: the corpus reduces to (type, epoch-hour) counts once; the
    168-slot profile and the global mean are tiny aggregates joined back
    to the hourly rows; the R^2 is one conditional-sum pass. Same
    integer hour-bucket grid as the forecast backtest — the two tables
    are read together.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    h = ev.groupBy(
        "event_type",
        F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 3600").alias("hb"),
    ).agg(F.count("*").cast("double").alias("cnt"))
    prof = h.groupBy("event_type", (F.col("hb") % 168).alias("how")).agg(
        F.avg("cnt").alias("m")
    )
    g = h.groupBy("event_type").agg(F.avg("cnt").alias("gm"))
    j = (
        h.withColumn("how", F.col("hb") % 168)
        .join(prof, ["event_type", "how"])
        .join(F.broadcast(g), "event_type")
    )
    resid = (F.col("cnt") - F.col("m")) * (F.col("cnt") - F.col("m"))
    total = (F.col("cnt") - F.col("gm")) * (F.col("cnt") - F.col("gm"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            (
                F.round(
                    1.0 - F.sum(resid) / F.nullif(F.sum(total), F.lit(0.0)), 4
                )
                + F.lit(0.0)
            ).alias("seasonal_r2"),
        )
        .orderBy("event_type")
    )


@_register(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    shares AS (
      SELECT s_nationkey, l_suppkey,
             ROUND(r / SUM(r) OVER (PARTITION BY s_nationkey), 6) AS share
      FROM rev
    )
    SELECT s_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS suppliers,
           ROUND(SUM(share * share), 6) + 0 AS hhi
    FROM shares
    GROUP BY s_nationkey
    ORDER BY nationkey
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-base concentration: the Herfindahl-Hirschman index of
    revenue shares across each nation's suppliers — near 1/n means a
    healthy spread, approaching 1 means one supplier owns the lane (the
    single-point-of-failure procurement alarm).

    Shape: lineitem reduces to per-supplier revenue through the supplier
    join (no hard hint — supplier is SF-scaled, the size threshold picks
    broadcast at bench scale, map-side combined either way); shares are
    one window
    over the |suppliers|-row aggregate, and the HHI is a |nations|-row
    rollup. Shares round to 6 BEFORE squaring/summation so the float
    exposure is a sum of ~100 identical-in-both-engines terms.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
        )
    )
    w = Window.partitionBy("s_nationkey")
    shares = rev.select(
        "s_nationkey",
        F.round(F.col("r") / F.sum("r").over(w), 6).alias("share"),
    )
    return (
        shares.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("bigint").alias("suppliers"),
            (F.round(F.sum(F.col("share") * F.col("share")), 6) + F.lit(0.0)).alias(
                "hhi"
            ),
        )
        .orderBy("nationkey")
    )


@_register(
    "events_ab_significance",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             ({hash60_sql("CAST(user_id AS VARCHAR)", salt="ab")}) % 2 AS variant
      FROM events WHERE user_id IS NOT NULL
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    v AS (
      SELECT a.variant,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
               AS x
      FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY a.variant
    ),
    w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 0 THEN x END) AS x0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 1 THEN x END) AS x1
      FROM v
    )
    SELECT CAST(n0 AS BIGINT) AS users_a, CAST(n1 AS BIGINT) AS users_b,
           ROUND(x0 / n0, 6) AS rate_a,
           ROUND(x1 / n1, 6) AS rate_b,
           ROUND((x1 / n1 - x0 / n0)
                 / sqrt(((x0 + x1) / (n0 + n1)) * (1 - (x0 + x1) / (n0 + n1))
                        * (1 / n0 + 1 / n1)), 4) + 0 AS z_score,
           ABS((x1 / n1 - x0 / n0)
               / sqrt(((x0 + x1) / (n0 + n1)) * (1 - (x0 + x1) / (n0 + n1))
                      * (1 / n0 + 1 / n1))) >= 1.96 AS significant_95
    FROM w
    """,
)
def events_ab_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on the A/B readout: pooled-variance z-score
    of the conversion-rate difference plus the 95% verdict — the number
    that separates "variant B looks better" from "ship variant B". Under
    the null (hash assignment is independent of behavior by
    construction) this should NOT be significant; a significant result
    on hash-split data is itself an instrumentation alarm.

    Shape: the same two per-user reductions as events_ab_test_summary,
    pivoted to one row; the statistic is closed-form scalar arithmetic
    both engines evaluate identically (rounded once at the end).
    """
    from ..functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (hash60(F.col("user_id").cast("string"), salt="ab") % 2).alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1.0))
    )
    v = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.coalesce("converted", F.lit(0.0))).alias("x"),
        )
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    # try_divide throughout: a degenerate split (empty variant, zero or
    # total conversion) yields NULLs like the oracle's NaN-free SQL,
    # instead of an ANSI DIVIDE_BY_ZERO crash
    pool = F.try_divide(F.col("x0") + F.col("x1"), F.col("n0") + F.col("n1"))
    diff = F.try_divide(F.col("x1"), F.col("n1")) - F.try_divide(
        F.col("x0"), F.col("n0")
    )
    z = F.try_divide(
        diff,
        F.sqrt(
            pool
            * (1 - pool)
            * (F.try_divide(F.lit(1.0), F.col("n0"))
               + F.try_divide(F.lit(1.0), F.col("n1")))
        ),
    )
    return w.select(
        F.col("n0").cast("bigint").alias("users_a"),
        F.col("n1").cast("bigint").alias("users_b"),
        F.round(F.try_divide(F.col("x0"), F.col("n0")), 6).alias("rate_a"),
        F.round(F.try_divide(F.col("x1"), F.col("n1")), 6).alias("rate_b"),
        (F.round(z, 4) + F.lit(0.0)).alias("z_score"),
        (F.abs(z) >= 1.96).alias("significant_95"),
    )


@_register(
    "events_dispersion_index",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hb,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(AVG(cnt), 4) + 0 AS mean_per_hour,
           ROUND(VAR_POP(cnt) / NULLIF(AVG(cnt), 0), 4) + 0
             AS dispersion_index
    FROM h
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance/mean of hourly counts) per event
    type: ~1 means Poisson-like memoryless arrivals (rate alarms can use
    sqrt bands), >>1 means bursty/clumped traffic (use the burst screen),
    <1 means rate-limited/scheduled emission. The one-number arrival
    characterization read next to seasonality_strength.

    Shape: the same (type, epoch-hour) reduction the forecast and
    seasonality tables use, then a |types|-row moment aggregate.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    h = ev.groupBy(
        "event_type",
        F.expr("CAST(FLOOR(CAST(ts AS DOUBLE)) AS BIGINT) DIV 3600").alias("hb"),
    ).agg(F.count("*").cast("double").alias("cnt"))
    return (
        h.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            (F.round(F.avg("cnt"), 4) + F.lit(0.0)).alias("mean_per_hour"),
            (
                F.round(
                    F.var_pop("cnt") / F.nullif(F.avg("cnt"), F.lit(0.0)), 4
                )
                + F.lit(0.0)
            ).alias("dispersion_index"),
        )
        .orderBy("event_type")
    )


@_register(
    "nation_trade_flow_matrix",
    oracle="""
    SELECT cn.n_name AS customer_nation,
           sn.n_name AS supplier_nation,
           CAST(COUNT(*) AS BIGINT) AS lines,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                 / 10000.0, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY cn.n_name, sn.n_name
    ORDER BY customer_nation, supplier_nation
    """,
)
def nation_trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full bilateral trade-flow matrix: revenue between every
    (customer nation, supplier nation) pair — TPC-H Q7 generalized from
    two hand-picked nations to the complete matrix, the where-does-value
    flow dashboard.

    Shape: the reference Q7 discipline at matrix scale — lineitem is the
    only fact that streams; orders joins it on the co-partitioned
    orderkey, the two 25-row nation projections carry explicit broadcast
    hints (fixed-size at any SF), and customer/supplier join WITHOUT
    hints — both scale with the corpus, so the size-based threshold (not
    an unconditional user hint) decides broadcast vs shuffle. The single
    wide shuffle is the fact-fact equi-join and the rollup is |nations|^2
    map-side-combined groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("customer_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supplier_nation")
    )
    # Integer-cent revenue: prices and discounts are 2-decimal values, so
    # ROUND(x*100) recovers exact integer cents/percent identically in both
    # engines; the BIGINT summation is then exact regardless of sum order
    # (a double SUM rounded to cents flipped a half-cent boundary at the
    # smoke scale, and per-row double->DECIMAL casts tie-round differently
    # across engines).
    rev = F.expr(
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("customer_nation", "supplier_nation")
        .agg(
            F.count("*").cast("bigint").alias("lines"),
            F.round(F.sum(rev) / 10000.0, 2).alias("revenue"),
        )
        .orderBy("customer_nation", "supplier_nation")
    )


@_register(
    "customers_fuzzy_match",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             length(c_name) AS ln,
             substr(c_name, 1, CAST(floor(length(c_name) / 2) AS INTEGER)) AS lh,
             substr(c_name, CAST(floor(length(c_name) / 2) AS INTEGER) + 1) AS rh,
             substr(c_name, 1,
                    CAST(floor((length(c_name) - 1) / 2) AS INTEGER)) AS plh,
             substr(c_name,
                    CAST(floor((length(c_name) - 1) / 2) AS INTEGER) + 2) AS prh
      FROM customer
    ),
    cand AS (
      SELECT a.c_custkey AS ck_a, b.c_custkey AS ck_b,
             a.c_name AS name_a, b.c_name AS name_b,
             a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.ln = b.ln AND a.lh = b.lh
       AND a.c_custkey < b.c_custkey
      UNION
      SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name,
             a.c_mktsegment, b.c_mktsegment
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.ln = b.ln AND a.rh = b.rh
       AND a.c_custkey < b.c_custkey
      UNION
      SELECT LEAST(s.c_custkey, l.c_custkey),
             GREATEST(s.c_custkey, l.c_custkey),
             CASE WHEN s.c_custkey < l.c_custkey THEN s.c_name ELSE l.c_name END,
             CASE WHEN s.c_custkey < l.c_custkey THEN l.c_name ELSE s.c_name END,
             CASE WHEN s.c_custkey < l.c_custkey
                  THEN s.c_mktsegment ELSE l.c_mktsegment END,
             CASE WHEN s.c_custkey < l.c_custkey
                  THEN l.c_mktsegment ELSE s.c_mktsegment END
      FROM c s JOIN c l
        ON s.c_nationkey = l.c_nationkey AND l.ln = s.ln + 1 AND s.lh = l.plh
      UNION
      SELECT LEAST(s.c_custkey, l.c_custkey),
             GREATEST(s.c_custkey, l.c_custkey),
             CASE WHEN s.c_custkey < l.c_custkey THEN s.c_name ELSE l.c_name END,
             CASE WHEN s.c_custkey < l.c_custkey THEN l.c_name ELSE s.c_name END,
             CASE WHEN s.c_custkey < l.c_custkey
                  THEN s.c_mktsegment ELSE l.c_mktsegment END,
             CASE WHEN s.c_custkey < l.c_custkey
                  THEN l.c_mktsegment ELSE s.c_mktsegment END
      FROM c s JOIN c l
        ON s.c_nationkey = l.c_nationkey AND l.ln = s.ln + 1 AND s.rh = l.prh
    )
    SELECT ck_a AS custkey_a, ck_b AS custkey_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_distance,
           seg_a = seg_b AS same_segment
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY custkey_a, custkey_b
    """,
)
def customers_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: near-duplicate customer records by edit distance,
    found through complete four-pass half-string blocking — never an
    all-pairs compare.

    Blocking correctness is a pigeonhole fact, not a heuristic. Equal-length
    pairs within Levenshtein distance 1 differ by at most one substitution,
    so they agree exactly on the left half OR the right half: pass A blocks
    on (nation, length, left half), pass B on (nation, length, right half).
    Cross-length lev=1 pairs are one insertion/deletion apart: if the longer
    string (length L+1) deletes position p to give the shorter (length L),
    then with h = floor(L/2) either p >= h (both share the first h chars) or
    p < h (both share the last L-h chars, shifted by one in the longer). So
    pass C blocks short.prefix(h) = long.prefix(h) and pass D blocks
    short.suffix(L-h) = long.suffix(L-h), with the long side's keys computed
    from ln-1 so all four passes stay pure equi-joins. The union is EXACTLY
    the lev<=1 pair set within a nation — recall 1.0 with near-linear
    candidate volume (each block is a handful of rows). UNION (set) dedups
    pairs caught by multiple passes.

    At 100 TB: all four passes are equi-joins that shuffle on the block key,
    so candidate enumeration is per-block quadratic but corpus-linear (block
    sizes are bounded by key entropy; extend to mid-third blocking for
    lev<=2). The expensive verifier (levenshtein, JVM builtin) runs on
    candidates only — the MinHash-ladder discipline applied to entity
    resolution.
    """
    c = load_table(spark, sf_dir, "customer")
    half = "CAST(floor(length(c_name) / 2) AS INT)"
    phalf = "CAST(floor((length(c_name) - 1) / 2) AS INT)"
    base = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.length("c_name").alias("ln"),
        F.expr(f"substring(c_name, 1, {half})").alias("lh"),
        F.expr(f"substring(c_name, {half} + 1)").alias("rh"),
        # keys for the "longer side" role of the cross-length passes: the
        # halves a string of length ln exposes to a partner of length ln-1
        F.expr(f"substring(c_name, 1, {phalf})").alias("plh"),
        F.expr(f"substring(c_name, {phalf} + 2)").alias("prh"),
    )

    def _side(prefix: str, ln_expr, key: str) -> DataFrame:
        return base.select(
            F.col("c_custkey").alias(f"ck_{prefix}"),
            F.col("c_name").alias(f"name_{prefix}"),
            F.col("c_mktsegment").alias(f"seg_{prefix}"),
            F.col("c_nationkey").alias("nk"),
            ln_expr.alias("lnj"),
            F.col(key).alias("blk"),
        )

    def _pass(key: str) -> DataFrame:
        a = _side("a", F.col("ln"), key)
        b = _side("b", F.col("ln"), key)
        return (
            a.join(b, ["nk", "lnj", "blk"])
            .filter(F.col("ck_a") < F.col("ck_b"))
            .select("ck_a", "ck_b", "name_a", "name_b", "seg_a", "seg_b")
        )

    def _xpass(short_key: str, long_key: str) -> DataFrame:
        # short role joins at lnj = ln + 1 against the long role's own ln,
        # so l.ln == s.ln + 1 rides the equi-key (no inequality predicate).
        s = _side("s", F.col("ln") + F.lit(1), short_key)
        long_side = _side("l", F.col("ln"), long_key)
        j = s.join(long_side, ["nk", "lnj", "blk"])
        lt = F.col("ck_s") < F.col("ck_l")
        return j.select(
            F.least("ck_s", "ck_l").alias("ck_a"),
            F.greatest("ck_s", "ck_l").alias("ck_b"),
            F.when(lt, F.col("name_s")).otherwise(F.col("name_l")).alias("name_a"),
            F.when(lt, F.col("name_l")).otherwise(F.col("name_s")).alias("name_b"),
            F.when(lt, F.col("seg_s")).otherwise(F.col("seg_l")).alias("seg_a"),
            F.when(lt, F.col("seg_l")).otherwise(F.col("seg_s")).alias("seg_b"),
        )

    cand = (
        _pass("lh")
        .unionByName(_pass("rh"))
        .unionByName(_xpass("lh", "plh"))
        .unionByName(_xpass("rh", "prh"))
        .distinct()
    )
    return (
        cand.filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            F.col("ck_a").alias("custkey_a"),
            F.col("ck_b").alias("custkey_b"),
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_distance"),
            (F.col("seg_a") == F.col("seg_b")).alias("same_segment"),
        )
        .orderBy("custkey_a", "custkey_b")
    )


@_register(
    "events_scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS is_head
      FROM ordered
    ),
    agg AS (
      SELECT user_id, run_id, MIN(event_type) AS state,
             MIN(ts) AS valid_from, COUNT(*) AS run_events
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, state,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(run_events AS BIGINT) AS run_events,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
             AS is_current
    FROM agg
    ORDER BY user_id, run_id
    """,
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build from an event
    stream: collapse each user's consecutive same-state runs into
    [valid_from, valid_to) rows, open-ended for the current state — the CDC
    history table every warehouse keeps for dimension attributes.

    Single-shuffle shape: the lag/run-numbering window, the per-run
    aggregation, and the lead(valid_to) stitch are ALL keyed by user_id (the
    run aggregation on its superset (user_id, run_id), which hash(user_id)
    partitioning already satisfies), so the plan holds one exchange on
    user_id and re-sorts between steps. Per-user window state is O(1); runs
    collapse map-side before the aggregate's exchange.

    At 100 TB: state scales with active users per partition, not events;
    appends re-derive only the open tail if the source is day-partitioned
    (process days >= the previous watermark, carry the open runs forward).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    head = (prev.isNull() | (prev != F.col("event_type"))).cast("int")
    runs = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "run_id",
        F.sum(head).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    agg = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").cast("bigint").alias("run_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from").over(wl)
    return (
        agg.select(
            "user_id",
            F.col("run_id").cast("bigint").alias("run_id"),
            "state",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            "run_events",
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "run_id")
    )


@_register(
    "events_attribution",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                  AS BIGINT) AS campaign
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT p.event_id AS conv_id, c.campaign,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts, c.event_id) AS r,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n
      FROM clicks c JOIN purch p
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND c.ts > p.ts - INTERVAL 7 DAY
      WHERE c.campaign IS NOT NULL
    )
    SELECT campaign,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS conversions_first,
           CAST(SUM(CASE WHEN r = n THEN 1 ELSE 0 END) AS BIGINT)
             AS conversions_last,
           CAST(SUM(1000000 // n) AS BIGINT) AS linear_credit_micro
    FROM touch
    GROUP BY campaign
    ORDER BY campaign
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: every purchase distributes credit
    over the same user's clicks in the preceding 7 days under three models at
    once — first-touch, last-touch, and linear — rolled up per campaign (the
    click's ``props.k``).

    The linear share is computed as the integer floor 1000000 // n_touches
    per touch, so the per-campaign totals are exact int64 sums both engines
    agree on (a double 1/n summed in different orders would not be).

    Shape: one equi-join on user_id carrying the range predicate (per-user
    touch fan-out is bounded by a user's 7-day click volume), then two
    windows keyed by the conversion id — a superset of nothing, but
    conversion-sized state — and a |campaigns|-row rollup. At 100 TB the
    range join gets a day-bucket pre-key ((user_id, day) with a 7-entry day
    explode on the purchase side) to bound probe width; the credit math is
    unchanged. Purchases with zero in-window clicks drop out (inner join) —
    attribution reports credit for ATTRIBUTABLE conversions by design.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_eid"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
        F.expr(
            "CAST(ROUND(TRY_CAST(get_json_object(props, '$.k') AS DOUBLE))"
            " AS BIGINT)"
        ).alias("campaign"),
    ).filter(F.col("campaign").isNotNull())
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    touch = clicks.join(
        purch,
        (F.col("c_uid") == F.col("p_uid"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    wr = Window.partitionBy("conv_id").orderBy("c_ts", "c_eid")
    wn = Window.partitionBy("conv_id")
    ranked = touch.select(
        "conv_id",
        "campaign",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wn).alias("n"),
    )
    return (
        ranked.groupBy("campaign")
        .agg(
            F.count("*").cast("bigint").alias("touches"),
            F.sum((F.col("r") == 1).cast("int")).cast("bigint").alias(
                "conversions_first"
            ),
            F.sum((F.col("r") == F.col("n")).cast("int")).cast("bigint").alias(
                "conversions_last"
            ),
            F.sum(F.expr("1000000 DIV n")).cast("bigint").alias(
                "linear_credit_micro"
            ),
        )
        .orderBy("campaign")
    )


# --- Benford first-digit data-quality audit (round 8) -----------------------

_BENFORD_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(ROUND(abs(value) * 1000000) AS BIGINT) AS micro
  FROM events WHERE value IS NOT NULL
),
d AS (
  SELECT event_type,
         CAST(substr(CAST(micro AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM m WHERE micro > 0
),
cnt AS (SELECT event_type, digit, COUNT(*) AS n FROM d
        GROUP BY event_type, digit),
tot AS (SELECT event_type, COUNT(*) AS total FROM d GROUP BY event_type)
SELECT c.event_type, CAST(c.digit AS BIGINT) AS digit,
       CAST(c.n AS BIGINT) AS n,
       ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
       ROUND(ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS benford_share,
       CAST(ROUND((CAST(c.n AS DOUBLE) / t.total
                   - ln(1.0 + 1.0 / c.digit) / ln(10.0)) * 1000000) AS BIGINT)
         AS dev_micro
FROM cnt c JOIN tot t ON t.event_type = c.event_type
ORDER BY c.event_type, c.digit
"""


@_register("events_benford_audit", oracle=_BENFORD_ORACLE)
def events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the event value column, per event
    type: observed first-significant-digit shares against the Benford
    expectation log10(1 + 1/d) — the classic fabricated/synthetic/defaulted
    numeric-column detector (naturally occurring multiplicative quantities
    follow Benford; uniform generators, hard-coded defaults, and truncated
    feeds do not, and their deviation profile says which). Complements the
    z-score anomaly op: that flags outlier VALUES, this flags distribution-
    shape fraud that individual values never show.

    First-digit extraction never touches float log10 (whose last-ulp
    placement near powers of ten differs between engines): values quantize
    to integer micro-units by the ONE shared ROUND, and the first digit of
    that int64 falls out of exact integer-to-string conversion — identical
    in every engine. Benford expectation and deviation take ln() on
    identical doubles with one shared division/round — micro-unit int64
    deviations, engine-order independent.

    Shape: map-only projection to (event_type, digit), then two map-side-
    combined rollups bounded by |event_types| x 9 rows. One corpus-shaped
    exchange of narrow pairs; value range is unconstrained (any int64
    micro magnitude).
    """
    ev = load_table(spark, sf_dir, "events")
    micro = F.expr("CAST(ROUND(abs(value) * 1000000) AS BIGINT)")
    d = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", micro.alias("micro"))
        .filter(F.col("micro") > 0)
        .select(
            "event_type",
            F.substring(F.col("micro").cast("string"), 1, 1).cast("int").alias(
                "digit"
            ),
        )
    )
    cnt = d.groupBy("event_type", "digit").agg(F.count("*").alias("n"))
    tot = d.groupBy("event_type").agg(F.count("*").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    benford = F.expr("ln(1.0 + 1.0 / digit) / ln(10.0)")
    return (
        cnt.join(tot, "event_type")
        .select(
            "event_type",
            F.col("digit").cast("bigint").alias("digit"),
            F.col("n").cast("bigint").alias("n"),
            F.round(share, 6).alias("share"),
            F.round(benford, 6).alias("benford_share"),
            F.expr(
                "CAST(ROUND((CAST(n AS DOUBLE) / total"
                " - ln(1.0 + 1.0 / digit) / ln(10.0)) * 1000000) AS BIGINT)"
            ).alias("dev_micro"),
        )
        .orderBy("event_type", "digit")
    )


# --- MATCH_RECOGNIZE-style sequence patterns (round 8) -----------------------

_MATCH_ORACLE = """
WITH seqs AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT) AS n_converted,
       CAST(COALESCE(list_max(list_transform(regexp_extract_all(seq, 'vc+p'),
                                             m -> length(m))), 0) AS BIGINT)
         AS longest_match,
       CAST(len(regexp_extract_all(seq, 'vc+e')) AS BIGINT) AS n_abandoned
FROM seqs
ORDER BY user_id
"""


@_register("events_match_pattern", oracle=_MATCH_ORACLE)
def events_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-sequence pattern detection (the SQL:2016
    feature Trino/Flink expose; Spark has no native operator, so the engine
    compiles the pattern onto a per-key ordered event string): per user,
    non-overlapping greedy matches of view->click+->purchase (a converting
    engagement run — contiguity means no error/signup interrupts it, the
    NEXT-row semantics of MATCH_RECOGNIZE's PATTERN (V C+ P)), the longest
    such run, and the abandonment twin view->click+->error. events_top_paths
    ranks fixed 3-grams; this matches variable-length anchored patterns
    with Kleene closure.

    Shape: ONE exchange on user_id builds each user's time-ordered
    type-letter sequence (sort_array over in-row structs — the aggregation
    state is the user's own event count, the same bound sessionization
    carries); pattern matching is a map-side regex over the compact
    sequence (5 event types -> 1 char each, so a 10k-event user is a 10 kB
    string). At 100 TB the sequence build keys on (user_id, day) with
    cross-midnight stitching — the standard MATCH_RECOGNIZE partitioning —
    and the regex pass is unchanged. Non-overlapping leftmost-greedy match
    enumeration is identical in Java and DuckDB regex engines for
    anchored-alternation-free patterns like these; all outputs are exact
    integers.
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("ch")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda s: s.getField("ch")
                ),
                "",
            ).alias("seq"),
        )
    )
    conv = F.regexp_extract_all(F.col("seq"), F.lit("vc+p"), F.lit(0))
    aband = F.regexp_extract_all(F.col("seq"), F.lit("vc+e"), F.lit(0))
    return (
        seqs.select(
            "user_id",
            "n_events",
            F.size(conv).cast("bigint").alias("n_converted"),
            F.coalesce(
                F.array_max(F.transform(conv, F.length)), F.lit(0)
            ).cast("bigint").alias("longest_match"),
            F.size(aband).cast("bigint").alias("n_abandoned"),
        )
        .orderBy("user_id")
    )


# --- closed-form OLS regression aggregate (round 8) --------------------------

# Shared verbatim sub-expressions over the exact integer moment sums
# (n, sx, sy, sxy, sxx, syy) so every double op associates identically.
_OLS_NUM = "((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy))"
_OLS_DENX = "((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * sx))"
_OLS_DENY = "((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy))"

_REGRESSION_ORACLE = f"""
WITH xy AS (
  SELECT CAST(ROUND(l.l_quantity) AS BIGINT) AS x,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS y
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0
            THEN CAST(ROUND(({_OLS_NUM} / {_OLS_DENX}) * 1000000) AS BIGINT)
            ELSE NULL END AS slope_micro,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0
            THEN CAST(ROUND(((CAST(sy AS DOUBLE)
                              - (({_OLS_NUM} / {_OLS_DENX}) * sx)) / n)
                            * 1000000) AS BIGINT)
            ELSE NULL END AS intercept_micro,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0 AND {_OLS_DENY} > 0
            THEN CAST(ROUND((({_OLS_NUM} * {_OLS_NUM})
                             / ({_OLS_DENX} * {_OLS_DENY})) * 1000000) AS BIGINT)
            ELSE NULL END AS r2_micro
FROM m
"""


@_register("lineitem_ship_latency_regression", oracle=_REGRESSION_ORACLE)
def lineitem_ship_latency_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares regression as ONE aggregation: fit ship
    latency (days from order date to line ship date) against line quantity
    from the five closed-form moment sums — slope, intercept, and r² in a
    single corpus pass with no iteration and no per-row model state. The
    template for any do-big-quantities-ship-slower / trend-over-covariate
    question a warehouse answers: swap (x, y) projections, the aggregate
    is unchanged.

    Scale shape: x and y are small exact integers, so all five moment sums
    are exact int64 map-side-combined aggregates over the fact join (the
    single-shuffle orders-lineitem equi-join every TPC-H op uses); the
    closed-form division happens once on the final one-row result. Float
    discipline: doubles enter only AFTER aggregation, in shared verbatim
    expressions over exactly-equal integers; variance-zero and n<2
    degeneracies return NULL identically in both engines.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    xy = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("x"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("y"),
    )
    m = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    ok = F.expr(f"n >= 2 AND {_OLS_DENX} > 0")
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.when(
            ok,
            F.expr(f"CAST(ROUND(({_OLS_NUM} / {_OLS_DENX}) * 1000000) AS BIGINT)"),
        ).alias("slope_micro"),
        F.when(
            ok,
            F.expr(
                f"CAST(ROUND(((CAST(sy AS DOUBLE)"
                f" - (({_OLS_NUM} / {_OLS_DENX}) * sx)) / n) * 1000000) AS BIGINT)"
            ),
        ).alias("intercept_micro"),
        F.when(
            ok & F.expr(f"{_OLS_DENY} > 0"),
            F.expr(
                f"CAST(ROUND((({_OLS_NUM} * {_OLS_NUM})"
                f" / ({_OLS_DENX} * {_OLS_DENY})) * 1000000) AS BIGINT)"
            ),
        ).alias("r2_micro"),
    )


_TYPE_TREND_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
xy AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x,
         CAST(cnt AS BIGINT) AS y
  FROM daily
),
m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM xy GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0
            THEN CAST(ROUND(({_OLS_NUM} / {_OLS_DENX}) * 1000000) AS BIGINT)
            ELSE NULL END AS slope_micro,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0
            THEN CAST(ROUND(((CAST(sy AS DOUBLE)
                              - (({_OLS_NUM} / {_OLS_DENX}) * sx)) / n)
                            * 1000000) AS BIGINT)
            ELSE NULL END AS intercept_micro,
       CASE WHEN n >= 2 AND {_OLS_DENX} > 0 AND {_OLS_DENY} > 0
            THEN CAST(ROUND((({_OLS_NUM} * {_OLS_NUM})
                             / ({_OLS_DENX} * {_OLS_DENY})) * 1000000) AS BIGINT)
            ELSE NULL END AS r2_micro
FROM m ORDER BY event_type
"""


@_register("events_type_trend_ols", oracle=_TYPE_TREND_ORACLE)
def events_type_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED closed-form OLS: one trend line PER EVENT TYPE over its
    daily volume — slope (events/day drift, micro-units), intercept, and
    r² for every category in one pass, the grouped twin of
    lineitem_ship_latency_regression (VERDICT r9's named growth
    candidate). The question it answers is the ops staple "which event
    types are growing/decaying, and how linearly": CUSUM finds WHERE one
    series' level moved; this ranks ALL series by direction and fit.
    x is the absolute epoch day, so slopes are comparable across types
    whose active day ranges differ.

    Scale shape: the corpus collapses to the bounded (|types| x |days|)
    daily rollup in one map-side-combined aggregation; the five moment
    sums are exact int64 aggregates OF that table grouped by type (the
    group-by column simply rides the same closed-form machinery); doubles
    enter only in the final per-group select, in the verbatim shared
    sub-expressions, so engines agree bit-for-bit. Degenerate groups
    (single active day -> zero x-variance) return NULL identically.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    xy = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.col("cnt").cast("bigint").alias("y"),
    )
    m = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    ok = F.expr(f"n >= 2 AND {_OLS_DENX} > 0")
    return (
        m.select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.when(
                ok,
                F.expr(
                    f"CAST(ROUND(({_OLS_NUM} / {_OLS_DENX}) * 1000000) AS BIGINT)"
                ),
            ).alias("slope_micro"),
            F.when(
                ok,
                F.expr(
                    f"CAST(ROUND(((CAST(sy AS DOUBLE)"
                    f" - (({_OLS_NUM} / {_OLS_DENX}) * sx)) / n) * 1000000)"
                    f" AS BIGINT)"
                ),
            ).alias("intercept_micro"),
            F.when(
                ok & F.expr(f"{_OLS_DENY} > 0"),
                F.expr(
                    f"CAST(ROUND((({_OLS_NUM} * {_OLS_NUM})"
                    f" / ({_OLS_DENX} * {_OLS_DENY})) * 1000000) AS BIGINT)"
                ),
            ).alias("r2_micro"),
        )
        .orderBy("event_type")
    )


# --- chi-square independence audit (round 8) ---------------------------------

_CHI2_ORACLE = """
WITH d AS (
  SELECT event_type, isodow(ts) AS dow FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
obs AS (SELECT event_type, dow, COUNT(*) AS o FROM d GROUP BY event_type, dow),
rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY dow),
tot AS (SELECT SUM(o) AS t FROM obs),
grid AS (
  SELECT rt.event_type, ct.dow, rt.r, ct.c, COALESCE(obs.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.dow = ct.dow
),
cells AS (
  SELECT CAST(ROUND((((CAST(o AS DOUBLE)
                       - ((CAST(r AS DOUBLE) * c) / t))
                      * (CAST(o AS DOUBLE) - ((CAST(r AS DOUBLE) * c) / t)))
                     / ((CAST(r AS DOUBLE) * c) / t)) * 1000000) AS BIGINT)
           AS term_micro
  FROM grid CROSS JOIN tot
)
SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n_events,
       CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_types,
       CAST((SELECT COUNT(*) FROM ct) AS BIGINT) AS n_days,
       CAST(((SELECT COUNT(*) FROM rt) - 1)
            * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
       CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
FROM cells
"""


@_register("events_type_dow_chi2", oracle=_CHI2_ORACLE)
def events_type_dow_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit between event type and ISO day-of-week:
    is the event mix stable across weekdays, or does some type concentrate
    (deploy-day error bursts, weekend bot traffic)? The classic
    contingency-table test as a warehouse aggregate — observed cell counts
    vs the independence expectation row·col/total, chi² = Σ(o-e)²/e over
    the FULL type×dow grid (zero-observed cells included, built by
    crossing the two bounded margin tables, never by enumerating data).

    Scale shape: one map-side-combined rollup to |types|×7 observed cells;
    margins and the grand total are rollups OF that table; the grid cross
    join multiplies two BOUNDED dimension tables (allowlisted — margins,
    not data relations). Float discipline: expectations and cell terms are
    shared verbatim double expressions over exact integers, quantized to
    micro-units PER CELL before the int64 sum, so the 35-term addition
    order cannot diverge between engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.select("event_type", F.expr("weekday(ts) + 1").alias("dow"))
    obs = d.groupBy("event_type", "dow").agg(F.count("*").alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("t"))
    grid = (
        rt.crossJoin(ct)
        .join(obs, ["event_type", "dow"], "left")
        .select("event_type", "dow", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
    )
    term = F.expr(
        "CAST(ROUND((((CAST(o AS DOUBLE) - ((CAST(r AS DOUBLE) * c) / t))"
        " * (CAST(o AS DOUBLE) - ((CAST(r AS DOUBLE) * c) / t)))"
        " / ((CAST(r AS DOUBLE) * c) / t)) * 1000000) AS BIGINT)"
    )
    cells = grid.crossJoin(F.broadcast(tot)).select(term.alias("term_micro"))
    stats = cells.agg(F.sum("term_micro").cast("bigint").alias("chi2_micro"))
    dims = (
        rt.agg(F.count("*").alias("nt"))
        .crossJoin(ct.agg(F.count("*").alias("nd")))
        .crossJoin(tot)
    )
    return dims.crossJoin(F.broadcast(stats)).select(
        F.col("t").cast("bigint").alias("n_events"),
        F.col("nt").cast("bigint").alias("n_types"),
        F.col("nd").cast("bigint").alias("n_days"),
        ((F.col("nt") - 1) * (F.col("nd") - 1)).cast("bigint").alias("dof"),
        "chi2_micro",
    )


# --- day-of-week seasonal decomposition (round 8) ----------------------------

_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, isodow(CAST(ts AS DATE)) AS dow,
         COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
tr AS (
  SELECT d, dow, n,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(n) OVER w AS DOUBLE) / 7 END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT dow, n,
         CAST(ROUND((CAST(n AS DOUBLE) - trend) * 1000000) AS BIGINT)
           AS detr_micro
  FROM tr
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(detr_micro) AS BIGINT) AS days_estimated,
       ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS avg_daily_events,
       CAST(ROUND(CAST(SUM(detr_micro) AS DOUBLE) / COUNT(detr_micro))
            AS BIGINT) AS seasonal_micro
FROM det GROUP BY dow ORDER BY dow
"""


@_register("events_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily event series (the
    moving-average method behind STL's initial pass — public method):
    trend = centered 7-day moving average, detrended = observed - trend,
    weekly seasonal factor = mean detrended value per ISO day-of-week.
    The table that separates "traffic is growing" from "that's just
    Monday" before any anomaly threshold is set; edge days without a full
    7-day neighborhood are excluded from factor estimation (NULL trend),
    never zero-filled.

    Scale shape: the corpus-sized work is ONE map-side-combined rollup to
    |days| rows; the moving-average window and the dow rollup run on that
    bounded day series (a 100-TB year is 365 rows here — window state is
    trivial by construction). Float discipline: trend is sum/7 on exact
    integer day counts; detrended values quantize to micro-units per day
    before the int64 seasonal sum; one shared division per output row.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
        .select("d", F.expr("weekday(d) + 1").alias("dow"), "n")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "dow",
        "n",
        F.when(
            F.count("*").over(w) == 7, F.sum("n").over(w).cast("double") / 7
        ).alias("trend"),
    )
    det = tr.select(
        "dow",
        "n",
        F.expr(
            "CAST(ROUND((CAST(n AS DOUBLE) - trend) * 1000000) AS BIGINT)"
        ).alias("detr_micro"),
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.count("detr_micro").cast("bigint").alias("days_estimated"),
            F.round(F.sum("n").cast("double") / F.count("*"), 6).alias(
                "avg_daily_events"
            ),
            F.expr(
                "CAST(ROUND(CAST(SUM(detr_micro) AS DOUBLE) / COUNT(detr_micro))"
                " AS BIGINT)"
            ).alias("seasonal_micro"),
        )
        .select(
            F.col("dow").cast("bigint").alias("dow"),
            "n_days",
            "days_estimated",
            "avg_daily_events",
            "seasonal_micro",
        )
        .orderBy("dow")
    )


# --- revenue concentration (Pareto/decile) audit (round 8) --------------------

_PARETO_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT o_custkey, cents,
         NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM rev
),
d AS (
  SELECT decile, COUNT(*) AS n_customers, SUM(cents) AS revenue_cents
  FROM rk GROUP BY decile
),
c AS (
  SELECT decile, n_customers, revenue_cents,
         SUM(revenue_cents) OVER (ORDER BY decile
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents,
         SUM(revenue_cents) OVER () AS total_cents
  FROM d
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(cum_cents AS BIGINT) AS cum_revenue_cents,
       ROUND(CAST(cum_cents AS DOUBLE) / total_cents, 6) AS cum_share
FROM c ORDER BY decile
"""


@_register("orders_revenue_pareto", oracle=_PARETO_ORACLE)
def orders_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration audit: customers ranked into spend deciles
    (highest first) with each decile's revenue and the cumulative share —
    the Pareto "top 10% of customers carry X% of revenue" curve behind
    account-tier and capacity decisions, and (read as a data-quality
    signal) the skew profile that says whether a per-customer join needs
    salting. customer_spend_quartiles codes individual customers; this is
    the corpus-level concentration CURVE.

    Money stays exact: o_totalprice quantizes to integer cents by the one
    shared ROUND (TPC-H prices carry two decimals, so this is lossless),
    and every sum — per customer, per decile, cumulative — is an int64
    sum both engines agree on; the only double is the final share
    division. The per-customer rollup combines map-side; NTILE runs on
    the customer-cardinality aggregate (at 100 TB swap in percentile-
    boundary bucketing to avoid the single-partition rank — the decile
    CONTENTS are identical, and the cumulative arithmetic is unchanged);
    decile rows are ten, so the cumulative windows are trivial.
    """
    o = load_table(spark, sf_dir, "orders")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("cents")
        )
    )
    rk = rev.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy(F.col("cents").desc(), "o_custkey"))
        .alias("decile"),
    )
    d = rk.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("cents").alias("revenue_cents")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        d.select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
            F.sum("revenue_cents").over(wc).cast("bigint").alias("cum_revenue_cents"),
            F.round(
                F.sum("revenue_cents").over(wc).cast("double")
                / F.sum("revenue_cents").over(wt),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# --- seasonal residual outliers (round 8) -------------------------------------

_SEASONAL_RESID_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, isodow(CAST(ts AS DATE)) AS dow, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
tr AS (
  SELECT d, dow, n,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(n) OVER w AS DOUBLE) / 7 END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT d, dow, n,
         CAST(ROUND((CAST(n AS DOUBLE) - trend) * 1000000) AS BIGINT)
           AS detr_micro
  FROM tr WHERE trend IS NOT NULL
),
season AS (
  SELECT dow,
         CAST(ROUND(CAST(SUM(detr_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS s_micro
  FROM det GROUP BY dow
),
resid AS (
  SELECT det.d, det.dow, det.n,
         det.detr_micro - season.s_micro AS r_micro
  FROM det JOIN season ON season.dow = det.dow
),
mom AS (
  SELECT COUNT(*) AS cnt, SUM(r_micro) AS sr, SUM(r_micro * r_micro) AS srr
  FROM resid
)
SELECT strftime(r.d, '%Y-%m-%d') AS day, CAST(r.dow AS BIGINT) AS dow,
       CAST(r.n AS BIGINT) AS n_events,
       CAST(r.r_micro AS BIGINT) AS residual_micro,
       CASE WHEN cnt >= 2
                 AND ((CAST(srr AS DOUBLE) / cnt)
                      - ((CAST(sr AS DOUBLE) / cnt) * (CAST(sr AS DOUBLE) / cnt)))
                     > 0
            THEN CAST(ROUND(((CAST(r_micro AS DOUBLE) - (CAST(sr AS DOUBLE) / cnt))
                             / sqrt((CAST(srr AS DOUBLE) / cnt)
                                    - ((CAST(sr AS DOUBLE) / cnt)
                                       * (CAST(sr AS DOUBLE) / cnt))))
                            * 1000000) AS BIGINT)
            ELSE NULL END AS z_micro
FROM resid r CROSS JOIN mom
ORDER BY day
"""


@_register("events_seasonal_residual_outliers", oracle=_SEASONAL_RESID_ORACLE)
def events_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anomaly output of the seasonal decomposition: per day, the
    residual after removing BOTH the centered-MA trend and the day-of-week
    factor, z-scored against the residual population — the alarm that
    fires on a genuinely unusual Tuesday instead of on every Sunday
    (events_anomaly_zscore scores raw values; this scores what trend and
    weekly shape cannot explain). Days without a full 7-day window carry
    no residual and are excluded, never zero-filled.

    Shape: identical to events_seasonal_decompose up to the factor table
    (ONE corpus rollup to |days| rows; everything after runs on that
    bounded series); the residual-moment scalars cross in as a one-row
    broadcast (allowlisted class). Float discipline: residuals are exact
    int64 micro-units (detrended-micro minus factor-micro), moments are
    exact integer sums, and the z expression is shared verbatim with a
    variance>0 guard so degenerate series return NULL identically.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        ev.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
        .select("d", F.expr("weekday(d) + 1").alias("dow"), "n")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    det = (
        daily.select(
            "d",
            "dow",
            "n",
            F.when(
                F.count("*").over(w) == 7, F.sum("n").over(w).cast("double") / 7
            ).alias("trend"),
        )
        .filter(F.col("trend").isNotNull())
        .select(
            "d",
            "dow",
            "n",
            F.expr(
                "CAST(ROUND((CAST(n AS DOUBLE) - trend) * 1000000) AS BIGINT)"
            ).alias("detr_micro"),
        )
    )
    season = det.groupBy("dow").agg(
        F.expr(
            "CAST(ROUND(CAST(SUM(detr_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("s_micro")
    )
    resid = det.join(F.broadcast(season), "dow").select(
        "d", "dow", "n", (F.col("detr_micro") - F.col("s_micro")).alias("r_micro")
    )
    mom = resid.agg(
        F.count("*").alias("cnt"),
        F.sum("r_micro").alias("sr"),
        F.sum(F.col("r_micro") * F.col("r_micro")).alias("srr"),
    )
    var_expr = (
        "((CAST(srr AS DOUBLE) / cnt)"
        " - ((CAST(sr AS DOUBLE) / cnt) * (CAST(sr AS DOUBLE) / cnt)))"
    )
    z = F.when(
        F.expr(f"cnt >= 2 AND {var_expr} > 0"),
        F.expr(
            f"CAST(ROUND(((CAST(r_micro AS DOUBLE) - (CAST(sr AS DOUBLE) / cnt))"
            f" / sqrt({var_expr})) * 1000000) AS BIGINT)"
        ),
    ).otherwise(F.lit(None).cast("bigint"))
    return (
        resid.crossJoin(F.broadcast(mom))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("dow").cast("bigint").alias("dow"),
            F.col("n").cast("bigint").alias("n_events"),
            F.col("r_micro").cast("bigint").alias("residual_micro"),
            z.alias("z_micro"),
        )
        .orderBy("day")
    )


# --- RFM segment migration matrix (round 8) -----------------------------------

_MIGRATION_ORACLE = """
WITH days AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS ed,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
cut AS (SELECT (MIN(ed) + MAX(ed)) // 2 AS c FROM days),
h1 AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY SUM(cents) DESC, o_custkey) AS seg
  FROM days CROSS JOIN cut WHERE ed < c GROUP BY o_custkey
),
h2 AS (
  SELECT o_custkey,
         NTILE(4) OVER (ORDER BY SUM(cents) DESC, o_custkey) AS seg
  FROM days CROSS JOIN cut WHERE ed >= c GROUP BY o_custkey
)
SELECT CAST(COALESCE(h1.seg, 0) AS BIGINT) AS seg_h1,
       CAST(COALESCE(h2.seg, 0) AS BIGINT) AS seg_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
GROUP BY 1, 2 ORDER BY seg_h1, seg_h2
"""


@_register("orders_segment_migration", oracle=_MIGRATION_ORACLE)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifecycle flow: spend-quartile segment in the first half of
    the order history vs the second half, as a migration matrix — upgrades,
    downgrades, churn (segment 0 = absent in that half) and acquisition in
    one 5x5 table. orders_rfm_segments codes customers at one point in
    time; this is the TRANSITION structure retention programs actually act
    on.

    The time cut is the integer midpoint epoch-day of the order span (a
    one-row aggregate broadcast, allowlisted class) — pure integer date
    arithmetic, no calendar/timezone functions to diverge on. Money is
    integer cents; each half's quartile is NTILE over that half's
    per-customer aggregate (customer-cardinality, same scale note as
    orders_revenue_pareto); the matrix is a full outer join of two
    customer-keyed segment tables rolled up to at most 24 cells.
    """
    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).alias("ed"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cut = days.agg(
        ((F.min("ed") + F.max("ed")) / F.lit(2)).cast("bigint").alias("c")
    )

    def _half(pred) -> DataFrame:
        half = (
            days.crossJoin(F.broadcast(cut))
            .filter(pred)
            .groupBy("o_custkey")
            .agg(F.sum("cents").alias("cents"))
        )
        return half.select(
            "o_custkey",
            F.ntile(4)
            .over(Window.orderBy(F.col("cents").desc(), "o_custkey"))
            .alias("seg"),
        )

    h1 = _half(F.col("ed") < F.col("c")).withColumnRenamed("seg", "seg1")
    h2 = _half(F.col("ed") >= F.col("c")).withColumnRenamed("seg", "seg2")
    return (
        h1.join(h2, "o_custkey", "full_outer")
        .select(
            F.coalesce("seg1", F.lit(0)).cast("bigint").alias("seg_h1"),
            F.coalesce("seg2", F.lit(0)).cast("bigint").alias("seg_h2"),
        )
        .groupBy("seg_h1", "seg_h2")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("seg_h1", "seg_h2")
    )


# --- cohort LTV curves (round 8) ----------------------------------------------

_COHORT_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
first AS (SELECT o_custkey, MIN(yr) AS cohort FROM o GROUP BY o_custkey),
sz AS (SELECT cohort, COUNT(*) AS cohort_customers FROM first GROUP BY cohort),
j AS (
  SELECT f.cohort, o.yr - f.cohort AS offset_years, o.cents
  FROM o JOIN first f ON f.o_custkey = o.o_custkey
),
g AS (
  SELECT cohort, offset_years, SUM(cents) AS revenue_cents
  FROM j GROUP BY cohort, offset_years
),
c AS (
  SELECT cohort, offset_years, revenue_cents,
         SUM(revenue_cents) OVER (PARTITION BY cohort ORDER BY offset_years
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM g
)
SELECT CAST(c.cohort AS BIGINT) AS cohort_year,
       CAST(c.offset_years AS BIGINT) AS offset_years,
       CAST(sz.cohort_customers AS BIGINT) AS cohort_customers,
       CAST(c.revenue_cents AS BIGINT) AS revenue_cents,
       CAST(c.cum_cents AS BIGINT) AS cum_revenue_cents,
       CAST(ROUND(CAST(c.cum_cents AS DOUBLE) / sz.cohort_customers) AS BIGINT)
         AS avg_ltv_cents
FROM c JOIN sz ON sz.cohort = c.cohort
ORDER BY cohort_year, offset_years
"""


@_register("orders_cohort_ltv", oracle=_COHORT_LTV_ORACLE)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order year,
    revenue accumulated by years-since-acquisition — the LTV table behind
    payback-period and acquisition-spend decisions, and the longitudinal
    complement of events_cohort_retention (that counts ACTIVITY, this
    counts MONEY). avg_ltv_cents divides by the FULL cohort size, so the
    curve reads as expected value per acquired customer, inactive years
    and all.

    Shape: first-order years are one customer-keyed min; the cohort join
    rides the same key; rollups are cohort x offset bounded (|years|²);
    the cumulative window runs per cohort over at most |years| rows.
    Money is exact integer cents throughout; the single division rounds
    to whole cents through the shared half-up ROUND.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    sz = first.groupBy("cohort").agg(F.count("*").alias("cohort_customers"))
    g = (
        o.join(first, "o_custkey")
        .select("cohort", (F.col("yr") - F.col("cohort")).alias("offset_years"), "cents")
        .groupBy("cohort", "offset_years")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    wc = Window.partitionBy("cohort").orderBy("offset_years").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        g.withColumn("cum_cents", F.sum("revenue_cents").over(wc))
        .join(F.broadcast(sz), "cohort")
        .select(
            F.col("cohort").cast("bigint").alias("cohort_year"),
            F.col("offset_years").cast("bigint").alias("offset_years"),
            F.col("cohort_customers").cast("bigint").alias("cohort_customers"),
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
            F.col("cum_cents").cast("bigint").alias("cum_revenue_cents"),
            F.expr(
                "CAST(ROUND(CAST(cum_cents AS DOUBLE) / cohort_customers)"
                " AS BIGINT)"
            ).alias("avg_ltv_cents"),
        )
        .orderBy("cohort_year", "offset_years")
    )


# --- DAU / WAU / MAU actives (round 8) -----------------------------------------

_ACTIVES_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT ed FROM ud),
dau AS (SELECT ed, COUNT(*) AS dau FROM ud GROUP BY ed),
wau AS (
  SELECT d.ed, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u ON u.ed BETWEEN d.ed - 6 AND d.ed
  GROUP BY d.ed
),
mau AS (
  SELECT d.ed, COUNT(DISTINCT u.user_id) AS mau
  FROM days d JOIN ud u ON u.ed BETWEEN d.ed - 27 AND d.ed
  GROUP BY d.ed
)
SELECT strftime(DATE '1970-01-01' + dau.ed * INTERVAL 1 DAY, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CAST(mau.mau AS BIGINT) AS mau,
       ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN wau ON wau.ed = dau.ed JOIN mau ON mau.ed = dau.ed
ORDER BY day
"""


@_register("events_dau_wau_mau", oracle=_ACTIVES_ORACLE)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-user series: per calendar day, distinct users active that day
    (DAU), in the trailing 7 days (WAU), and in the trailing 28 days (MAU),
    plus the DAU/MAU stickiness ratio — the product-health table every
    engagement dashboard leads with.

    Shape: the corpus reduces ONCE to distinct (user, epoch-day) pairs —
    the only corpus-scale shuffle. Each pair then EXPLODES to the <=28
    trailing report-days it covers (a bounded fan-out, the standard
    sliding-distinct trick that avoids a per-day range self-join over the
    raw events), and windowed actives are map-side-combinable distinct
    counts per (report-day, window). Integer epoch-day arithmetic keeps
    calendar/timezone functions out of the join keys; the date string is
    formatted once for presentation.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ud = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "ed"
        ),
    ).distinct()
    days = ud.select("ed").distinct()
    dau = ud.groupBy("ed").agg(F.count("*").alias("dau"))
    # sliding distinct via bounded explode: (user, day) covers report days
    # day..day+6 (WAU) / day..day+27 (MAU); only days that exist report.
    cover7 = ud.select(
        "user_id", F.explode(F.expr("sequence(ed, ed + 6)")).alias("ed")
    )
    wau = (
        cover7.join(days, "ed")
        .groupBy("ed")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    cover28 = ud.select(
        "user_id", F.explode(F.expr("sequence(ed, ed + 27)")).alias("ed")
    )
    mau = (
        cover28.join(days, "ed")
        .groupBy("ed")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(wau, "ed")
        .join(mau, "ed")
        .select(
            F.date_format(
                F.expr("date_add(DATE '1970-01-01', CAST(ed AS INT))"), "yyyy-MM-dd"
            ).alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# --- ROLLUP hierarchy totals (round 8) ------------------------------------------

_ROLLUP_ORACLE = """
SELECT CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END
         AS nation,
       CASE WHEN GROUPING(c.c_mktsegment) = 1 THEN 'ALL' ELSE c.c_mktsegment END
         AS segment,
       CAST(GROUPING(n.n_name) * 2 + GROUPING(c.c_mktsegment) AS BIGINT)
         AS grouping_level,
       CAST(COUNT(*) AS BIGINT) AS orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
ORDER BY grouping_level, nation, segment
"""


@_register("orders_nation_segment_rollup", oracle=_ROLLUP_ORACLE)
def orders_nation_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals: order counts and revenue at (nation,
    segment), per-nation subtotal, and grand-total levels in ONE pass —
    the drill-down backbone report. Completes the grouping-operator
    family next to orders_status_cube (CUBE) and lineitem_grouping_sets
    (explicit sets): ROLLUP prunes the cross-hierarchy combinations a
    drill-down never reads, so it shuffles fewer cells than CUBE at the
    same fidelity.

    Shape: the bounded nation dimension broadcasts; customer is SF-scaled,
    so its join stays size-gated (broadcast when small, shuffled-hash when
    not — never an unconditional broadcast of a scaled table); then one
    map-side-combined rollup aggregation (Spark plans partial aggregates
    per grouping set in a single Expand + exchange). GROUPING() bits are
    folded into an explicit level column so NULL-valued real segments can
    never be confused with subtotal rows. Money exact in integer cents.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_mktsegment",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    g = j.rollup("n_name", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("orders"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        (F.grouping("n_name") * 2 + F.grouping("c_mktsegment"))
        .cast("bigint")
        .alias("grouping_level"),
    )
    return (
        g.select(
            F.when(F.col("grouping_level") >= 2, "ALL")
            .otherwise(F.col("n_name"))
            .alias("nation"),
            F.when(F.col("grouping_level") % 2 == 1, "ALL")
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
            "grouping_level",
            "orders",
            "revenue_cents",
        )
        .orderBy("grouping_level", "nation", "segment")
    )


# --- conversion latency percentiles (round 8) ----------------------------------

_CONV_LATENCY_ORACLE = """
WITH fc AS (
  SELECT user_id, MIN(ts) AS first_click FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL GROUP BY user_id
),
fp AS (
  SELECT user_id, MIN(ts) AS first_purchase FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY user_id
),
lat AS (
  SELECT CAST(date_diff('second', fc.first_click, fp.first_purchase)
              AS BIGINT) AS sec
  FROM fc JOIN fp ON fp.user_id = fc.user_id
  WHERE fp.first_purchase >= fc.first_click
)
SELECT CAST(COUNT(*) AS BIGINT) AS converters,
       CAST(MIN(sec) AS BIGINT) AS min_sec,
       ROUND(quantile_cont(sec, 0.50), 6) AS p50_sec,
       ROUND(quantile_cont(sec, 0.90), 6) AS p90_sec,
       ROUND(quantile_cont(sec, 0.99), 6) AS p99_sec,
       CAST(MAX(sec) AS BIGINT) AS max_sec
FROM lat
"""


@_register("events_conversion_latency_percentiles", oracle=_CONV_LATENCY_ORACLE)
def events_conversion_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversion-latency DISTRIBUTION: exact p50/p90/p99 of first-click
    to first-purchase seconds across converting users.
    events_conversion_funnel reports the MEAN latency — means hide the
    long tail that SLA and retargeting-window decisions actually read
    (a p99 of three days with a p50 of an hour is a different product
    than a uniform day). Users whose first purchase precedes any click
    are organic converters and excluded, matching the funnel's
    click-then-purchase residual.

    Shape: two per-user MIN aggregations share the user_id exchange (AQE
    reuses it — the conversion-funnel plan); latencies are exact integer
    seconds; the percentile buffers one int per converter (the
    events_value_percentiles scale note applies: swap percentile_approx
    at extreme cardinality). Spark's percentile and DuckDB's
    quantile_cont share the linear-interpolation definition, so the
    oracle matches at 6 dp.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = (
        fc.join(fp, "user_id")
        .filter(F.col("first_purchase") >= F.col("first_click"))
        .select(
            (
                F.unix_timestamp("first_purchase") - F.unix_timestamp("first_click")
            ).cast("bigint").alias("sec")
        )
    )
    return lat.agg(
        F.count("*").cast("bigint").alias("converters"),
        F.min("sec").cast("bigint").alias("min_sec"),
        F.round(F.expr("percentile(sec, 0.50)"), 6).alias("p50_sec"),
        F.round(F.expr("percentile(sec, 0.90)"), 6).alias("p90_sec"),
        F.round(F.expr("percentile(sec, 0.99)"), 6).alias("p99_sec"),
        F.max("sec").cast("bigint").alias("max_sec"),
    )


# --- behavioral bot screening (round 8) -----------------------------------------

_BOT_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
base AS (
  SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
  FROM ev GROUP BY user_id
),
tc AS (SELECT user_id, event_type, COUNT(*) AS c FROM ev
       GROUP BY user_id, event_type),
ent AS (
  SELECT tc.user_id,
         SUM(CAST(ROUND(-(CAST(tc.c AS DOUBLE) / b.n_events)
                        * ln(CAST(tc.c AS DOUBLE) / b.n_events)
                        * 1000000) AS BIGINT)) AS entropy_micro
  FROM tc JOIN base b ON b.user_id = tc.user_id GROUP BY tc.user_id
),
gaps AS (
  SELECT user_id,
         CAST(date_diff('second',
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
              AS BIGINT) AS g
  FROM ev
),
gm AS (
  SELECT user_id, COUNT(g) AS ng, SUM(g) AS sg, SUM(g * g) AS sgg
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
),
j AS (
  SELECT b.user_id, b.n_events, b.active_days, ent.entropy_micro,
         gm.ng, gm.sg, gm.sgg
  FROM base b JOIN ent ON ent.user_id = b.user_id
  LEFT JOIN gm ON gm.user_id = b.user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(active_days AS BIGINT) AS active_days,
       ROUND(CAST(n_events AS DOUBLE) / active_days, 6) AS events_per_day,
       CAST(entropy_micro AS BIGINT) AS type_entropy_micro,
       CASE WHEN ng >= 2 AND sg > 0
            THEN CAST(ROUND((sqrt((CAST(sgg AS DOUBLE) / ng)
                                  - ((CAST(sg AS DOUBLE) / ng)
                                     * (CAST(sg AS DOUBLE) / ng)))
                             / (CAST(sg AS DOUBLE) / ng)) * 1000000) AS BIGINT)
            ELSE NULL END AS gap_cv_micro,
       (CAST(n_events AS DOUBLE) / active_days >= 50.0
        OR (n_events >= 20 AND ng >= 2 AND sg > 0
            AND (sqrt((CAST(sgg AS DOUBLE) / ng)
                      - ((CAST(sg AS DOUBLE) / ng) * (CAST(sg AS DOUBLE) / ng)))
                 / (CAST(sg AS DOUBLE) / ng)) < 0.1)) AS is_bot_suspect
FROM j ORDER BY user_id
"""


@_register("events_bot_screen", oracle=_BOT_ORACLE)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot screening: per user, the three classic automation
    signatures — event rate (events per active day), action diversity
    (Shannon entropy over event types: scripts loop a narrow action set),
    and timing regularity (coefficient of variation of inter-event gaps:
    schedulers fire metronomically, humans don't) — folded into a
    deterministic suspect flag (rate >= 50/day, or >= 20 near-metronomic
    events with gap CV < 0.1). The data-cleaning gate behavioral analytics
    runs BEFORE funnels/attribution/retention, for the same reason corpus
    pipelines run quality filters before dedup.

    Shape: one user-keyed exchange serves the per-user rollup, the
    per-(user, type) counts, and the lag window (all co-keyed); gap
    moments are exact int64 second sums. Float discipline: entropy terms
    take one ln() per exact count ratio and quantize to micro-units
    per term before the int sum; the CV expression is shared verbatim
    with n>=2 / mean>0 guards.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    base = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
    )
    tc = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    ent = (
        tc.join(base.select("user_id", "n_events"), "user_id")
        .select(
            "user_id",
            F.expr(
                "CAST(ROUND(-(CAST(c AS DOUBLE) / n_events)"
                " * ln(CAST(c AS DOUBLE) / n_events) * 1000000) AS BIGINT)"
            ).alias("term"),
        )
        .groupBy("user_id")
        .agg(F.sum("term").alias("entropy_micro"))
    )
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wg)))
        .cast("bigint")
        .alias("g"),
    )
    gm = gaps.filter(F.col("g").isNotNull()).groupBy("user_id").agg(
        F.count("g").alias("ng"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    j = base.join(ent, "user_id").join(gm, "user_id", "left")
    cv = (
        "(sqrt((CAST(sgg AS DOUBLE) / ng)"
        " - ((CAST(sg AS DOUBLE) / ng) * (CAST(sg AS DOUBLE) / ng)))"
        " / (CAST(sg AS DOUBLE) / ng))"
    )
    return (
        j.select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("active_days").cast("bigint").alias("active_days"),
            F.round(F.col("n_events").cast("double") / F.col("active_days"), 6).alias(
                "events_per_day"
            ),
            F.col("entropy_micro").cast("bigint").alias("type_entropy_micro"),
            F.when(
                F.expr("ng >= 2 AND sg > 0"),
                F.expr(f"CAST(ROUND({cv} * 1000000) AS BIGINT)"),
            ).alias("gap_cv_micro"),
            F.expr(
                f"(CAST(n_events AS DOUBLE) / active_days >= 50.0"
                f" OR (n_events >= 20 AND ng >= 2 AND sg > 0 AND {cv} < 0.1))"
            ).alias("is_bot_suspect"),
        )
        .orderBy("user_id")
    )


# --- supplier concentration (HHI) (round 8) --------------------------------------

_HHI_ORACLE = """
WITH s AS (
  SELECT p.p_type, l.l_suppkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type, l.l_suppkey
),
t AS (SELECT p_type, SUM(cents) AS total, COUNT(*) AS suppliers
      FROM s GROUP BY p_type),
h AS (
  SELECT s.p_type,
         SUM(CAST(ROUND((CAST(s.cents AS DOUBLE) / t.total)
                        * (CAST(s.cents AS DOUBLE) / t.total)
                        * 1000000) AS BIGINT)) AS hhi_micro,
         MAX(s.cents) AS top_cents
  FROM s JOIN t ON t.p_type = s.p_type GROUP BY s.p_type
)
SELECT t.p_type, CAST(t.suppliers AS BIGINT) AS suppliers,
       CAST(t.total AS BIGINT) AS revenue_cents,
       CAST(h.hhi_micro AS BIGINT) AS hhi_micro,
       ROUND(CAST(h.top_cents AS DOUBLE) / t.total, 6) AS top_supplier_share
FROM t JOIN h ON h.p_type = t.p_type
ORDER BY t.p_type
"""


@_register("parts_supplier_hhi", oracle=_HHI_ORACLE)
def parts_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per part category: the Herfindahl-Hirschman
    index (sum of squared revenue shares — the antitrust-standard
    concentration metric, 1/N for perfect competition up to 1.0 for
    monopoly, here in micro-units) plus the top supplier's share — the
    supply-chain-risk table procurement reads before single-source
    categories bite.

    Shape: one size-gated fact join (part is SF-scaled — the planner
    broadcasts it while it fits and shuffles when it no longer does), one
    map-side-combined (type, supplier) rollup, then type-bounded
    aggregates.
    Revenue is exact integer cents; each squared share takes the shared
    double expression and quantizes to micro-units per supplier before
    the int64 sum, so the summation order cannot diverge.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    s = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("cents").alias("cents"))
    )
    t = s.groupBy("p_type").agg(
        F.sum("cents").alias("total"), F.count("*").alias("suppliers")
    )
    h = (
        s.join(t.select("p_type", "total"), "p_type")
        .select(
            "p_type",
            F.expr(
                "CAST(ROUND((CAST(cents AS DOUBLE) / total)"
                " * (CAST(cents AS DOUBLE) / total) * 1000000) AS BIGINT)"
            ).alias("term"),
            "cents",
        )
        .groupBy("p_type")
        .agg(F.sum("term").alias("hhi_micro"), F.max("cents").alias("top_cents"))
    )
    return (
        t.join(h, "p_type")
        .select(
            "p_type",
            F.col("suppliers").cast("bigint").alias("suppliers"),
            F.col("total").cast("bigint").alias("revenue_cents"),
            F.col("hhi_micro").cast("bigint").alias("hhi_micro"),
            F.round(F.col("top_cents").cast("double") / F.col("total"), 6).alias(
                "top_supplier_share"
            ),
        )
        .orderBy("p_type")
    )


@_register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT day, n_events,
             ROW_NUMBER() OVER (ORDER BY day) AS idx,
             SUM(n_events) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER () AS d,
             SUM(n_events) OVER () AS t
      FROM daily
    ),
    c AS (
      SELECT day, CAST(n_events AS BIGINT) AS n_events,
             CAST(d * cum - idx * t AS BIGINT) AS cusum_scaled
      FROM s
    )
    SELECT day, n_events, cusum_scaled,
           abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER ()
             AS is_changepoint
    FROM c ORDER BY day
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection on the daily event series (Page's
    cumulative-sum statistic — public method): per day, the cumulative
    deviation from the series mean; the |maximum| marks the most likely
    changepoint (a deploy, a tracking change, a bot wave turning on).
    Complements events_seasonal_residual_outliers: z-scored residuals
    flag SINGLE bad days, the CUSUM peak finds WHERE THE LEVEL MOVED —
    a step change yields mild residuals every day but a sharp CUSUM
    elbow.

    Integer discipline: the textbook statistic sum(n_i - mean) is
    fractional; scaling by the day count D gives
    S_d = D*cumsum(n) - d*T — exact int64 throughout, so the argmax
    boundary cannot float-flip cross-engine (the chi-square/Benford
    convention applied to a time series).

    Shape: the corpus collapses to |days| rows in one map-side-combined
    rollup; every window (rank, running sum, global D/T/max) runs on
    that bounded series — the seasonal-decompose discipline, no one-row
    cross join needed.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    w_ord = Window.orderBy("day")
    w_all = Window.partitionBy()
    s = daily.select(
        "day",
        "n_events",
        F.row_number().over(w_ord).alias("idx"),
        F.sum("n_events").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.count("*").over(w_all).alias("d"),
        F.sum("n_events").over(w_all).alias("t"),
    )
    c = s.select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("d") * F.col("cum") - F.col("idx") * F.col("t"))
        .cast("bigint")
        .alias("cusum_scaled"),
    )
    return c.select(
        "day",
        "n_events",
        "cusum_scaled",
        (
            F.abs("cusum_scaled")
            == F.max(F.abs("cusum_scaled")).over(Window.partitionBy())
        ).alias("is_changepoint"),
    ).orderBy("day")


MAD_K = 3.0  # flag |deviation| > MAD_K * 1.4826 * MAD (the robust 3-sigma)


@_register(
    "events_mad_outliers",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    ),
    med AS (SELECT MEDIAN(n_events) AS med FROM daily),
    dev AS (SELECT day, n_events, n_events - med AS deviation
            FROM daily CROSS JOIN med),
    mad AS (SELECT MEDIAN(ABS(deviation)) AS mad FROM dev)
    SELECT day, CAST(n_events AS BIGINT) AS n_events,
           deviation,
           ROUND(deviation / NULLIF(1.4826 * mad, 0), 6) AS robust_z,
           ABS(deviation) > {MAD_K} * 1.4826 * mad AS is_outlier
    FROM dev CROSS JOIN mad
    ORDER BY day
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume outliers via median absolute deviation — the
    estimator that does NOT move when the outlier it hunts lands in the
    sample (mean/std z-scores inflate their own threshold; median/MAD
    have a 50% breakdown point). The ops-monitoring twin of
    events_seasonal_residual_outliers: that one models seasonality first
    and z-scores what remains; this one is model-free and robust — run
    both, and a day flagged by only one tells you whether the anomaly is
    a level excursion or a seasonality break.

    Cross-engine float discipline: medians of integer counts interpolate
    to half-grain values (exact in binary); deviation and |deviation| are
    exact; the single 1.4826 consistency-constant product is the same
    double expression over identical operands in both engines, so the
    flag boundary cannot drift. try_divide/NULLIF(.,0) agree on the
    all-days-identical corpus (MAD = 0 -> NULL z, no flags).

    Shape: one map-side-combined rollup to |days| rows; both medians are
    one-row aggregates of that bounded series, cross-joined back (the
    dedup_family_compare scalar class).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    med = daily.agg(F.expr("percentile(n_events, 0.5)").alias("med"))
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("n_events") - F.col("med")).alias("deviation"),
    )
    mad = dev.agg(F.expr("percentile(abs(deviation), 0.5)").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "day",
            "n_events",
            "deviation",
            F.round(
                F.try_divide(
                    F.col("deviation"), F.nullif(1.4826 * F.col("mad"), F.lit(0.0))
                ),
                6,
            ).alias("robust_z"),
            (F.abs("deviation") > MAD_K * 1.4826 * F.col("mad")).alias("is_outlier"),
        )
        .orderBy("day")
    )

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


# The driver evaluates the registry in insertion order and caps at the
# first 50 entries.  Union of green rows across rounds = full
# driver-verified coverage: r01∪r02∪r03 drove 128 of the round-3 182
# registry queries green (now 183 with round 4's text_bm25_retrieval;
# each overflow query still holds a green result in the local
# differential harness, tools/check_correctness.py, driver-grade
# compare, vanilla session, at sf0.01 AND sf0.1, plus the
# SPARK_GRAFT_SHUFFLE=7 sweep and the tools/check_types.py width gate).
#
# Round-5 closed the driver-verified union (CORRECTNESS_r05: 50/50 green),
# and CORRECTNESS_r07 re-verified the round-6 debuts + the minhash-rewrite
# set, so every registry query EXCEPT the round-7 debuts holds a
# driver-green row.  The round-8 window:
#   * the 7 round-7 debuts lead — they were never driver-evaluated (the
#     round-7 process miss): each is local-green at sf0.01, on hostile
#     data, under SPARK_GRAFT_SHUFFLE=7, through tools/check_types.py,
#     and now carries a planted-case behavioral test;
#   * the round-8 debuts follow (same debut-window rule);
#   * the remaining slots re-verify the float-adjacent ANN/retrieval
#     family and a sample of every tier (dedup, text/corpus, embedding,
#     multimodal, TPC-H perf-weak set, events analytics).
# Round-9 window: the 16 round-9 debuts lead (debut-window rule), then the
# OLDEST never-re-verified driver rows — the round-1 cohort (last
# driver-green in CORRECTNESS_r01) and the round-2-era events/streaming
# tier — so driver re-verification keeps cycling the whole registry
# (VERDICT r8 item 5).  Every key outside this window holds a driver-green
# row from r01-r08 plus the local full-registry differential at HEAD
# (sf0.01, hostile, SPARK_GRAFT_SHUFFLE=7, sf0.1, vanilla foreign-cwd).
_PRIORITY = (
    # -- NEW round-9 debuts: must be driver-evaluated in their debut window
    "corpus_exact_substring_dedup",
    "corpus_bpe_encode",
    "corpus_bpe_fertility",
    "similarity_ann_ivf_nprobe_sweep",
    "corpus_doc_duplication_fraction",
    "doc_self_repetition_spans",
    "corpus_bpe_merge_curve",
    "corpus_bpe_pack_sequences",
    "corpus_duplication_by_source",
    "similarity_ann_ivfpq",
    "corpus_span_removal_plan",
    "corpus_source_js_divergence",
    "events_cusum_changepoint",
    "events_mad_outliers",
    "dedup_winnowing",
    "retrieval_ndcg_report",
    # -- round-1 cohort: driver-green only in CORRECTNESS_r01 until now
    "count_total",
    "customer_order_gaps",
    "customer_spend_quartiles",
    "customers_without_orders",
    "duplicate_emails",
    "email_domains",
    "lineitem_grouping_sets",
    "orders_status_cube",
    "partition_filter",
    "phone_patterns",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "segment_revenue_salted",
    "suppliers_with_large_lines",
    "top_customers_by_revenue",
    "unique_locations",
    "users_by_city",
    "window_running_revenue",
    # -- round-2-era events/streaming tier (the class VERDICT r8 named)
    "events_asof_purchase",
    "events_conversion_funnel",
    "events_daily_pivot",
    "events_distinct_users",
    "events_hourly_windows",
    "events_props_extract",
    "events_range_join",
    "events_time_rollup",
    "events_value_percentiles",
    "streaming_click_purchase_join",
    "streaming_distinct_pairs",
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_user_stats",
    # (lang_id / pii_redact / multimodal_resize / sample_rows /
    #  catchphrase_usage / same_city_diff_company / company_employees /
    #  user_profiles / top_segments / q16_parts_supplier_counts /
    #  users_with_websites rotate in next round —
    #  each holds an r01/r02 driver green + local greens at HEAD, and each
    #  dropped key's plan CLASS stays sampled by an in-window sibling)
)


def _registries() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    q.update(corpus.CORPUS_QUERIES)
    o.update(corpus.CORPUS_ORACLES)
    for extra in _optional_registries():
        q.update(extra[0])
        o.update(extra[1])
    ordered = [n for n in _PRIORITY if n in q] + [n for n in q if n not in _PRIORITY]
    return {n: q[n] for n in ordered}, {n: o[n] for n in ordered if n in o}


def _optional_registries():
    """Extension modules register (queries, oracles) pairs.

    Imported lazily so one broken extension cannot take down the core corpus
    — but NEVER silently: a failed import means up to ~30 queries vanish
    from the registry, so it is reported loudly on stderr.
    """
    import sys
    import traceback

    out = []
    modpaths = [
        f"data_pipeline_python_aws_cdk_spark.operators.{m}"
        for m in ("analytics", "tpch", "text", "dedup", "similarity", "multimodal", "profiling")
    ] + ["data_pipeline_python_aws_cdk_spark.streaming.events"]
    for modpath in modpaths:
        try:
            mod = __import__(modpath, fromlist=["QUERIES", "ORACLES"])
            out.append((getattr(mod, "QUERIES", {}), getattr(mod, "ORACLES", {})))
        except Exception:  # noqa: BLE001 — any failure here loses queries
            print(
                f"ERROR: extension registry {modpath} failed to import; "
                "its queries are MISSING from the registry:\n"
                + traceback.format_exc(),
                file=sys.stderr,
            )
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

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
_PRIORITY = (
    # -- round-7 debuts: never driver-evaluated, must lead this window
    "customers_fuzzy_match",
    "events_scd2_user_state",
    "events_attribution",
    "corpus_dsir_weights",
    "text_nb_quality_classify",
    "corpus_duplicate_passages",
    "embedding_cluster_profiles",
    # -- NEW round-8 debuts: must be driver-evaluated in their debut window
    "dedup_prefix_filter_join",
    "embedding_silhouette",
    "dedup_quality_survivors",
    "corpus_heaps_law",
    "corpus_topic_mix",
    "events_benford_audit",
    "corpus_cooccurrence_pmi",
    "events_match_pattern",
    "text_kn_bigram_lm",
    "lineitem_ship_latency_regression",
    "events_type_dow_chi2",
    "events_seasonal_decompose",
    "streaming_scd2_state",
    "orders_revenue_pareto",
    "corpus_dedup_cascade_report",
    "events_seasonal_residual_outliers",
    "orders_segment_migration",
    "multimodal_payload_dedup",
    "orders_cohort_ltv",
    "events_dau_wau_mau",
    "orders_nation_segment_rollup",
    "events_conversion_latency_percentiles",
    "events_bot_screen",
    "parts_supplier_hhi",
    # -- tier sample: dedup ladder + clusters
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # -- float-adjacent ANN / retrieval family
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_pq_adc",
    # -- tier sample: text / corpus
    "text_bm25_retrieval",
    "text_lm_score",
    "corpus_train_eval_split",
    # -- tier sample: embedding
    "embedding_kmeans",
    "embedding_bitext_mining",
    # -- tier sample: multimodal
    "multimodal_decode",
    # -- TPC-H perf-weak set + window analytics
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
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

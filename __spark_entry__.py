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
# first 50 entries.  Rounds 1+2 drove 82 of the 117 registry queries to a
# green CORRECTNESS row; those rotate to the overflow for round 3 (each
# still holds a green result in the local differential harness,
# tools/check_correctness.py, driver-grade compare, vanilla session, at
# sf0.01 AND sf0.1).  The round-3 window holds:
#   * the 35 queries never yet inside a driver evaluation window,
#   * dedup_minhash_lsh (implementation changed this round -> must
#     re-verify against the driver, its r02 green predates the change),
#   * the round-3 additions (new TPC-H shapes + new pipeline operators).
# Union over rounds = full driver-verified coverage.
#
# Round-4 rotation set (added late in round 3, overflow this round; each
# holds a green local-differential result at sf0.01 AND sf0.1 plus the
# SPARK_GRAFT_SHUFFLE=7 sweep): dedup_containment_bottomk,
# dedup_clusters_star, dedup_incremental, dedup_embedding_clusters,
# corpus_mixture_plan, similarity_ann_quantized, streaming_dedup_exact,
# approx_sketch_estimates (rows-only by design), events_sliding_distinct,
# source_overlap_matrix, corpus_boilerplate_ngrams, events_drift_report,
# documents_chunking, events_bot_detection, embedding_gram_matrix,
# dedup_threshold_curve, corpus_lang_confusion, corpus_perplexity_buckets,
# multimodal_audio_chunks, streaming_sliding_counts, corpus_bpe_pair_counts,
# embedding_label_centroids, similarity_knn_label_vote, data_quality_audit,
# events_markov_transitions, orders_monthly_growth, corpus_zipf_slope,
# events_sketch_rollup_merge, embedding_label_dispersion, embedding_pq_codes,
# similarity_ann_pq_adc, events_gap_distribution,
# users_activity_reconciliation, events_ab_test_summary,
# events_pareto_concentration, similarity_ann_recall_report,
# events_forecast_backtest, orders_sla_latency_percentiles,
# embedding_duplicate_vectors, corpus_token_budget_curve,
# orders_basket_lift, events_new_vs_returning, events_seasonality_strength,
# supplier_concentration_hhi, events_ab_significance,
# multimodal_video_near_dup, dedup_semantic_lexical_agreement,
# dedup_cluster_size_histogram, events_dispersion_index,
# nation_trade_flow_matrix, corpus_vocab_growth_curve.
_PRIORITY = (
    # -- never driver-verified: TPC-H shapes (operators/tpch.py)
    "q4_priority_with_returns",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_linestatus",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    # -- never driver-verified: round-2 analytics additions
    "events_hourly_gapfill",
    "events_cohort_retention",
    "events_key_skew_profile",
    "events_anomaly_zscore",
    "orders_rfm_segments",
    "events_user_features",
    "events_value_histogram",
    "events_item_cooccurrence",
    "events_top_paths",
    # -- never driver-verified: text / export composites
    "lang_stats",
    "doc_rolling_fingerprint",
    "text_repetition_stats",
    "documents_clean_corpus",
    "documents_weighted_sample",
    "text_lm_score",
    "corpus_pack_sequences",
    "corpus_shard_manifest",
    # -- never driver-verified: dedup / similarity composites
    "simhash_signatures",
    "corpus_decontaminate",
    "source_curation_report",
    "embedding_norm_stats",
    "embedding_dim_stats",
    # -- previously no-oracle, now emit deterministic error-bound checks
    "events_approx_sketch",
    "embedding_kmeans",
    # -- never driver-verified: profiling + streaming
    "customer_profile",
    "streaming_static_enrich",
    "streaming_hourly_final",
    # -- implementation changed round 3 (bloom-pushdown verify): re-verify
    "dedup_minhash_lsh",
    # -- round-3 additions: remaining TPC-H shapes (completes all 22;
    #    q2/q11/q20 use lineitem as the part-supplier relation because the
    #    testdata has no partsupp table — same plan shapes)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    # -- round-3 additions: training-pipeline operators
    "text_normalize",
    "dedup_survivors",
    "corpus_contamination_stats",
    "dedup_family_compare",
    "corpus_quality_gate",
    "events_session_funnel",
    "embedding_quantize",
    "documents_length_histogram",
    "dedup_containment",
    "text_ngram_entropy",
    "orders_backlog_asof",
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

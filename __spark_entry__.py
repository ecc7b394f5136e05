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
# Round-10 window (VERDICT r9 item 4): the 5 round-10 debuts lead, then
# the 5 registered queries round 10 CHANGED (the recall scoreboard's new
# ann_ivfpq row, winnowing's DF cap, and the BM25 family's window-form
# scan fusion — results re-proven equal locally, re-greened here), then
# the OLDEST driver-green rows by round: the 9 keys whose latest green is
# still CORRECTNESS_r01 (the set dropped from the r9 window, as that
# window's closing comment promised), the full latest=r02 cohort (19),
# and the oldest 14 of the latest=r03 cohort — 50 exactly, so driver
# re-verification keeps cycling the whole registry. Every key outside
# this window holds a driver-green row from r01-r09 plus the local
# full-registry differential at HEAD (sf0.01, hostile,
# SPARK_GRAFT_SHUFFLE=7, sf0.1, vanilla foreign-cwd).
# Round-11 window (the round-10 handoff, SURVEY.md): the 15 round-11
# debuts lead (the incremental-maintenance verification queries for ALL
# six appendable index kinds PLUS the delete path (df-repairing BM25
# delete AND the vector-side IVF+PQ delete, each verified end to end
# against a surviving-corpus oracle), the compaction lifecycle + the
# oracle-backed IVF+PQ and BM25 index-stats rows, the streaming ANN
# ingest screen, the indexed hybrid
# serving path, the batched-BPE schedule vs the serial SQL twin PLUS
# the batched trainer pushed through the full encode chain at 12
# merges, and the rows-only refined-codebook scoreboard), then the 3 registered queries round 11 CHANGED internally
# (retrieval_hybrid_rrf now fuses through the shared _rrf_fuse tail; the
# recall report through the shared _recall_hits kernel;
# dedup_winnowing's selection through the shared _winnow_selected front
# — results re-proven equal locally, re-greened here), then the COMPLETE
# latest=r03 cohort (27 keys, including the 10 TPC-H keys the r10 window
# dropped, now the oldest driver evidence in the registry) and the
# oldest 5 of the latest=r04 cohort — 50 exactly.
# Round-12 window (the round-11 handoff, VERDICT #1): the 6 round-12
# debuts lead (the unpartitioned PQ kind's append AND delete lifecycle
# rows over the inline ADC oracle, the scheduler's report->compact-iff-
# fragmented->report composition as a registered row, and the three
# deleted rows completing driver-verified right-to-be-forgotten
# coverage across the fingerprint tiers — winnow df-repair, substring
# span re-derivation, LSH standing-side pruning — each over a
# surviving-corpus oracle), then the 4 registered
# queries round 12 CHANGED internally (the torn-write convergence batch:
# ann_screen's batch-wide candidate exclusion + reachable resume, the
# marker-disciplined _fragment_index under the compacted row, and the
# recompute-on-resume delete paths under the two deleted rows — results
# re-proven equal locally, re-greened here), then ALL 32 latest=r04 keys
# (retiring the r04 evidence cohort exactly as the round-11 closing
# comment promised) and the oldest 8 of the latest=r05 cohort — 50
# exactly, leaving no HARD-ORACLE registry key with driver evidence older
# than r05 (the rows-only approx_sketch_estimates, whose only driver row
# ever was the r04 rows-only pass, rotates in the r13 window below).
# Round-13 window (the round-12 handoff, VERDICT #1): the 7 round-13
# debuts lead (the scheduled-maintenance composition registered for BOTH
# remaining appendable fingerprint kinds — winnow and exact-substring —
# plus the ivf_index_stats twin and the post-freeze stats batch
# (pq/winnow/substring/lsh) that completes the oracle-backed stats
# family across ALL SEVEN index kinds), then the 5 registered
# queries round 13 CHANGED internally (the crash-recovery hardening
# batch: rename-checked staged swap with manifest verification under the
# pq append/delete rows, compact rerouted through the stage/commit/swap
# protocol under the ivfpq compacted/maintained rows, and the scoped
# torn-by-append resume gate under the screen row — results re-proven
# equal locally, re-greened here), then the COMPLETE latest=r05 cohort
# (13 keys, the oldest hard-oracle driver evidence, retiring r05
# entirely), then approx_sketch_estimates (rows-only by design; its only
# driver evaluation ever was r04 — 9 rounds stale, the one freshness
# straggler the r12 verdict called out), and the oldest 24 of the
# latest=r07 cohort (31 keys, alphabetical; the remaining 7 rotate next
# round, listed at the block's tail) — 50 exactly.
_PRIORITY = (
    # -- NEW round-13 debuts: driver-evaluated in their debut window
    # (the post-freeze stats batch — pq/winnow/substring/lsh — completes
    # the oracle-backed stats family across ALL SEVEN index kinds; each
    # swept green at sf0.001 + sf0.01 + hostile + SPARK_GRAFT_SHUFFLE=7 +
    # sf0.1 in its landing batch)
    "ivf_index_stats",
    "dedup_winnowing_maintained",
    "substring_spans_maintained",
    "pq_index_stats",
    "winnow_index_stats",
    "substring_index_stats",
    "lsh_index_stats",
    # -- registered queries whose underlying code CHANGED in round 13
    #    (crash-recovery hardening: staged-swap rename checks + manifest
    #    verification, compact via stage/commit/swap, scoped screen
    #    resume gate — results re-proven equal locally, re-greened here)
    "similarity_ann_pq_appended",
    "similarity_ann_pq_deleted",
    "similarity_ann_ivfpq_compacted",
    "similarity_ann_ivfpq_maintained",
    "similarity_ann_screen",
    # -- the COMPLETE latest=r05 cohort (13 keys — the oldest hard-oracle
    #    driver evidence in the registry), retiring r05 entirely
    "doc_rolling_fingerprint",
    "embedding_drift_report",
    "events_dispersion_index",
    "events_gap_distribution",
    "events_new_vs_returning",
    "events_sessionize",
    "multimodal_meta",
    "orders_monthly_growth",
    "similarity_threshold",
    "text_char_trigram_nll",
    "text_intra_doc_repetition",
    "text_quality",
    "text_tfidf_topk",
    # -- the r04-stale rows-only row (driver-evaluated exactly once, in
    #    r04; its oracle-green sketch twin is events_approx_sketch and
    #    its values are pytest-pinned — refresh the rows-only evidence)
    "approx_sketch_estimates",
    # -- oldest 24 of the latest=r07 cohort (31 keys; the remaining 7 —
    #    embedding_quantize, similarity_ann_quantized,
    #    similarity_centroid_classify, text_code_prose_classify,
    #    text_encoding_artifacts, text_readability, window_latest_order —
    #    rotate next round; each holds an r07 driver green + local greens
    #    at HEAD) — 50 exactly
    "corpus_context_budget_report",
    "corpus_curriculum_order",
    "corpus_decontaminate",
    "corpus_dedup_impact_report",
    "corpus_oov_rate",
    "corpus_pii_prevalence",
    "corpus_span_decontaminate",
    "corpus_token_coverage_curve",
    "dedup_cluster_size_histogram",
    "dedup_clusters_star",
    "dedup_containment",
    "dedup_family_compare",
    "dedup_graph_pagerank",
    "dedup_incremental",
    "dedup_lsh_recall_report",
    "dedup_minhash_estimator_audit",
    "dedup_ngram_jaccard",
    "dedup_pair_overlap_spans",
    "dedup_semantic_lexical_agreement",
    "dedup_threshold_curve",
    "embedding_hubness_report",
    "embedding_matryoshka_recall",
    "embedding_outlier_mahalanobis",
    "embedding_pq_codes",
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

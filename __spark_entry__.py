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
    # ROUND-11 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r11 the age profile is: never hash-checked 2
    # (both new this round), changed-since-green 10, r5 greens 21 (the
    # final r5 block — the r10 verdict's named rotation tail), r6 greens
    # 37, r7+ within the last 4 rounds.  Budget:
    #    2 never hash-checked                            -> slots  1-2
    #   10 changed-since-green (the 5 distributed_rank
    #      consumers — partition count now scales with
    #      defaultParallelism; the parametrized sketch
    #      delta-log loop; the graph round loops' new
    #      try/finally scratch sweep — value-identical,
    #      re-greened defensively)                       -> slots  3-12
    #   21 r5 greens (the block drains — after this
    #      round no green is older than r6)              -> slots 13-33
    #   17 oldest r6 greens (alphabetical prefix of the
    #      37; the remaining 20 queue first for r12)     -> slots 34-50
    # Steady-state rotation at 250 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "stream_kll_compaction",  # NEW r11: KLL delta-log compaction + expiry
    "saprfc_pushdown_in_like",  # NEW r11: In/LIKE OPTIONS rendering leg
    # --- 2. builder changed since last green ---------------------------
    "text_numericalize",  # distributed_rank parts now parallelism-derived
    "data_skew_report",  # same kernel change
    "events_rfm_segments",  # same kernel change (3 ranks)
    "agg_equidepth_histogram",  # same kernel change
    "ml_score_calibration",  # same kernel change
    "stream_sketch_compaction",  # delta-log run parametrized (value-identical)
    "graph_components",  # round loop wrapped in try/finally scratch sweep
    "graph_kcore",  # same sweep wrap in the peel loop
    "dedup_connected_components",  # consumes the swept fixpoint kernel
    "dedup_cluster_canonical",  # same cc_labels consumer
    # --- 3. staleness rotation: the 21 remaining r5 greens (the whole
    # --- block drains; the r10 verdict's item-2 list) -------------------
    "rfc_ingest_invariant",
    "rfc_parse_errors",
    "saprfc_projection",
    "saprfc_pushdown",  # ALSO changed-since-green: In/LIKE rendering path
    "saprfc_scan_typed",
    "saprfc_stream_scan",  # ALSO changed: stream reader rejects maxrows
    "sink_roundtrip",
    "text_fingerprint",
    "text_lang_id",
    "text_pii_redact",
    "text_quality",
    "text_tfidf_topk",
    "text_token_count",
    "text_unigram_logprob",
    "text_word_count",
    "try_cast_best_effort",
    "window_gap_fill",
    "window_range_frame",
    "window_running",
    "window_sessionize",
    "window_topk_per_group",
    # --- 3b. oldest r6 greens (alphabetical prefix, 17 of 37) ----------
    "agg_boolean",
    "agg_histogram",
    "ann_incremental_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_topk",
    "ann_kmeans_assign",
    "ann_matryoshka_recall",
    "ann_pq_adc_topk",
    "ann_pq_encode",
    "ann_two_stage",
    "data_profile",
    "dedup_incremental_jaccard",
    "fn_variant",
    "graph_copurchase_edges",
    "graph_degree_distribution",
    "graph_pagerank",
    "graph_triangle_count",
    # --- 4. rotation ballast: the remaining 20 r6 greens queue FIRST
    # --- for round 12 (the window line falls above here) ---------------
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
    # r7+ greens not listed trail in module order (every one re-earned
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

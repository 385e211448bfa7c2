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
    # ROUND-10 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r10 the age profile was: never hash-checked 2
    # (both new this round), changed-since-green 3, r4 greens 22 (the
    # final r4 block — the r9 verdict's named rotation tail), r5 greens
    # 40, r6+ within the last 4 rounds.  Budget:
    #    2 never hash-checked                            -> slots  1-2
    #    7 changed-since-green (numericalize distributed
    #      rank; the LSH candidate memoization — value-
    #      identical, re-greened defensively; the CC/
    #      kcore parquet round-boundary rewrite)         -> slots  3-9
    #   22 r4 greens (the block drains — after this
    #      round no green is older than r5)              -> slots 10-31
    #   19 oldest r5 greens (alphabetical prefix of the
    #      40; the remaining 21 queue first for r11)     -> slots 32-50
    # Steady-state rotation at 248 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "stream_sketch_compaction",  # NEW r10: delta-log compaction + expiry
    "saprfc_limit_pushdown",  # NEW r10: ROWCOUNT bound at the page planner
    # --- 2. builder changed since last green ---------------------------
    "text_numericalize",  # r6 green; wid now via distributed_rank, hash join
    "dedup_minhash_lsh",  # candidate frame memoized (value-identical)
    "dedup_minhash_recall",  # same memoized candidate path
    "graph_components",  # CC rounds now cross a parquet state-table boundary
    "graph_kcore",  # same _round_boundary rewrite in the peel loop
    "dedup_connected_components",  # consumes the rewritten fixpoint kernel
    "dedup_cluster_canonical",  # same cc_labels consumer
    # --- 3. staleness rotation: the 22 remaining r4 greens (the whole
    # --- block drains; the r9 verdict's item-2 list) --------------------
    "fn_map",
    "fn_json",
    "fn_conditional",
    "fn_math",
    "subquery_exists",
    "subquery_scalar",
    "pivot_linestatus",
    "unpivot_measures",
    "join_cross_theta",
    "window_rank",
    "window_lag_lead",
    "text_simhash",
    "join_range_bands",
    "join_asof",
    "dedup_simhash_buckets",
    "q12_late_shipments",
    "pipeline_domain_mix",
    "pipeline_length_buckets",
    "ingest_scd2_history",
    "stream_windowed_topk",
    "text_entropy",
    "agg_approx_distinct_error",
    # --- 3b. oldest r5 greens (alphabetical prefix, 19 of 40) ----------
    "agg_approx_percentile_error",
    "agg_percentiles",
    "ann_bruteforce_topk",
    "ann_label_match",
    "ann_lsh_topk",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_exact_bucketed",
    "dedup_exact_survivors",
    "dedup_incremental",
    "embedding_quantize_int8",
    "events_funnel",
    "fn_bitwise",
    "fn_regex",
    "ingest_merge_into_route",
    "ingest_scd2_snapshot",
    "join_interval_overlap",
    "mm_payload_hash",
    "pipeline_curation",
    # --- 4. rotation ballast: the remaining 21 r5 greens queue FIRST
    # --- for round 11 (the window line falls above here) ---------------
    "rfc_ingest_invariant",
    "rfc_parse_errors",
    "saprfc_projection",
    "saprfc_pushdown",
    "saprfc_scan_typed",
    "saprfc_stream_scan",
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
    # r6+ greens not listed trail in module order (every one re-earned
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

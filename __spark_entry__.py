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
    # ROUND-9 WINDOW LEDGER (~50 driver slots; see rotation invariant
    # above).  Entering r9 the age profile was: never hash-checked 5
    # (2 new + the 3 retired rows-only entries, first oracle this round),
    # changed-since-green 4, r3-era greens 21 (the final r3 block),
    # r4 greens 41, r5+ within the last 4 rounds.  Budget:
    #    5 never hash-checked                            -> slots  1-5
    #    5 changed-since-green (grouping_id rollup join;
    #      the cents-kernel finiteness guard; the LSH
    #      pairs-pipeline extraction; the pair-frame
    #      verify rework: union-size identity + eager
    #      candidate checkpoint)                         -> slots  6-10
    #   21 r3-era greens (the block drains — after this
    #      round no green is older than r4)              -> slots 11-31
    #   19 oldest r4 greens (relational/fn core)         -> slots 32-50
    # fn_map, fn_json and the remaining r4 greens queue FIRST for round
    # 10; steady-state rotation at 246 queries / 50 slots re-greens every
    # ~5 rounds.
    # ------------------------------------------------------------------
    # --- 1. never hash-checked (first driver oracle this round) --------
    "stream_sketch_maintenance",  # NEW r9: foreachBatch HLL cell merge
    "stream_kll_maintenance",  # NEW r9: the KLL quantile twin
    "agg_approx_distinct",  # converted: grouped tolerance form (r8 item 5)
    "dedup_minhash_lsh",  # converted: recall-mass certification
    "ann_ivf_train_kmeans",  # converted: certified seed-argmin + invariants
    # --- 2. builder changed since last green ---------------------------
    "agg_hll_rollup_merge",  # grouping_id join markers (ADVICE r8 item 2)
    "agg_kll_rollup_merge",
    "stream_cusum_alarms",  # cents-kernel finiteness guard (ADVICE r8 item 1)
    "dedup_minhash_recall",  # now reads the extracted minhash_lsh_pairs
    "dedup_jaccard_pairs",  # pair-frame verify rework (value-identical:
    # |A∪B| = |A|+|B|-|A∩B| on distinct-token arrays; candidates
    # checkpointed eagerly) — its downstream consumers cc/cluster_canonical
    # read the same unchanged values and keep their r7 greens
    # --- 3. staleness rotation: the 21 remaining r3-era greens (the
    # --- whole block drains; join family first) ------------------------
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
    # --- 3b. oldest r4 greens: the relational/scalar-fn core -----------
    "filter_where",
    "limit_offset",
    "topk_orders",
    "sort_global",
    "union_all",
    "intersect_custkeys",
    "except_custkeys",
    "distinct_flags",
    "agg_count",
    "agg_stats",
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_filtered",
    "agg_collect",
    "agg_statistical",
    "fn_string",
    "fn_datetime",
    "fn_array",
    "fn_map",
    "fn_json",
    # --- 4. rotation ballast: the remaining 20 r4 greens queue FIRST
    # --- for round 10 (the window line falls above here) ---------------
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
    # r5+ greens not listed trail in module order (every one re-earned
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

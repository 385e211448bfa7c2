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
#   1. queries with NO green CORRECTNESS entry yet (r02: the 8 TPC-H shapes
#      added in round 2, merge upsert, the BMP/WAV codecs, sampling/packing,
#      the new AVI video codec) plus rfc_parse_valid (r02's one hash
#      failure, fixed this round — DECIMAL -> DOUBLE canonicalization);
#   2. the 4 rows-only queries that have never produced even a rows-only
#      driver entry (weaker check, but T4 etc. need SOME driver signal);
#   3. ROTATION BALLAST: previously-green queries re-enter the checked
#      window oldest-verification-first (r01 greens that r02 skipped fill
#      the rest of the ~50 window; r02 greens trail), so every green entry
#      is periodically re-earned rather than trusted forever.
_PRIORITY = [
    # --- never green: r02 hash failure (fixed) + round-2/3 additions -------
    "rfc_parse_valid",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipments",
    "q16_supplier_counts",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "ingest_merge_upsert",
    "mm_bmp_decode",
    "mm_bmp_resize",
    "mm_wav_decode",
    "mm_video_frames",
    "sample_stratified",
    "pipeline_pack_sequences",
    # round-3 additions (AVI video above; decontaminate/repetition/chunking)
    "pipeline_decontaminate",
    "text_repetition_filter",
    "pipeline_chunk_documents",
    "join_salted_skew",
    "stream_incremental_upsert",
    "agg_grouping_sets",
    "orc_scan_roundtrip",
    "dedup_simhash_buckets",  # upgraded to an exact oracle in round 3
    "mm_wav_features",
    "mm_bmp_ahash",
    # --- rows-only, never driver-checked (weaker rows-only entry) ----------
    "dedup_minhash_lsh",
    "stream_watermark_late_drop",
    "ann_ivf_train_kmeans",
    # --- rotation ballast: r01 greens never re-checked since (oldest first)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_check",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_bands",
    "q22_idle_customers",
    "join_inner",
    "join_broadcast",
    "join_shuffle_hash",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross_theta",
    "agg_count",
    "agg_rollup",
    "agg_cube",
    "agg_statistical",
    "fn_string",
    "fn_datetime",
    "fn_array",
    "fn_map",
    # --- ~50-entry line; remaining r01 greens continue oldest-first --------
    "fn_json",
    "fn_conditional",
    "fn_math",
    "agg_collect",
    "agg_count_distinct",
    "agg_filtered",
    "agg_stats",
    "agg_approx_distinct",
    "distinct_flags",
    "except_custkeys",
    "intersect_custkeys",
    "filter_where",
    "limit_offset",
    "sort_global",
    "topk_orders",
    "union_all",
    "pivot_linestatus",
    "unpivot_measures",
    "subquery_exists",
    "subquery_scalar",
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

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
#   1. queries with NO green CORRECTNESS entry yet (r03: q12's oracle-type
#      hash fail, now fixed) plus this round's NEW anchored agreement
#      queries and the queries whose oracle/builder CHANGED this round
#      (text_simhash's one-digest rewrite and the simhash-bucket oracle
#      composed from it);
#   2. the rows-only queries whose builders changed this round (weaker
#      check, but the driver row should reflect the new code);
#   3. ROTATION BALLAST: previously-green queries re-enter the checked
#      window oldest-verification-first — the 28 r01-only greens that
#      rounds 2-3 never re-checked lead (VERDICT r03 item 7), then the
#      oldest r02 greens fill the rest of the ~50 window; r02/r03 greens
#      trail, so every green entry is periodically re-earned rather than
#      trusted forever.
_PRIORITY = [
    # --- never green / changed this round ----------------------------------
    "q12_late_shipments",  # r03 red: oracle HUGEINT->float; CAST AS BIGINT fix
    "ann_kmeans_assign",  # new: anchored k-means assignment step
    "dedup_minhash_recall",  # new: anchored LSH recall agreement
    "text_simhash",  # oracle rewritten (one-digest) this round
    "dedup_simhash_buckets",  # oracle composes the new simhash SQL
    "pipeline_domain_mix",  # new: per-source mixing weights
    "text_ngram_topk",  # new: corpus bigram top-k
    "pipeline_length_buckets",  # new: token-length histogram
    "embedding_quantize_int8",  # new: symmetric int8 quantization
    "stream_watermark_late_drop",  # upgraded to an exact watermark-schedule oracle
    "ingest_scd2_history",  # new: SCD2 validity intervals from a change stream
    "stream_windowed_topk",  # new: stream agg -> serving-layer rank
    "text_entropy",  # new: token-distribution entropy quality signal
    "agg_approx_distinct_error",  # new: HLL tolerance anchor for A5
    "window_distribution",  # new: percent_rank/cume_dist/ntile(7)
    # --- rows-only whose builders changed this round ------------------------
    "dedup_minhash_lsh",  # r=2 banding rewrite
    "ann_ivf_train_kmeans",  # map-side assignment kernel
    # --- rotation ballast: r01-only greens never re-checked since ----------
    "join_cross_theta",
    "agg_count",
    "agg_rollup",
    "agg_cube",
    "agg_statistical",
    "fn_string",
    "fn_datetime",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_conditional",
    "agg_collect",
    "agg_count_distinct",
    "agg_filtered",
    "agg_stats",
    "agg_approx_distinct",  # rows-only by documented contract (tolerance-tested)
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
    # --- oldest r02 greens fill the window to ~50 ---------------------------
    "fn_math",
    "join_range_bands",
    "join_asof",
    "window_rank",
    "window_lag_lead",
    "window_running",
    "window_range_frame",
    "window_topk_per_group",
    "rfc_parse_errors",
    "rfc_ingest_invariant",
    "try_cast_best_effort",
    "saprfc_scan_typed",
    "csv_scan_roundtrip",
    "saprfc_pushdown",
    # --- ~50-entry line; remaining r02 greens continue oldest-first --------
    "saprfc_projection",
    "sink_roundtrip",
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
    # r02/r03 greens not listed trail in module order (rfc_parse_valid,
    # the TPC-H suite, mm codecs, pipelines, ...)
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

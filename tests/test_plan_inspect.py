"""Unit tests for plans.inspect (no Spark needed — canned plan strings,
including the truncated-filter-list form Spark emits for long predicates)."""

from __future__ import annotations

from guidance_for_sap_data_integration_and_management_on_aws_spark.plans import (
    file_scans,
    n_exchanges,
    partition_filters,
    pushed_filters,
    scanned_columns,
)

PLAN = (
    "*(2) HashAggregate(keys=[l_returnflag#10], functions=[sum(x#1)])\n"
    "+- Exchange hashpartitioning(l_returnflag#10, 32), ENSURE_REQUIREMENTS\n"
    "   +- FileScan parquet [l_quantity#4,l_returnflag#10] Batched: true, "
    "DataFilters: [isnotnull(l_quantity#4)], Format: Parquet, "
    "Location: InMemoryFileIndex(1 paths)[file:/data/lineitem.parquet], "
    "PartitionFilters: [], "
    "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,1.0)], "
    "ReadSchema: struct<l_quantity:double,l_returnflag:string>\n"
)

# Spark truncates long filter lists mid-entry: no closing "]" before ", ReadSchema".
PLAN_TRUNCATED = (
    "*(1) Project [p_partkey#0L]\n"
    "+- FileScan parquet [p_partkey#0L,p_brand#3,p_size#5] Batched: true, "
    "DataFilters: [isnotnull(p_size#5)], Format: Parquet, "
    "Location: InMemoryFileIndex(1 paths)[file:/data/part.parquet], "
    "PartitionFilters: [isnotnull(p_brand#3), EqualTo(p_brand,Brand#12)], "
    "PushedFilters: [IsNotNull(p_size), Or(Or(And(GreaterThanOrEqual(p_size,1),"
    "LessThanOrEqual(p_size,11..., ReadSchema: struct<p_partkey:bigint>\n"
)


def test_scan_parsing_complete_line():
    [scan] = file_scans(PLAN)
    assert scan.fmt == "parquet"
    assert scan.columns == ["l_quantity", "l_returnflag"]
    assert "GreaterThanOrEqual(l_quantity,1.0)" in scan.pushed_filters
    assert scan.partition_filters == ""
    assert scan.reads_table("lineitem")
    assert not scan.reads_table("orders")


def test_scanned_columns_and_exchanges():
    assert scanned_columns(PLAN) == [{"l_quantity", "l_returnflag"}]
    assert n_exchanges(PLAN) == 1


def test_truncated_filter_list_still_parses():
    [scan] = file_scans(PLAN_TRUNCATED)
    assert "p_size" in scan.pushed_filters  # content before the truncation point
    assert "EqualTo(p_brand,Brand#12)" in scan.partition_filters
    assert pushed_filters(PLAN_TRUNCATED)[0].startswith("IsNotNull(p_size)")
    assert partition_filters(PLAN_TRUNCATED) == [
        "isnotnull(p_brand#3), EqualTo(p_brand,Brand#12)"
    ]


def test_multiple_scans():
    two = PLAN + PLAN_TRUNCATED
    scans = file_scans(two)
    assert len(scans) == 2
    assert scans[0].reads_table("lineitem") and scans[1].reads_table("part")

"""A5 semantic backing for the rows-only driver entry: approx_count_distinct
(HLL++) must land within 3x its configured relative standard deviation of
the exact distinct count (99.7% band; seed-stable in Spark, so this is
deterministic in practice)."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
    agg_approx_distinct,
)

RSD = 0.02  # the rsd agg_approx_distinct passes to approx_count_distinct


def test_approx_distinct_within_3_rsd(spark, sf_dir):
    row = agg_approx_distinct.builder(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
    ).collect()[0]
    for approx_col, exact_col in (("approx_orders", "orders"), ("approx_parts", "parts")):
        err = abs(row[approx_col] - exact[exact_col]) / exact[exact_col]
        assert err <= 3 * RSD, f"{approx_col}: rel err {err:.4f} > {3 * RSD}"

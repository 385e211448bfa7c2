"""A5 semantic backing for the tolerance-certified driver entries:
approx_count_distinct (HLL++) must land within 3x its configured relative
standard deviation of the exact distinct count (99.7% band; hash-seeded and
deterministic per dataset in Spark, so this is fixture-stable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
    agg_approx_distinct,
)

RSD = 0.02  # the rsd agg_approx_distinct passes to approx_count_distinct


def test_approx_distinct_grouped_within_3_rsd(spark, sf_dir):
    """The grouped certification query's booleans must be TRUE, its exact
    column must equal an independently computed exact distinct count, and
    the underlying grouped estimate must sit within 3x rsd of exact (a
    tighter band than the query's own 5% tolerance gate)."""
    rows = {r["l_returnflag"]: r for r in agg_approx_distinct.builder(spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    check = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("exact"),
        F.approx_count_distinct("l_suppkey", RSD).alias("approx"),
    )
    for r in check.collect():
        got = rows[r["l_returnflag"]]
        assert got["exact_supp"] == r["exact"], r["l_returnflag"]
        assert got["supp_within_tol"] is True, r["l_returnflag"]
        err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert err <= 3 * RSD, f"{r['l_returnflag']}: rel err {err:.4f} > {3 * RSD}"

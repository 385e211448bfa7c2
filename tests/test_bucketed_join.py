"""Bucketing for co-located joins (SURVEY §4 / the 100 TB design story):
pre-bucketing both join sides on the key eliminates the per-query shuffle —
the dominant cost of large fact-fact joins at scale.  Verified here by plan
inspection: the bucketed join contains no Exchange, the unbucketed one does."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    names = (f"orders_b_{suffix}", f"lineitem_b_{suffix}")
    load(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(names[0])
    load(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable(names[1])
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(orders_b)
        li = spark.table(lineitem_b)
        j = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = _plan(j)
        # bucketed scans feed SortMergeJoin directly: no Exchange on the keys
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_shuffles_for_contrast(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load(spark, sf_dir, "orders")
        li = load(spark, sf_dir, "lineitem")
        j = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = _plan(j)
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_result_matches_unbucketed(spark, bucketed, sf_dir):
    orders_b, lineitem_b = bucketed
    o_b, li_b = spark.table(orders_b), spark.table(lineitem_b)
    got = (
        o_b.join(li_b, o_b.o_orderkey == li_b.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    o, li = load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    want = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

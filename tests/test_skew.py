"""Salted-join skew mitigation: result equivalence with the plain join and
salt-spread verification (each hot key's rows land in every salt bucket)."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.joins import salted_join


def _skewed_fact(spark, sf_dir):
    # make l_suppkey pathologically hot: 2/3 of rows collapse onto one key
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    return li.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") % 3 != 0, F.lit(1)).otherwise(F.col("l_suppkey")),
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    fact = _skewed_fact(spark, sf_dir)
    dim = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    plain = fact.join(dim, "l_suppkey").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q")
    )
    salted = salted_join(fact, dim, "l_suppkey", n_salts=8).groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark, sf_dir):
    fact = _skewed_fact(spark, sf_dir)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
    buckets = (
        fact.filter(F.col("l_suppkey") == 1)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(buckets) == 8  # the hot key occupies every salt bucket

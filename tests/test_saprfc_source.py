"""saprfc DataSource V2 behavior beyond the oracle gate: pushdown actually
reaches the transport, the plan has no residual Filter, and the dead-letter
invariant holds."""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import MockRfcTransport
from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import register


def _df(spark, **opts):
    register(spark)
    r = spark.read.format("saprfc").option("table", "DD03L")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_corrupt_plus_valid_equals_total(spark):
    df = _df(spark)
    total = df.count()
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).count()
    valid = df.filter(F.col("_corrupt_record").isNull()).count()
    assert total == 2500 and corrupt + valid == total
    assert corrupt == sum(1 for i in range(2500) if i % 37 == 0)


def test_filter_pushdown_consumed_by_source(spark):
    df = _df(spark).filter(F.col("TABNAME") == "TAB3")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan saprfc" in plan
    # fully consumed: no residual FilterExec node ("Filter (<cond>)")
    assert "Filter (" not in plan


def test_options_reach_transport_and_reduce_wire_rows():
    t = MockRfcTransport(n_rows=2500)
    full = t.call("DD03L", "`", 0, 10**6)
    filtered = t.call("DD03L", "`", 0, 10**6, options=["TABNAME EQ 'TAB3'"])
    assert len(filtered["DATA"]) < len(full["DATA"])
    assert len(filtered["DATA"]) == sum(1 for i in range(2500) if i % 7 == 3)


def test_fields_param_prunes_wire_columns():
    t = MockRfcTransport(n_rows=100)
    res = t.call("DD03L", "`", 0, 10**6, fields=["TABNAME", "LENG"])
    assert [f["FIELDNAME"] for f in res["FIELDS"]] == ["TABNAME", "LENG"]
    assert all(r["WA"].count("`") == 1 for r in res["DATA"])  # 2 cols -> 1 delim


def test_pagination_partitions(spark):
    df = _df(spark, pagesize="300")
    assert df.rdd.getNumPartitions() == 9  # ceil(2500/300)
    assert df.count() == 2500

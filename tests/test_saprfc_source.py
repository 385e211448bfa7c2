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


def test_stream_reader_offsets_and_volume(spark):
    """The streaming reader's offset arithmetic: initial page 0, latest =
    ceil(rows/pagesize), partitions cover [start, end), and a full
    AvailableNow drain lands every mock row exactly once."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.rfc import RfcField
    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcStreamReader,
    )

    fields = [RfcField("TABNAME", "C"), RfcField("POSITION", "N")]
    r = SapRfcStreamReader({"mockrows": "2500", "pagesize": "300"}, fields)
    assert r.initialOffset() == {"page": 0}
    assert r.latestOffset() == {"page": 9}  # ceil(2500/300)
    parts = r.partitions({"page": 2}, {"page": 5})
    assert [p.page for p in parts] == [2, 3, 4]

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        run_to_table,
        scratch_dir,  # noqa: F401  (import parity with ops)
    )

    register(spark)
    s = (
        spark.readStream.format("saprfc")
        .option("table", "DD03L")
        .option("pagesize", "300")
        .load()
    )
    out = run_to_table(s.select("TABNAME"), "mem_saprfc_stream_unit", "append")
    assert out.count() == 2500


def test_limit_pushdown_planning_and_volume_laws():
    """Property check (hypothesis-style sweep, pure Python — the reader and
    mock transport need no Spark session): for every (maxrows, pagesize,
    mockrows) combination, the planner schedules exactly
    ceil(min(maxrows, n) / pagesize) pages (never a full-table plan plus a
    post-scan limit) and the scan parses exactly the first min(maxrows, n)
    wire rows — corrupt lines included, since ROWCOUNT bounds wire rows,
    not valid rows."""
    import math

    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcReader,
    )

    fields = list(MockRfcTransport.FIELDS)
    for n in (1, 36, 37, 100, 2500):
        for page in (7, 100, 500):
            for limit in (1, page - 1, page, page + 1, n, n + 50):
                opts = {
                    "mockrows": str(n),
                    "pagesize": str(page),
                    "maxrows": str(limit),
                }
                r = SapRfcReader(opts, fields)
                parts = r.partitions()
                want = max(1, math.ceil(min(limit, n) / page))
                assert len(parts) == want, (n, page, limit)
                wire = 0
                for p in parts:
                    for batch in r.read(p):
                        # every parsed line lands in exactly one output row
                        # (valid or corrupt), so batch rows == wire rows
                        wire += batch.num_rows
                assert wire == min(limit, n), (n, page, limit)


def test_limit_composes_with_filter_pushdown():
    """maxrows bounds the wire rows BEFORE the pushed OPTIONS filter on the
    server side paginates them (the transport filters, then pages — SAP's
    open-SQL semantics), so limit+filter returns the first maxrows rows OF
    THE FILTERED stream, never maxrows unfiltered rows re-filtered."""
    from pyspark.sql.datasource import EqualTo

    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcReader,
    )

    fields = list(MockRfcTransport.FIELDS)
    r = SapRfcReader(
        {"mockrows": "2500", "pagesize": "100", "maxrows": "150"}, fields
    )
    leftover = list(r.pushFilters([EqualTo(("TABNAME",), "TAB3")]))
    assert leftover == []  # accepted by the source
    rows = 0
    for p in r.partitions():
        for batch in r.read(p):
            col = batch.column(0).to_pylist()
            assert all(v == "TAB3" for v in col)
            rows += batch.num_rows
    # expected from the generator law: the filtered wire stream is the ids
    # with i%7==3 (server-side OPTIONS matches the RAW values); the limit
    # keeps its first 150, and of those the i%37==0 ids arrive as
    # arity-mismatched lines that the value-comparing pushed filter drops
    # client-side (EqualTo on the all-NULL corrupt row is not True)
    filtered_ids = [i for i in range(2500) if i % 7 == 3][:150]
    expect = sum(1 for i in filtered_ids if i % 37 != 0)
    assert rows == expect == 146


def test_stream_reader_ignores_maxrows():
    """The stream path has NO pushdown — including the limit: the stream
    reader strips maxrows from its batch delegate, because the delegate's
    ROWCOUNT truncation against limit-less page planning would send
    ROWCOUNT<=0 calls for later pages (ROWCOUNT=0 means 'no restriction'
    to a live RFC server — a silent full re-fetch into the stream)."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcStreamReader,
    )

    fields = list(MockRfcTransport.FIELDS)
    r = SapRfcStreamReader(
        {"mockrows": "2500", "pagesize": "500", "maxrows": "1000"}, fields
    )
    assert r._delegate.limit is None
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    assert len(parts) == 5  # full table planned, not the limited 2 pages
    wire = sum(b.num_rows for p in parts for b in r.read(p))
    assert wire == 2500  # every wire row lands exactly once


def test_negative_maxrows_rejected():
    """A negative bound must fail loud at reader construction: passed
    through, Python-slice semantics on the mock silently return 'all but
    the last N rows', and a live RFC ROWCOUNT<0 is undefined."""
    import pytest

    from guidance_for_sap_data_integration_and_management_on_aws_spark.sources.saprfc_dsv2 import (
        SapRfcReader,
    )

    with pytest.raises(ValueError, match="maxrows must be positive"):
        SapRfcReader({"mockrows": "100", "maxrows": "-5"}, list(MockRfcTransport.FIELDS))

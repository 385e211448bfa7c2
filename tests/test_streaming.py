"""Streaming-specific semantics beyond the oracle gate (SURVEY §5.2 item 3):
watermark late-data exclusion is asserted against an exact, replay-aware
expectation, and the replay harness itself is deterministic."""

from __future__ import annotations

import pandas as pd

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators import ingest  # noqa: F401  (keeps import graph warm)
from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
    stream_watermark_late_drop,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import N_CHUNKS


def _expected_late_drop(spark, sf_dir) -> dict[str, int]:
    """Replicate the 'late' replay + watermark semantics exactly:

    * events sorted by (ts, event_id), split into N_CHUNKS quartiles;
    * rows with event_id % 97 == 0 from chunks 0..N-2 arrive in the final
      batch (index N-1);
    * Spark's input filter for batch i uses the watermark committed *before*
      batch i starts, which was computed from the max event time of batches
      0..i-2 (one batch of lag — verified empirically: chunk-(N-2) planted
      rows survive).  So late rows are dropped iff
      ts < max ts(arrivals in batches 0..N-3) - 10 min;
    * append mode emits a window only once watermark passes its end; the
      final (post-drain) watermark is (global max kept ts - 10 min).
    """
    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load

    pdf = load(spark, sf_dir, "events").orderBy("ts", "event_id").toPandas()
    n = len(pdf)
    bounds = [round(i * n / N_CHUNKS) for i in range(N_CHUNKS + 1)]
    planted = (pdf["event_id"] % 97 == 0) & (pd.Series(range(n)) < bounds[N_CHUNKS - 1])

    early_max = pdf.loc[~planted & (pd.Series(range(n)) < bounds[N_CHUNKS - 2]), "ts"].max()
    wm_final_batch = early_max - pd.Timedelta(minutes=10)
    dropped = planted & (pdf["ts"] < wm_final_batch)
    kept = pdf[~dropped]

    final_wm = kept["ts"].max() - pd.Timedelta(minutes=10)
    win_start = kept["ts"].dt.floor("h")
    emitted = kept[(win_start + pd.Timedelta(hours=1)) <= final_wm]
    counts = emitted.groupby(emitted["ts"].dt.floor("h")).size()
    return {ts.strftime("%Y-%m-%d %H:%M:%S"): int(c) for ts, c in counts.items()}


def test_watermark_drops_late_rows_exactly(spark, sf_dir):
    got = {
        r["window_start"]: r["n_events"]
        for r in stream_watermark_late_drop.builder(spark, sf_dir).collect()
    }
    expected = _expected_late_drop(spark, sf_dir)
    assert got == expected
    # and the drop is real: fewer events than the full table
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(got.values()) < total


def test_replay_is_deterministic(spark, sf_dir):
    a = stream_watermark_late_drop.builder(spark, sf_dir)
    b = stream_watermark_late_drop.builder(spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_watermark_schedule_one_batch_lag(spark, sf_dir):
    """Pin the Spark-version-specific microbatch detail the late-drop oracle
    assumes: the watermark in effect while batch b runs equals max event time
    through batch b-2, minus the 10-minute delay (one batch of propagation
    lag).  If a Spark upgrade changes watermark propagation — or the replay
    stops being one-file-per-trigger — this fails with the actual schedule,
    instead of the oracle gate failing with a bare hash mismatch."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        build_replay,
        read_events_stream,
        scratch_dir,
        stream_shuffle,
    )

    s = read_events_stream(spark, build_replay(spark, sf_dir, "late"))
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    with stream_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName("mem_wm_schedule_pin")
            .outputMode("append")
            .option("checkpointLocation", scratch_dir("ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progresses) == N_CHUNKS, [p["batchId"] for p in q.recentProgress]

    # per-batch arrival max event time, reconstructed from the replay spec
    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    n = len(pdf)
    bounds = [round(i * n / N_CHUNKS) for i in range(N_CHUNKS + 1)]
    pos = pd.Series(range(n))
    chunk = pd.cut(pos, bounds, right=False, labels=False)
    chunk[(pdf["event_id"] % 97 == 0).to_numpy()] = N_CHUNKS - 1
    batch_max = pdf.groupby(chunk.to_numpy())["ts"].max()

    # progress[b] reports the watermark advanced from batches 0..b-1; the
    # input filter for batch b applies the watermark committed BEFORE batch b
    # starts — i.e. progress[b-1]'s value, max through b-2 — which is exactly
    # the one-batch propagation lag the oracle encodes.
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ"
    for b, p in enumerate(progresses):
        got_wm = p["eventTime"].get("watermark")
        if b == 0:
            expect = "1970-01-01T00:00:00.000Z"  # nothing has propagated yet
            ok = got_wm in (None, expect)
        else:
            expect = (
                batch_max.loc[: b - 1].max() - pd.Timedelta(minutes=10)
            ).strftime(fmt)[:-4] + "Z"
            ok = got_wm == expect
        assert ok, (
            f"batch {b}: watermark schedule changed — got {got_wm!r}, "
            f"expected {expect!r} (max event time through batch {b - 1} "
            "minus 10 min; stream_watermark_late_drop's oracle assumes the "
            "batch-b input filter applies progress[b-1]'s watermark, i.e. "
            "max through batch b-2)"
        )


def test_transform_with_state_v2(spark, sf_dir):
    """Modern-API twin of T6 (transformWithStateInPandas): same final
    per-user totals as the batch GROUP BY.  Requires protobuf; since round 7
    pb_runtime.ensure_protobuf provisions a pure-Python runtime where one
    exists on the box, so this runs here — and still skips gracefully in
    environments with no protobuf distribution at all."""
    import pytest

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        has_transform_with_state_runtime,
        stream_stateful_v2,
    )

    if not has_transform_with_state_runtime():
        with pytest.raises(ImportError, match="protobuf"):
            stream_stateful_v2.builder(spark, sf_dir)
        pytest.skip("protobuf not available: transformWithState runtime absent")

    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load

    got = {
        (r["user_id"], r["n_events"], r["total_cents"])
        for r in stream_stateful_v2.builder(spark, sf_dir).collect()
    }
    want = {
        (r["user_id"], r["n"], r["cents"])
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_stateful_streaming_on_rocksdb_state_store(spark, sf_dir):
    """The production state-store backend for state larger than executor
    memory: the same windowed watermark aggregation must produce identical
    results under RocksDBStateStoreProvider as under the default HDFS-backed
    (in-memory) provider — the knob is config-only, no dataflow change."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        build_replay,
        read_events_stream,
        run_to_table,
    )

    path = build_replay(spark, sf_dir, "ordered")

    def drain(name: str):
        s = (
            read_events_stream(spark, path)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("ws"), "n")
        )
        return sorted(
            (r["ws"], r["n"]) for r in run_to_table(s, name, "append").collect()
        )

    key = "spark.sql.streaming.stateStore.providerClass"
    default = drain("rocks_default")
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = drain("rocks_rocksdb")
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert rocks == default and rocks


def test_session_timeout_boundary_is_strict(spark, tmp_path):
    """Engineered tie: a session whose last_ts + gap lands EXACTLY on the
    final watermark must NOT emit (timers fire strictly beyond their
    timestamp; the oracle's horizon rule is strict <), while a session one
    second below the tie must emit.  The fixture never produces exact ties,
    so this pins the boundary the empirical SF checks cannot."""
    import datetime

    from pyspark.sql import Row, functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        _session_kernel,
    )
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        EVENTS_SCHEMA,
        run_to_table,
        scratch_dir,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, uid, ts):
        return Row(event_id=eid, ts=ts, user_id=uid, event_type="view",
                   value=1.0, props="{}")

    m = datetime.timedelta(minutes=1)
    # final watermark = max ts - 1h = t0 + 40min
    wm = t0 + 40 * m
    rows = [
        # u1: session ends at wm - 30min EXACTLY -> last+gap == wm -> open
        ev(1, 1, t0), ev(2, 1, wm - 30 * m),
        # u3: session ends 1s below the tie -> last+gap < wm -> emits
        ev(3, 3, t0), ev(4, 3, wm - 30 * m - datetime.timedelta(seconds=1)),
        # u2: the watermark driver; its own session is open (absent)
        ev(5, 2, wm + 60 * m),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    closed = (
        s.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_kernel,
            "user_id BIGINT, start_ms BIGINT, end_ms BIGINT, n_events BIGINT",
            "start_ms BIGINT, last_ms BIGINT, n BIGINT",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    out = run_to_table(closed, "sess_boundary", "append")
    got = {(r["user_id"], r["n_events"]) for r in out.collect()}
    assert got == {(3, 2)}, got  # u3 only: u1 ties the horizon, u2 is open


def test_outer_join_horizon_boundaries_are_strict(spark, tmp_path):
    """Engineered ties for the outer stream-stream join horizon rules — the
    two sides are ASYMMETRIC, and the asymmetry follows from the join
    condition: an unmatched view at v_ts + 30min == watermark must NOT
    null-emit (a click at exactly the watermark could still arrive and
    satisfy c_ts <= v_ts + 30min), while an unmatched click at c_ts ==
    watermark MUST null-emit (a matching view would need v_ts < c_ts ==
    watermark — already late, impossible).  This tie exposed a latent
    strict-< bug in the registered oracle's right-side rule."""
    import datetime

    from pyspark.sql import Row, functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        EVENTS_SCHEMA,
        run_to_table,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    s1 = datetime.timedelta(seconds=1)
    # drivers at wm + 1h on both sides fix the final watermark at t0 + 300min
    wm = t0 + 300 * m
    rows = [
        Row(event_id=1, ts=wm - 30 * m, user_id=1, event_type="view", value=1.0, props="{}"),   # tie: v_ts+30m == wm -> open
        Row(event_id=2, ts=wm - 30 * m - s1, user_id=2, event_type="view", value=1.0, props="{}"),  # below: emits
        Row(event_id=3, ts=wm, user_id=3, event_type="click", value=1.0, props="{}"),           # tie: c_ts == wm -> open
        Row(event_id=4, ts=wm - s1, user_id=4, event_type="click", value=1.0, props="{}"),      # below: emits
        Row(event_id=5, ts=wm + 60 * m, user_id=9, event_type="view", value=1.0, props="{}"),   # watermark driver (left)
        Row(event_id=6, ts=wm + 60 * m, user_id=9, event_type="click", value=1.0, props="{}"),  # watermark driver (right)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)

    def side(et, id_alias, user_alias, ts_alias):
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(src)
            .filter(F.col("event_type") == et)
            .withWatermark("ts", "1 hour")
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user_alias),
                F.col("ts").alias(ts_alias),
            )
        )

    views = side("view", "view_id", "v_user", "v_ts")
    clicks = side("click", "click_id", "c_user", "c_ts")
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    ).select("view_id", "click_id")
    out = run_to_table(joined, "outer_boundary", "append")
    rows_out = {(r["view_id"], r["click_id"]) for r in out.collect()}
    # driver pair 5/6 ties c_ts == v_ts (no match: c_ts > v_ts fails) and
    # both sit above the horizon -> absent; view 1 ties the left horizon
    # (open), click 3 ties the right horizon (CLOSED — inclusive side)
    assert rows_out == {(2, None), (None, 3), (None, 4)}, rows_out


def test_window_finalization_tie_is_inclusive(spark, tmp_path):
    """An append-mode window whose end equals the final watermark EXACTLY is
    emitted (finalization is <=, unlike outer-join left-row closure which is
    strict) — the boundary the tumbling/chained-window oracles rely on."""
    import datetime

    from pyspark.sql import Row, functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        EVENTS_SCHEMA,
        run_to_table,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=1, ts=t0 + datetime.timedelta(minutes=5), user_id=1,
            event_type="view", value=1.0, props="{}"),
        # driver at 01:10 with a 10-min delay puts the final watermark at
        # 01:00 — exactly the first window's end
        Row(event_id=2, ts=t0 + datetime.timedelta(minutes=70), user_id=2,
            event_type="view", value=1.0, props="{}"),
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .count()
        .select(F.date_format("window.start", "HH:mm").alias("ws"), "count")
    )
    t = run_to_table(agg, "wm_tie_inclusive", "append")
    assert sorted((r["ws"], r["count"]) for r in t.collect()) == [("00:00", 1)]


def test_derived_replay_variants_match_their_contracts(spark, sf_dir):
    """The scenario variants are DERIVED from the ordered chunk files (round
    7 — previously each re-ran the full global-rank pipeline).  Lock the
    derivation's content contracts against the ordered chunks:

    * dups: chunk i = ordered chunk i plus one extra copy of each
      event_id % 10 == 0 row FROM THAT CHUNK (dup arrives in its own chunk);
    * late: chunks 0..N-2 = ordered minus event_id % 97 == 0; final chunk =
      ordered final plus every withheld row — global multiset unchanged;
    * bad: same rows as ordered per chunk, props rewritten to '{bad' exactly
      on event_id % 101 == 0.
    """
    import os

    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.replay import (
        build_replay,
    )

    dirs = {v: build_replay(spark, sf_dir, v) for v in ("ordered", "dups", "late", "bad")}

    def chunk(variant: str, i: int):
        return spark.read.parquet(
            os.path.join(dirs[variant], f"chunk_{i:03d}.parquet")
        )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for i in range(N_CHUNKS):
        o = chunk("ordered", i)
        # dups: ordered + its own % 10 == 0 rows once more
        assert rows(chunk("dups", i)) == rows(
            o.union(o.filter(F.col("event_id") % 10 == 0))
        )
        # bad: same multiset with props corrupted on % 101 == 0
        expect_bad = o.withColumn(
            "props",
            F.when(F.col("event_id") % 101 == 0, F.lit("{bad")).otherwise(
                F.col("props")
            ),
        )
        assert rows(chunk("bad", i)) == rows(expect_bad)
        # late: early chunks lose the withheld rows
        if i < N_CHUNKS - 1:
            assert rows(chunk("late", i)) == rows(
                o.filter(F.col("event_id") % 97 != 0)
            )
    withheld = [
        r
        for i in range(N_CHUNKS - 1)
        for r in rows(chunk("ordered", i).filter(F.col("event_id") % 97 == 0))
    ]
    assert rows(chunk("late", N_CHUNKS - 1)) == sorted(
        rows(chunk("ordered", N_CHUNKS - 1)) + withheld
    )


def test_pb_runtime_provisioning_is_idempotent_and_worker_visible(spark):
    """ensure_protobuf: repeated calls are cheap and stable, the driver can
    import google.protobuf afterwards, and when the import is served by the
    vendored zip the SparkContext worker environment carries it (the
    channel transformWithStateInPandas's state server boots from)."""
    import os
    import sys

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming import pb_runtime

    ok1 = pb_runtime.ensure_protobuf(spark)
    ok2 = pb_runtime.ensure_protobuf(spark)
    assert ok1 == ok2
    if not ok1:  # environment with no protobuf distribution at all
        return
    from google.protobuf import descriptor  # noqa: F401

    if pb_runtime._zip_in_use is not None:
        assert pb_runtime._zip_in_use in sys.path
        env = spark.sparkContext.environment
        assert pb_runtime._zip_in_use in env.get("PYTHONPATH", "").split(os.pathsep)
        assert env.get(pb_runtime._VERSION_CHECK_FLAG) == "true"


def test_sketch_maintenance_per_batch_work_is_o_batch(spark, sf_dir):
    """The streaming sketch-maintenance contract (r8 verdict item 3): each
    microbatch sketches only ITS OWN rows, and the merge reads back only
    the bounded cell-sketch fact table — never prior event rows.  Asserted
    literally from the instrumented per-batch (batch_rows, fact_cells_read)
    trace: batch row counts sum to the corpus exactly once, and every
    fact read is bounded by the corpus' cell count (types x days), which
    is independent of corpus row count.  Plus end-state losslessness: the
    maintained sketches estimate exactly what a one-shot batch build does."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        _sketch_maintenance_run,
    )

    stats: list[tuple[int, int]] = []
    fact_path = _sketch_maintenance_run(spark, sf_dir, stats=stats)
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    n_events = ev.count()
    n_cells = ev.select("event_type", "day").distinct().count()
    assert len(stats) == N_CHUNKS
    assert sum(b for b, _ in stats) == n_events  # every row sketched once
    assert all(c <= n_cells for _, c in stats), stats  # fact reads bounded
    maintained = {
        (r["event_type"], r["day"]): r["e"]
        for r in spark.read.parquet(fact_path)
        .select("event_type", "day", F.hll_sketch_estimate("sk").alias("e"))
        .collect()
    }
    rebuilt = {
        (r["event_type"], r["day"]): r["e"]
        for r in ev.groupBy("event_type", "day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    assert maintained == rebuilt and len(maintained) == n_cells


def test_kll_maintenance_loop_holds_the_same_o_batch_contract(spark, sf_dir):
    """The KLL twin exercises a structurally different merge path through
    the shared loop — collect_list of prior+delta sketch buffers folded by
    pairwise kll_sketch_merge_double (post_merge), not a native union
    aggregate — so the O(batch + n_cells) contract is asserted for it
    separately: per-type cells, fact reads bounded by the TYPE domain
    (independent of both corpus rows and the day range), every row
    sketched exactly once.  End state checks the rank-error contract (KLL
    compaction is merge-order-dependent, so no register equality like the
    HLL twin): the maintained median lands within KLL_TOL of the exact
    per-type median."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
        KLL_TOL,
        _kll_merge_fold,
    )
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        _sketch_maintenance_run,
    )

    stats: list[tuple[int, int]] = []
    fact_path = _sketch_maintenance_run(
        spark,
        sf_dir,
        stats=stats,
        value_col="value",
        sketch_agg=F.expr("kll_sketch_agg_double(CAST(value AS DOUBLE))").alias(
            "sk"
        ),
        merge_agg=F.collect_list("sk").alias("sks"),
        post_merge=_kll_merge_fold().alias("sk"),
        keys=("event_type",),
    )
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    n_events = ev.count()
    n_types = ev.select("event_type").distinct().count()
    assert len(stats) == N_CHUNKS
    assert sum(b for b, _ in stats) == n_events  # every row sketched once
    assert all(c <= n_types for _, c in stats), stats  # fact reads bounded
    maintained = {
        r["event_type"]: r["m50"]
        for r in spark.read.parquet(fact_path)
        .select(
            "event_type",
            F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("m50"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["p50"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile(F.col("v"), F.lit(0.5)).alias("p50"))
        .collect()
    }
    assert maintained.keys() == exact.keys() and len(exact) == n_types
    for t, p50 in exact.items():
        assert abs(maintained[t] - p50) / max(abs(p50), 1e-9) <= KLL_TOL, t


def test_sketch_delta_log_ticks_are_write_only_and_compaction_is_bounded(spark, sf_dir):
    """The compaction lifecycle's work-bound contract, asserted literally
    from the instrumented traces: ingest ticks are WRITE-ONLY (every tick's
    fact_cells_read is zero — stronger than the read-merge loop's bound),
    each event row is sketched exactly once, and the compaction pass reads
    at most ticks x cells increment rows (independent of corpus row count)
    while emitting exactly the retained cell set.  End state: compacted
    estimates are register-equal to a one-shot batch build over the
    retained window, and every expired cell is gone."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        SKETCH_RETAIN_DAYS,
        _sketch_delta_log_run,
        compact_sketch_log,
    )

    tick_stats: list[tuple[int, int]] = []
    log_path = _sketch_delta_log_run(spark, sf_dir, stats=tick_stats)
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    n_events = ev.count()
    n_cells = ev.select("event_type", "day").distinct().count()
    assert len(tick_stats) == N_CHUNKS
    assert sum(b for b, _ in tick_stats) == n_events  # every row sketched once
    assert all(c == 0 for _, c in tick_stats)  # ticks never read the fact table

    horizon = ev.agg(
        F.date_format(
            F.date_sub(F.max(F.to_date("day")), SKETCH_RETAIN_DAYS - 1), "yyyy-MM-dd"
        ).alias("h")
    ).collect()[0]["h"]
    comp_stats: list[tuple[int, int]] = []
    fact_path = compact_sketch_log(spark, log_path, horizon, stats=comp_stats)
    retained = ev.filter(F.col("day") >= horizon)
    n_retained_cells = retained.select("event_type", "day").distinct().count()
    [(inc_read, cells_out)] = comp_stats
    assert inc_read <= N_CHUNKS * n_cells  # bounded by ticks x cells, not rows
    assert cells_out == n_retained_cells
    assert n_retained_cells < n_cells  # expiry actually dropped something

    compacted = {
        (r["event_type"], r["day"]): r["e"]
        for r in spark.read.parquet(fact_path)
        .select("event_type", "day", F.hll_sketch_estimate("sk").alias("e"))
        .collect()
    }
    rebuilt = {
        (r["event_type"], r["day"]): r["e"]
        for r in retained.groupBy("event_type", "day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    assert compacted == rebuilt and len(compacted) == n_retained_cells
    # segment retirement: the consumed increment log is gone after the
    # publish — without it every compaction call leaks its input log
    import os

    assert not os.path.exists(log_path)


def test_sweep_scratch_spares_pb_vendor(tmp_path, monkeypatch):
    """The start-of-run scratch sweep must delete per-run debris but spare
    pb_vendor: the provisioned protobuf runtime zip is durable cross-run
    state already referenced by worker PYTHONPATHs — deleting it
    mid-session crashes the transformWithState Python runner."""
    import os

    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming import replay

    scratch = tmp_path / "scratch"
    for kind in ("ckpt", "sketch-delta", "pb_vendor"):
        (scratch / kind / "x").mkdir(parents=True)
    monkeypatch.setattr(replay, "_SCRATCH", str(scratch))
    replay.sweep_scratch()
    assert sorted(os.listdir(scratch)) == ["pb_vendor"]
    assert (scratch / "pb_vendor" / "x").is_dir()


def test_kll_delta_log_ticks_are_write_only_and_compaction_is_bounded(spark, sf_dir):
    """The KLL twin of the compaction lifecycle contract: the same
    instrumented traces prove write-only ingest ticks (fact_cells_read is
    zero every tick, each event row sketched exactly once) and a bounded
    compaction read (<= ticks x cells), with expiry emitting exactly the
    retained cell set.  End-state certification is rank-error, not
    register equality (KLL compaction is merge-order-dependent): each
    retained cell's compacted p50 lands within KLL_TOL of the exact cell
    quantile."""
    from pyspark.sql import functions as F

    from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
        KLL_TOL,
    )
    from guidance_for_sap_data_integration_and_management_on_aws_spark.streaming.ops import (
        SKETCH_RETAIN_DAYS,
        _sketch_delta_log_run,
        compact_kll_log,
    )

    tick_stats: list[tuple[int, int]] = []
    log_path = _sketch_delta_log_run(
        spark,
        sf_dir,
        stats=tick_stats,
        value_col="value",
        sketch_agg=F.expr("kll_sketch_agg_double(CAST(value AS DOUBLE))").alias("sk"),
    )
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast("double").alias("v"),
    )
    n_events = ev.count()
    n_cells = ev.select("event_type", "day").distinct().count()
    assert len(tick_stats) == N_CHUNKS
    assert sum(b for b, _ in tick_stats) == n_events  # every row sketched once
    assert all(c == 0 for _, c in tick_stats)  # ticks never read the fact table

    horizon = ev.agg(
        F.date_format(
            F.date_sub(F.max(F.to_date("day")), SKETCH_RETAIN_DAYS - 1), "yyyy-MM-dd"
        ).alias("h")
    ).collect()[0]["h"]
    comp_stats: list[tuple[int, int]] = []
    fact_path = compact_kll_log(spark, log_path, horizon, stats=comp_stats)
    retained = ev.filter(F.col("day") >= horizon)
    n_retained_cells = retained.select("event_type", "day").distinct().count()
    [(inc_read, cells_out)] = comp_stats
    assert inc_read <= N_CHUNKS * n_cells  # bounded by ticks x cells, not rows
    assert cells_out == n_retained_cells
    assert n_retained_cells < n_cells  # expiry actually dropped something

    compacted = {
        (r["event_type"], r["day"]): r["p"]
        for r in spark.read.parquet(fact_path)
        .select(
            "event_type",
            "day",
            F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("p"),
        )
        .collect()
    }
    exact = {
        (r["event_type"], r["day"]): r["p"]
        for r in retained.groupBy("event_type", "day")
        .agg(F.percentile(F.col("v"), F.lit(0.5)).alias("p"))
        .collect()
    }
    assert compacted.keys() == exact.keys()
    # per-cell rank tolerance: tiny day cells make value-relative tolerance
    # unsound (the stream_kll_maintenance lesson), so accept a small rank
    # neighborhood around the exact quantile instead.  One collect of the
    # retained window (test-only; the cells are tiny at the test SF).
    by_cell: dict[tuple[str, str], list[float]] = {}
    for r in retained.collect():
        by_cell.setdefault((r["event_type"], r["day"]), []).append(r["v"])
    for cell, p50 in exact.items():
        vals = sorted(by_cell[cell])
        slack = max(2, int(KLL_TOL * len(vals)))
        lo = max(0, int(0.5 * len(vals)) - slack - 1)
        hi = min(len(vals) - 1, int(0.5 * len(vals)) + slack)
        assert vals[lo] <= compacted[cell] <= vals[hi], (cell, p50)
    # segment retirement, same contract as the HLL twin
    import os

    assert not os.path.exists(log_path)

"""Property tests for the round-7 training-pipeline operators: each checks a
contract the oracle-parity gate can't — CUSUM's window form against the
literal serial recurrence, split stability under corpus growth, negative-
sampling invariance under physical partitioning, and the OLS closed form
against an independent least-squares solver."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.catalog import load
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.text import (
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
    pipeline_train_test_split,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.windows import (
    CUSUM_H,
    CUSUM_K,
    ts_cusum_changepoint,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.relational import (
    ml_regression_trend,
)
from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.similarity import (
    ann_negative_sampling,
)


def test_cusum_matches_serial_recurrence(spark, sf_dir):
    """The two-window prefix form equals the textbook serial recurrence
    s_t = max(0, s_(t-1) + x_t - k), computed per user in exact Decimal."""
    ev = load(spark, sf_dir, "events")
    rows = (
        ev.select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    # serial reference: first alarm per user under the literal recurrence
    expected: dict[int, tuple[int, Decimal]] = {}
    state: dict[int, Decimal] = {}
    k = Decimal(CUSUM_K)
    for r in rows:
        u = r.user_id
        if u in expected:
            continue
        s = state.get(u, Decimal(0))
        s = max(Decimal(0), s + Decimal(str(r.value)).quantize(Decimal("0.01")) - k)
        state[u] = s
        if s >= CUSUM_H:
            expected[u] = (r.event_id, s)
    got = {
        r.user_id: (r.alarm_event_id, Decimal(str(r.cusum)).quantize(Decimal("0.01")))
        for r in ts_cusum_changepoint.builder(spark, sf_dir).collect()
    }
    assert got == {u: (e, s.quantize(Decimal("0.01"))) for u, (e, s) in expected.items()}


def test_split_assignment_stable_under_corpus_growth(spark, sf_dir):
    """A document's split never changes when the corpus grows: the census
    over any doc subset agrees row-for-row with the same docs' assignments
    inside the full corpus (hash of the KEY, no rank/sample dependence)."""
    d = load(spark, sf_dir, "documents")
    half = d.filter(F.col("doc_id") % 2 == 0)

    def assignments(frame):
        from guidance_for_sap_data_integration_and_management_on_aws_spark.functions.exprs import md5_h32

        bucket = md5_h32(F.col("doc_id").cast("string")) % 100
        return {
            r.doc_id: r.split
            for r in frame.select(
                "doc_id",
                F.when(bucket < SPLIT_TRAIN_PCT, "train")
                .when(bucket < SPLIT_VAL_PCT, "validation")
                .otherwise("test")
                .alias("split"),
            ).collect()
        }

    full, sub = assignments(d), assignments(half)
    assert sub and all(full[k] == v for k, v in sub.items())
    # and the registered census is consistent with the raw assignment counts
    census = pipeline_train_test_split.builder(spark, sf_dir).collect()
    assert sum(r.n_docs for r in census) == len(full)


def test_negative_sampling_partitioning_invariant(spark, sf_dir):
    """The drawn negative set is a pure function of (keys, seed): identical
    under a different physical partitioning of the corpus."""
    base = {
        (r.qid, r.draw): r.neg_id
        for r in ann_negative_sampling.builder(spark, sf_dir).collect()
    }
    n_before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = {
            (r.qid, r.draw): r.neg_id
            for r in ann_negative_sampling.builder(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n_before)
    assert base == alt and base


def test_negative_sampling_never_draws_anchor_label(spark, sf_dir):
    for r in ann_negative_sampling.builder(spark, sf_dir).collect():
        assert r.neg_label != r.qlabel


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """The exact-moments closed form agrees with an independent float64
    least-squares fit to ~1e-9 relative (the moments are exact; lstsq is
    the approximation)."""
    import numpy as np

    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias("x"),
        "o_totalprice",
    )
    by_grp: dict[str, list[tuple[int, float]]] = {}
    for r in o.collect():
        by_grp.setdefault(r.o_orderpriority, []).append((r.x, r.o_totalprice))
    got = {r.o_orderpriority: (r.slope, r.intercept) for r in ml_regression_trend.builder(spark, sf_dir).collect()}
    assert set(got) == set(by_grp)
    for g, pts in by_grp.items():
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.round(np.array([p[1] for p in pts], dtype=np.float64), 2)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[g][0] - slope) <= 1e-6 * max(1.0, abs(slope)), g
        assert abs(got[g][1] - intercept) <= 1e-6 * max(1.0, abs(intercept)), g

"""Randomized pin of the shared pointer-doubling connected-components
kernel (graph.min_label_fixpoint) against a plain union-find reference.

The kernel serves graph_components and the dedup CC/canonical family; all
are oracle-checked at sf0.01, but only over the FIXTURE's dense near-dup
graph.  Random graphs exercise the shapes the fixture lacks: long chains
(the O(log diameter) shortcutting claim — a 400-node path converges only
because doubling halves the pointer depth every round), stars, isolated
vertices entering as singletons, and quotient contractions that collapse
most of the edge set in step 1."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.graph import (
    min_label_fixpoint,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id, the kernel's contract
    lbl = {}
    for v in range(n_nodes):
        r = find(v)
        lbl[v] = min(lbl.get(r, v), v)
    return {v: lbl[find(v)] for v in range(n_nodes)}


def _run_kernel(spark, n_nodes, edges):
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    sym = edges + [(b, a) for a, b in edges]
    if sym:
        bi = spark.createDataFrame(sym, "a BIGINT, b BIGINT").persist()
    else:
        bi = spark.createDataFrame([], "a BIGINT, b BIGINT").persist()
    # tiny fixed-size graphs: drop the shuffle width so each doubling
    # round costs a handful of tasks, not 32 per join (the kernel runs
    # several join+checkpoint rounds; at test size the wall time is pure
    # task/JIT overhead, ~8x with the default width on a cold session)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        got = {
            r["node"]: r["lbl"]
            for r in min_label_fixpoint(nodes, bi, max_rounds=25).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        bi.unpersist()
    return got


def test_cc_kernel_matches_union_find_on_random_graphs(spark):
    for seed, n, m in ((7, 200, 150), (42, 120, 40)):
        rng = random.Random(seed)
        edges = list(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(m)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        assert _run_kernel(spark, n, edges) == _union_find(n, edges)


def test_cc_kernel_long_chain_converges_within_log_budget(spark):
    # a 400-node path has diameter 399: one-hop propagation would need
    # ~400 rounds; contraction + pointer doubling must land in <= 25
    n = 400
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run_kernel(spark, n, edges)
    assert set(got.values()) == {0} and len(got) == n


def test_cc_kernel_stars_and_isolated_singletons(spark):
    # two stars + isolated tail vertices: hubs 0 and 50, leaves attach,
    # nodes 100..109 isolated -> their own singleton components
    edges = [(0, i) for i in range(1, 40)] + [(50, i) for i in range(51, 90)]
    got = _run_kernel(spark, 110, edges)
    assert all(got[i] == 0 for i in range(40))
    assert all(got[i] == 50 for i in range(50, 90))
    assert all(got[i] == i for i in range(100, 110))

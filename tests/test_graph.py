"""Graph-operator invariants beyond oracle parity (tests/test_oracle_parity.py
already runs all four graph queries differentially against DuckDB):
structural properties that must hold at any scale, and plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from guidance_for_sap_data_integration_and_management_on_aws_spark.operators import graph


def test_pagerank_mass_conservation(spark, sf_dir):
    """Fixed-point PageRank loses only truncation mass: the total rank must
    stay within n * (max_outdeg + 2) micro-units of PR_SCALE — integer
    division drops < 1 unit per edge contribution and < 2 per node."""
    pr = graph.graph_pagerank.builder(spark, sf_dir)
    deg = (
        graph.copurchase_edges(spark, sf_dir)
        .select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .count()
    )
    n, max_deg = deg.agg(
        F.count(F.lit(1)), F.max("count")
    ).first()
    total = pr.agg(F.sum("pr_fp")).first()[0]
    slack = n * (max_deg + 2) * graph.PR_ITERS
    assert 0 < total <= graph.PR_SCALE
    assert graph.PR_SCALE - total <= slack, (total, slack)


def test_triangle_counts_sum_to_three_per_triangle(spark, sf_dir):
    per_node = graph.graph_triangle_count.builder(spark, sf_dir)
    total = per_node.agg(F.sum("n_triangles")).first()[0]
    assert total and total % 3 == 0  # every triangle credits 3 corners


def test_degree_distribution_accounts_every_endpoint(spark, sf_dir):
    e = graph.copurchase_edges(spark, sf_dir)
    n_edges = e.count()
    dist = graph.graph_degree_distribution.builder(spark, sf_dir)
    endpoint_sum = dist.select(
        F.sum(F.col("degree") * F.col("n_nodes"))
    ).first()[0]
    assert endpoint_sum == 2 * n_edges  # handshake lemma


def test_graph_plans_have_no_cartesian_product(spark, sf_dir):
    for name, q in graph.QUERIES.items():
        plan = q.builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_derived_frames_memoized_per_session(spark, sf_dir):
    """The edge set and the converged component labels are materialized once
    per (session, sf_dir) and shared — a regression here silently restores
    the replicated-subtree plans the caches were added to kill."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.dedup import (
        cc_labels,
    )

    assert graph.copurchase_edges(spark, sf_dir) is graph.copurchase_edges(
        spark, sf_dir
    )
    assert cc_labels(spark, sf_dir) is cc_labels(spark, sf_dir)


def test_bfs_levels_differ_by_at_most_one_across_edges(spark, sf_dir):
    """BFS level invariant: adjacent reached nodes sit on adjacent levels
    (|hops(u) - hops(v)| <= 1), the seed is the unique level-0 node, and no
    level exceeds the hop budget."""
    from guidance_for_sap_data_integration_and_management_on_aws_spark.operators.graph import (
        BFS_MAX_HOPS,
        copurchase_edges,
        graph_bfs_hops,
    )

    dist = {r["node"]: r["hops"] for r in graph_bfs_hops.builder(spark, sf_dir).collect()}
    assert list(dist.values()).count(0) == 1
    assert max(dist.values()) <= BFS_MAX_HOPS
    from collections import Counter

    degs = Counter()
    for r in copurchase_edges(spark, sf_dir).collect():
        degs[r["src"]] += 1
        degs[r["dst"]] += 1
    seed = max(degs, key=lambda n: (degs[n], -n))
    assert dist[seed] == 0
    for r in copurchase_edges(spark, sf_dir).collect():
        u, v = dist.get(r["src"]), dist.get(r["dst"])
        if u is not None and v is not None and max(u, v) < BFS_MAX_HOPS:
            assert abs(u - v) <= 1
        elif u is None:
            # unreached neighbor of a reached node only legal at the horizon
            assert v is None or v == BFS_MAX_HOPS
        elif v is None:
            assert u == BFS_MAX_HOPS
